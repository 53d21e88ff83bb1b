"""A/B/C probe for text.repetition_profile's top-n-gram computation.

Three shapes, identical results (asserted on every run):

A. runs-expr (r13 snapshot, shipped): sorted gram array, run boundaries
   via filter(sequence(...)) + zip_with diffs.  The lambdas reference
   `sg`/`starts` — full expression SUBTREES, not lambda variables — and
   Spark's higher-order functions re-evaluate such subtrees per element:
   array_sort(grams) runs O(len) times per document -> O(len^2 log len).
B. aggregate (candidate fix): one F.aggregate over the sorted array with
   a (prev, run, best) accumulator — lambdas touch only lambda variables,
   so the sort is evaluated exactly once -> O(len log len) per document,
   still ZERO shuffle.
C. explode (r12 shape): explode to (doc, gram), two aggregations per
   gram size, join back.  Codegen throughout, but shuffles the gram
   volume twice per size.

Usage: python tools/probe_repetition_shapes.py [sf_dir] [runs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from mirror_lake_kusto_spark.session import build_session


def grams_expr(toks, n: int):
    slices = [F.slice(toks, i + 1, F.size(toks) - (n - 1)) for i in range(n)]
    grams = slices[0]
    for s in slices[1:]:
        grams = F.zip_with(grams, s, lambda a, b: F.concat_ws(" ", a, b))
    return grams


def top_runs_expr(toks, n: int):
    sg = F.array_sort(grams_expr(toks, n))
    sz = F.size(sg)
    starts = F.filter(
        F.sequence(F.lit(0), sz - 1),
        lambda i: F.when(i == 0, F.lit(True)).otherwise(
            F.element_at(sg, i + 1) != F.element_at(sg, i)
        ),
    )
    runs = F.zip_with(
        starts,
        F.concat(F.slice(starts, 2, F.size(starts)), F.array(sz)),
        lambda a, b: b - a,
    )
    return (
        F.when(F.size(toks) >= n, F.array_max(runs))
        .otherwise(F.lit(0))
        .cast("long")
    )


def top_aggregate_expr(toks, n: int):
    sg = F.array_sort(grams_expr(toks, n))
    best = F.aggregate(
        sg,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return (
        F.when(F.size(toks) >= n, best).otherwise(F.lit(0)).cast("long")
    )


def via_explode(base, n: int, out: str):
    grams = grams_expr(F.col("_toks"), n)
    return (
        base.filter(F.size("_toks") >= n)
        .select("doc_id", F.explode(grams).alias("_g"))
        .groupBy("doc_id", "_g")
        .agg(F.count("*").alias("_c"))
        .groupBy("doc_id")
        .agg(F.max("_c").alias(out))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mlk_sf1_full"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = build_session(app_name="probe-rep-shapes", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from mirror_lake_kusto_spark.operators.dedup import _spread

    docs = _spread(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", F.split(F.col("text"), " ").alias("_toks"))

    variants = {}
    variants["A_runs"] = docs.select(
        "doc_id",
        top_runs_expr(F.col("_toks"), 2).alias("t2"),
        top_runs_expr(F.col("_toks"), 3).alias("t3"),
    )
    variants["B_aggregate"] = docs.select(
        "doc_id",
        top_aggregate_expr(F.col("_toks"), 2).alias("t2"),
        top_aggregate_expr(F.col("_toks"), 3).alias("t3"),
    )
    e2 = via_explode(docs, 2, "t2")
    e3 = via_explode(docs, 3, "t3")
    variants["C_explode"] = (
        docs.select("doc_id")
        .join(e2, "doc_id", "left")
        .join(e3, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("t2", F.lit(0)).cast("long").alias("t2"),
            F.coalesce("t3", F.lit(0)).cast("long").alias("t3"),
        )
    )

    # equivalence on a sample (hash the full result cheaply)
    sums = {}
    for name, df in variants.items():
        agg = df.agg(
            F.count("*"),
            F.sum("t2"),
            F.sum("t3"),
            F.sum(F.col("t2") * F.col("doc_id") % 997),
            F.sum(F.col("t3") * F.col("doc_id") % 997),
        ).first()
        sums[name] = tuple(agg)
        print(f"{name}: checksum {sums[name]}", flush=True)
    assert len(set(sums.values())) == 1, f"results differ: {sums}"

    for name, df in variants.items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.2f}s (min of {runs})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
