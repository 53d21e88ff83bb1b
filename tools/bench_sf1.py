"""Scan-bound measurement regime: synthetic sf1 (10x sf0.1, ALL
tables key-consistently replicated) at a configurable core count.

Round-12's VERDICT: at sf0.1 every bench query is dominated by fixed
per-job overhead — the 8-core total equals the 32-core total and the
sweep "measures weather".  This tool restores a REGIME THAT RESOLVES
OPERATOR WORK: a 10x corpus where the scan-bound queries have real
shuffle/scan volume, run at 8 vs 32 cores so parallel speedup is
visible, with per-query steal gating (a query's timing only counts
when hypervisor steal during its runs stayed under the gate;
otherwise it retries, bounded).

Replication is deterministic and key-consistent: every key column of
every table gets the SAME per-replica offset, so joins hit replica-
locally and the join structure scales like a real 10x corpus (10x
nodes, not 10x density).  nation/region stay (dimension constants).

Usage:
  python tools/bench_sf1.py build            # build /tmp/mlk_sf1_full
  python tools/bench_sf1.py run  [cpus]      # run the family (default 32)

Writes /tmp/mlk_sf1_bench_c<cpus>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/mlk_sf1_full"
REPLICAS = 10
OFF = 10_000_000

# key columns per table: all offset by _rep * OFF
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FAMILY = [
    # TPC-H scan/join-bound
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customer",
    "q21_waiting_supplier",
    # dedup / text / pipeline (documents)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_md5",
    "pipeline_dedup_corpus",
    "pipeline_decontaminate",
    "text_bm25_search",
    "text_profile",
    "text_unigram_logprob",
    "text_repetition_profile",
    # events (KQL/ts)
    "kql_activity_metrics",
    "kql_new_activity_metrics",
    "kql_sliding_window_counts",
    "ts_make_series",
    "d16_hll_sketch",
    # embeddings
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
]


def build() -> None:
    import pyspark.sql.functions as F

    from mirror_lake_kusto_spark.session import build_session

    spark = build_session(app_name="mlk-sf1-build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    reps = spark.range(REPLICAS).select(F.col("id").alias("_rep"))
    for tbl, keys in KEYS.items():
        src_df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        cols = []
        for c in src_df.columns:
            if c in keys:
                cols.append(
                    (F.col(c) + F.col("_rep") * OFF).alias(c)
                )
            elif tbl == "documents" and c == "text":
                # near-duplicate replicas (shared shingles), never
                # exact copies — keeps dedup work realistic
                cols.append(
                    F.when(F.col("_rep") == 0, F.col("text"))
                    .otherwise(
                        F.concat(
                            F.col("text"),
                            F.lit(" rep"),
                            F.col("_rep").cast("string"),
                            F.lit("tok"),
                            (F.col("doc_id") % 97).cast("string"),
                        )
                    )
                    .alias("text")
                )
            elif tbl == "embeddings" and c == "embedding":
                cols.append(
                    F.expr(
                        "transform(embedding, (x, i) -> CAST(x + "
                        "IF(i = _rep % size(embedding), 0.003 * _rep,"
                        " 0.0) AS FLOAT))"
                    ).alias("embedding")
                )
            else:
                cols.append(F.col(c))
        big = src_df.crossJoin(reps).select(*cols)
        dst_t = f"{DST}/{tbl}.parquet"
        if os.path.islink(dst_t):
            os.remove(dst_t)
        big.coalesce(8).write.mode("overwrite").parquet(dst_t)
        print(f"built {tbl}", flush=True)
    for t in ("region", "nation"):
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    spark.stop()


def _jif():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _steal(a, b) -> float:
    d = [y - x for x, y in zip(a, b)]
    return d[7] / (sum(d) or 1) * 100 if len(d) > 7 else 0.0


def run(cpus: int) -> None:
    from mirror_lake_kusto_spark.queries import all_queries
    from mirror_lake_kusto_spark.session import build_session

    spark = build_session(app_name=f"mlk-sf1-c{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    # warmups: codegen + Arrow worker pool
    registry["q6_forecast_revenue"].fn(spark, DST).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    RUNS = int(os.environ.get("SPARK_GRAFT_SF1_RUNS", "2"))
    GATE = float(os.environ.get("SPARK_GRAFT_SF1_STEAL_GATE", "0.8"))
    out: dict[str, dict] = {}
    for name in FAMILY:
        best = float("inf")
        steal = None
        for attempt in range(4):  # RUNS + up to 2 steal retries
            j0 = _jif()
            t0 = time.time()
            registry[name].fn(spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            steal = _steal(j0, _jif())
            best = min(best, dt)
            if attempt + 1 >= RUNS and steal <= GATE:
                break
        out[name] = {"sec": round(best, 2), "steal_pct": round(steal, 2)}
        print(
            f"{name}: {best:.2f}s (steal {steal:.2f}%)", flush=True
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    path = f"/tmp/mlk_sf1_bench_c{cpus}.json"
    with open(path, "w") as f:
        json.dump(
            {
                "cpus": cpus,
                "corpus": DST,
                "replicas": REPLICAS,
                "runs_min_of": RUNS,
                "steal_gate_pct": GATE,
                "queries": out,
                "total_sec": round(
                    sum(v["sec"] for v in out.values()), 2
                ),
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"-> {path}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "build":
        build()
    else:
        run(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
