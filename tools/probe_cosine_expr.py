"""Re-measure _cosine_sim_expr vs a numpy mapInArrow twin at sf1
batch sizes (r12 VERDICT item 8).

r11 measured the numpy rewrite SLOWER for IVF assignment at the sf0.1
corpus (2k vectors) — Python boundary overhead dominated.  The ask:
re-measure at 10x (20k vectors, bigger Arrow batches) before accepting
the interpreted higher-order folds as final.

Times a representative scoring pass: cosine of every corpus vector
against one query vector (the brute-force/rerank shape), noop-sunk.
Verifies both paths produce identical rounded scores first.

Usage: python tools/probe_cosine_expr.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from mirror_lake_kusto_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mlk_sf1_full"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = build_session(app_name="probe-cosine")
    spark.sparkContext.setLogLevel("ERROR")
    from mirror_lake_kusto_spark.operators.similarity import _cosine_sim_expr

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.orderBy("vec_id").limit(1).select("embedding").first()[0]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    base = emb.withColumn("_q", qlit)
    expr_df = base.select(
        "vec_id", _cosine_sim_expr("embedding", "_q").alias("cos_sim")
    )

    import numpy as np
    import pandas as pd

    qv = np.asarray(q, dtype=np.float64)
    qn = np.sqrt((qv * qv).sum()) or 1.0

    def np_cos(batches):
        for pdf in batches:
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            dots = m @ qv
            norms = np.sqrt((m * m).sum(axis=1))
            norms[norms == 0.0] = 1.0
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cos_sim": np.round(dots / (norms * qn), 6),
                }
            )

    np_df = emb.select("vec_id", "embedding").mapInPandas(
        np_cos, "vec_id long, cos_sim double"
    )

    # equivalence first
    diff = (
        expr_df.join(np_df.withColumnRenamed("cos_sim", "np_sim"), "vec_id")
        .filter(F.abs(F.col("cos_sim") - F.col("np_sim")) > 1e-9)
        .count()
    )
    print(f"mismatched rows (|delta|>1e-9): {diff}")

    for tag, df in (("jvm-expr", expr_df), ("numpy-arrow", np_df)):
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"{tag}: {best:.3f}s (min of {runs})", flush=True)


if __name__ == "__main__":
    main()
