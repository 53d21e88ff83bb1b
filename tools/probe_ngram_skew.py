"""Skew probe for dedup_ngram_jaccard (r12 VERDICT item 4).

Drives `ngram_jaccard_pairs` with two adversarial corpora the sf0.1
bench never exercises, and reports wall time plus the max/median task
duration of the heaviest stages (a max/median above ~5-10x flags a
straggler — guide §2.5):

1. HOT-SHINGLE corpus: 30% of documents share a long boilerplate
   preamble (stopword-like shingles with huge posting lists).  The
   PPJoin prefix filter is SUPPOSED to keep these out of candidate
   generation entirely (document-frequency-ascending prefixes).
2. GIANT-FAMILY corpus: one near-duplicate family of K documents
   (pairwise jaccard >= t).  The output itself is O(K^2) pairs —
   contractually unavoidable — but the WORK should distribute; the
   hazard is `_pairs_from_groups` expanding one collapsed posting
   list's K^2/2 pairs inside a single task.

Task metrics come from the Spark UI REST API (the probe session runs
with the UI on).

Usage: python tools/probe_ngram_skew.py [n_docs] [family_k]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirror_lake_kusto_spark.session import build_session

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
FAMILY_K = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000
THRESHOLD = 0.5


def _stage_skew(ui: str, min_sec: float = 1.0) -> list[str]:
    """max/median task duration for every stage above min_sec total."""
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    out = []
    for s in stages:
        if s["executorRunTime"] < min_sec * 1000:
            continue
        sid, att = s["stageId"], s["attemptId"]
        dist = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/"
                f"{att}/taskSummary?quantiles=0.5,1.0"
            )
        )
        med, mx = dist["executorRunTime"]
        if mx < 500:  # ignore sub-0.5s-max stages
            continue
        ratio = mx / max(med, 1.0)
        out.append(
            f"  stage {sid} ({s['numCompleteTasks']} tasks, "
            f"{s['executorRunTime'] / 1000:.1f}s total): med "
            f"{med / 1000:.2f}s max {mx / 1000:.2f}s ratio {ratio:.1f}x"
            + ("  <-- STRAGGLER" if ratio > 5 and mx > 2000 else "")
        )
    return out


def main() -> None:
    import pyspark.sql.functions as F

    spark = build_session(
        app_name="probe-ngram-skew",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"

    from mirror_lake_kusto_spark.operators.dedup import ngram_jaccard_pairs

    base = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .limit(N_DOCS)
        .select("doc_id", "text")
    )

    def run(tag: str, df):
        df = df.cache()
        df.count()
        t0 = time.time()
        n = ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=THRESHOLD
        ).count()
        dt = time.time() - t0
        print(f"{tag}: {n} pairs in {dt:.1f}s", flush=True)
        for line in _stage_skew(ui):
            print(line, flush=True)
        df.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # 1. hot-shingle corpus: 30% of docs get the same 40-token preamble
    boiler = " ".join(f"common{i}" for i in range(40))
    hot = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(F.lit(boiler + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    run("hot-shingle (30% boilerplate)", hot)

    # 2. giant near-dup family: FAMILY_K docs, same text + unique tail
    #    token (pairwise jaccard ~ (n-1)/(n+1) >> threshold)
    fam_text = " ".join(f"ftok{i}" for i in range(60))
    family = spark.range(FAMILY_K).select(
        (F.col("id") + 90_000_000).alias("doc_id"),
        F.concat(
            F.lit(fam_text + " tail"), F.col("id").cast("string")
        ).alias("text"),
    )
    run(
        f"giant-family (K={FAMILY_K})",
        base.unionByName(family),
    )


if __name__ == "__main__":
    main()
