"""Persisted ANN index: build once, search many — the 100 TB shape.

The in-session IVF operators (similarity.cosine_topk_ivf) retrain and
reassign on every call; a real vector-search deployment builds the
index ONCE and amortizes it across every query batch.  This module
makes the index durable using the engine's own Delta writer:

    <path>/vectors/   Delta table (id, embedding) PARTITIONED BY
                      ``cluster`` — a probe reads only its clusters'
                      files, so the IVF candidate narrowing happens at
                      the STORAGE layer via partition pruning (O6), not
                      as a runtime filter over a full scan.
    <path>/meta.json  centroids + build parameters (KBs; the broadcast
                      side of every search).

At 100 TB the vectors table is the corpus (cluster-partitioned
parquet); search I/O is ``n_probe / n_clusters`` of it regardless of
cluster count, and the per-query work is the same broadcast probe join
``cosine_topk_ivf`` uses.  Recall characteristics are identical to the
in-session IVF (same centroid trainer, same assignment) — pytest pins
the recall floor and the build/search round trip.

Reference scope note: the reference has no vector surface at all; this
extends the north-star contract (BASELINE.json) the same way the other
similarity operators do.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.delta_sink import DeltaSink
from .similarity import (
    _collect_queries,
    _cosine_sim_expr,
    ivf_assign,
    ivf_centroids,
)

_META = "meta.json"
_VECTORS = "vectors"


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_assign: int = 1,
    seed: int = 42,
) -> dict:
    """Train centroids, assign the corpus, and persist the index.

    The corpus streams through one narrow assignment map and lands
    partitioned by cluster (``n_assign > 1`` duplicates each vector
    under its top-a clusters — redundant assignment trades index size
    for recall).  Returns the metadata dict (also written to
    ``meta.json``)."""
    cent = ivf_centroids(
        corpus, vec_col, id_col, n_clusters=n_clusters, seed=seed
    )
    assigned = ivf_assign(corpus, vec_col, cent, n_assign=n_assign).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode("clusters").alias("cluster"),
    )
    sink = DeltaSink(
        corpus.sparkSession, os.path.join(path, _VECTORS),
        partition_by=["cluster"],
    )
    sink.append(assigned)
    meta = {
        "format": "mlk-ivf-index",
        "version": 1,
        "n_clusters": int(len(cent)),
        "n_assign": int(n_assign),
        "dim": int(cent.shape[1]),
        "id_col": id_col,
        "vec_col": vec_col,
        "centroids": [[float(x) for x in c] for c in cent],
    }
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"_{_META}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _META))  # atomic publish
    return meta


def load_index_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if meta.get("format") != "mlk-ivf-index":
        raise ValueError(f"not an mlk-ivf-index: {path}")
    return meta


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine search against a persisted index.

    Per query batch: nearest ``n_probe`` centroids are computed on the
    collected query matrix (KBs), the vectors table is opened with a
    PARTITION PREDICATE over exactly the probed clusters (only those
    partitions' files are listed and read), and candidates meet the
    broadcast (query, cluster) probe pairs in the same single
    broadcast join the in-session IVF uses.  The corpus never
    shuffles; the scan never touches an unprobed cluster."""
    meta = load_index_meta(path)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    qids, qmat, qnorm = _collect_queries(queries, id_col, vec_col)
    qunit = qmat / np.where(qnorm[:, None] == 0, 1.0, qnorm[:, None])
    order = np.argsort(-(qunit @ cent.T), axis=1)[:, :n_probe]
    probe_rows = [
        (int(qid), int(c), [float(x) for x in qmat[i]])
        for i, qid in enumerate(qids)
        for c in order[i]
    ]
    probes = spark.createDataFrame(
        probe_rows, "query_id bigint, cluster int, _qvec array<double>"
    )
    clusters = sorted({int(c) for _, c, _ in probe_rows})
    sink = DeltaSink(spark, os.path.join(path, _VECTORS))
    cand = sink.to_df(
        partition_predicate=f"cluster IN ({', '.join(map(str, clusters))})"
    ).select(
        F.col("id").alias("cand_id"),
        F.col("vec").alias("_cvec"),
        F.col("cluster").cast("int").alias("cluster"),
    )
    joined = cand.join(F.broadcast(probes), "cluster", "inner")
    if meta["n_assign"] > 1:
        joined = joined.dropDuplicates(["query_id", "cand_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        joined.select(
            "query_id",
            "cand_id",
            _cosine_sim_expr("_cvec", "_qvec").alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cos_sim")
    )
