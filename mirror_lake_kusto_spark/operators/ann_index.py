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
    pq_encode,
    train_pq_codebooks,
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
    pq_m: int | None = None,
    pq_codes: int = 256,
    seed: int = 42,
    centroids=None,
) -> dict:
    """Train centroids, assign the corpus, and persist the index.

    The corpus streams through one narrow assignment map and lands
    partitioned by cluster (``n_assign > 1`` duplicates each vector
    under its top-a clusters — redundant assignment trades index size
    for recall).  With ``pq_m`` set, the stored payload is the m-byte
    PRODUCT-QUANTIZED code instead of the raw vector (the FAISS
    IVF-PQ layout: for d=64 float64, m=8 stores 64x less), and search
    scores candidates by ADC table lookups.  Returns the metadata
    dict (also written to ``meta.json``)."""
    if centroids is not None:
        # pre-trained quantizer seeding (the FAISS idiom: train once,
        # reuse across index builds — also the hook that makes the
        # index build SQL-oracle-checkable with data-derived seeds)
        cent = np.asarray(centroids, dtype=np.float64)
        norms = np.linalg.norm(cent, axis=1, keepdims=True)
        cent = cent / np.where(norms == 0, 1.0, norms)
    else:
        cent = ivf_centroids(
            corpus, vec_col, id_col, n_clusters=n_clusters, seed=seed
        )
    assigned = ivf_assign(corpus, vec_col, cent, n_assign=n_assign)
    books = None
    if pq_m is not None:
        books = train_pq_codebooks(
            corpus, vec_col, id_col, m=pq_m, n_codes=pq_codes, seed=seed
        )
        payload = pq_encode(assigned, books, vec_col).select(
            F.col(id_col).alias("id"),
            F.col("pq_code").alias("code"),
            F.explode("clusters").alias("cluster"),
        )
    else:
        payload = assigned.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.explode("clusters").alias("cluster"),
        )
    sink = DeltaSink(
        corpus.sparkSession, os.path.join(path, _VECTORS),
        partition_by=["cluster"],
    )
    sink.append(payload)
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
    if books is not None:
        meta["pq"] = {
            "m": int(books.shape[0]),
            "n_codes": int(books.shape[1]),
            "dsub": int(books.shape[2]),
            "codebooks": [
                [[float(x) for x in cw] for cw in book] for book in books
            ],
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
    max_queries: int | None = None,
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
    if max_queries is None:
        from .similarity import MAX_QUERY_VECTORS

        max_queries = MAX_QUERY_VECTORS
    qids, qmat, qnorm = _collect_queries(
        queries, id_col, vec_col, max_queries=max_queries
    )
    if len(qids) == 0:
        return spark.createDataFrame(
            [], "query_id bigint, cand_id bigint, cos_sim double"
        )
    qunit = qmat / np.where(qnorm[:, None] == 0, 1.0, qnorm[:, None])
    order = np.argsort(-(qunit @ cent.T), axis=1)[:, :n_probe]
    clusters = sorted({int(c) for row in order for c in row})
    sink = DeltaSink(spark, os.path.join(path, _VECTORS))
    pruned = sink.to_df(
        partition_predicate=f"cluster IN ({', '.join(map(str, clusters))})"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )

    if "pq" in meta:
        # ADC path (same scoring as similarity.cosine_topk_ivfpq:823,
        # reading codes from the pruned partitioned table instead of
        # re-encoding the corpus)
        books = np.asarray(meta["pq"]["codebooks"], dtype=np.float64)
        dsub = books.shape[2]
        probes = spark.createDataFrame(
            [
                (int(qid), int(c))
                for i, qid in enumerate(qids)
                for c in order[i]
            ],
            "query_id bigint, cluster int",
        )
        tables = np.stack(
            [
                qmat[:, s * dsub : (s + 1) * dsub] @ books[s].T
                for s in range(books.shape[0])
            ],
            axis=1,
        )
        code_sq = np.stack(
            [(books[s] ** 2).sum(axis=1) for s in range(books.shape[0])]
        )
        qpos = {int(qid): i for i, qid in enumerate(qids)}
        bq = spark.sparkContext.broadcast((qpos, qnorm, tables, code_sq))
        joined = (
            pruned.select(
                F.col("id").alias("cand_id"),
                "code",
                F.col("cluster").cast("int").alias("cluster"),
            )
            .join(F.broadcast(probes), "cluster", "inner")
        )
        if meta["n_assign"] > 1:
            joined = joined.dropDuplicates(["query_id", "cand_id"])
        joined = joined.select("query_id", "cand_id", "code")

        def score(batches):
            import pandas as pd  # noqa: F401

            pos, norm_q, tab, csq = bq.value
            sub_idx = np.arange(tab.shape[1])
            for pdf in batches:
                if not len(pdf):
                    continue
                codes = np.stack(pdf["code"].to_numpy())
                rec_norm = np.sqrt(csq[sub_idx[None, :], codes].sum(axis=1))
                rec_norm = np.where(rec_norm == 0, 1.0, rec_norm)
                j = pdf["query_id"].map(pos).to_numpy(dtype=np.int64)
                dots = np.take_along_axis(
                    tab[j], codes[:, :, None], axis=2
                ).squeeze(2).sum(axis=1)
                qn = np.where(norm_q[j] == 0, 1.0, norm_q[j])
                out = pdf[["query_id", "cand_id"]].copy()
                out["cos_sim"] = np.round(dots / (rec_norm * qn), 6)
                yield out

        scored = joined.mapInPandas(
            score, "query_id bigint, cand_id bigint, cos_sim double"
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "cand_id", "cos_sim")
        )

    probes = spark.createDataFrame(
        [
            (int(qid), int(c), [float(x) for x in qmat[i]])
            for i, qid in enumerate(qids)
            for c in order[i]
        ],
        "query_id bigint, cluster int, _qvec array<double>",
    )
    cand = pruned.select(
        F.col("id").alias("cand_id"),
        F.col("vec").alias("_cvec"),
        F.col("cluster").cast("int").alias("cluster"),
    )
    joined = cand.join(F.broadcast(probes), "cluster", "inner")
    if meta["n_assign"] > 1:
        joined = joined.dropDuplicates(["query_id", "cand_id"])
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
