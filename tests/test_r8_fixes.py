"""Round-8 ADVICE fixes: empty query batches are a no-op (not an
error), and liquid-clustering misconfiguration fails at DECLARATION
time rather than wedging every later OPTIMIZE."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def test_empty_query_batch_returns_empty(spark):
    """An empty query frame searches for nothing and finds nothing —
    the overflow budget still raises, but emptiness is legitimate
    (e.g. an id filter that matched no rows this batch)."""
    from mirror_lake_kusto_spark.operators.similarity import (
        _collect_queries,
        cosine_topk_bruteforce,
    )

    corpus = spark.range(20).selectExpr(
        "id AS vec_id", "array(cast(id as double), 1.0d) AS embedding"
    )
    empty = corpus.filter("vec_id < 0")
    qids, qmat, qnorm = _collect_queries(empty, "vec_id", "embedding")
    assert len(qids) == 0 and len(qnorm) == 0
    out = cosine_topk_bruteforce(corpus, empty, k=3)
    assert out.columns == ["query_id", "cand_id", "cos_sim"]
    assert out.count() == 0


def test_empty_query_batch_ivf_index_search(spark, tmp_path):
    """search_ivf_index's explicit empty-result branch (previously dead
    behind the raise) is live again."""
    from mirror_lake_kusto_spark.operators.ann_index import (
        build_ivf_index,
        search_ivf_index,
    )

    corpus = spark.range(64).selectExpr(
        "id AS vec_id",
        "array(cast(id % 8 as double), cast(id as double)) AS embedding",
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, n_clusters=4)
    empty = corpus.filter("vec_id < 0")
    out = search_ivf_index(spark, path, empty, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "cand_id", "cos_sim"]


def test_set_cluster_by_rejects_non_orderable_type(spark, tmp_path):
    """Declaring clustering on an array/binary column fails AT
    DECLARATION with the type named — not at every later bare
    optimize() (which would wedge MirrorPipeline's periodic pass)."""
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.range(10).select(
            "id",
            F.array(F.col("id").cast("double")).alias("vec"),
            F.col("id").cast("string").alias("name"),
        )
    )
    with pytest.raises(ValueError, match="vec.*array|array.*vec"):
        sink.set_cluster_by(["vec"])
    # orderable columns still declare fine, and optimize stays healthy
    assert sink.set_cluster_by(["id", "name"]) >= 0
    sink.optimize()
