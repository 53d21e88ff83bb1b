"""Round-11 pins for the round-10 ADVICE.md findings.

1. cosine_topk_ivf releases its coarse-assignment cache (and skips the
   persist entirely on an empty query batch).
2. prior_dv_descs fails LOUD when a rewritten path's prior descriptor
   is in neither the retained JSON log nor a checkpoint older than the
   commit being classified (silently defaulting to None would emit a
   full-bitmap retract — re-deleting already-dead rows).
3. classify_mor_commit never evaluates the dv_possible protocol gate
   when no descriptor-less remove needs it (the gate is a real
   protocol scan; lazily evaluated by contract).
"""

import json
import os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


# ------------------------------------------------ 1: IVF cache lifecycle


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_ivf_empty_query_batch_persists_nothing(spark):
    from mirror_lake_kusto_spark.operators.similarity import cosine_topk_ivf

    corpus = spark.range(40).selectExpr(
        "id AS vec_id",
        "array(cast(id AS double), cast(id * 2 AS double)) AS embedding",
    )
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    before = _persistent_rdd_count(spark)
    out = cosine_topk_ivf(corpus, empty, k=3, n_clusters=2)
    assert out.count() == 0
    # the early return fires before any persist: no cached blocks added
    assert _persistent_rdd_count(spark) == before


def test_ivf_unpersists_assignment_frame(spark):
    from mirror_lake_kusto_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    corpus = spark.range(60).selectExpr(
        "id AS vec_id",
        "array(cast(id % 7 AS double), cast(id % 11 AS double),"
        " 1.0d) AS embedding",
    )
    queries = corpus.filter("vec_id < 3")
    before = _persistent_rdd_count(spark)
    got = cosine_topk_ivf(
        corpus, queries, k=5, n_clusters=2, n_probe=2
    )  # n_probe = n_clusters: exhaustive, so exact
    rows = got.collect()
    # the assignment frame was unpersisted inside the call; the only
    # block that may remain is the localCheckpoint of the tiny result
    assert _persistent_rdd_count(spark) <= before + 1
    exact = cosine_topk_bruteforce(corpus, queries, k=5).collect()
    assert sorted((r["query_id"], r["cand_id"]) for r in rows) == sorted(
        (r["query_id"], r["cand_id"]) for r in exact
    )


# ------------------------------------- 2: unresolvable prior DV is loud


def test_prior_dv_descs_raises_when_log_cleaned_past_checkpoint(
    spark, tmp_path
):
    path = str(tmp_path / "cleaned")
    s = DeltaSink(spark, path, checkpoint_interval=3)
    s.append(spark.range(10).toDF("n").coalesce(1))  # v0
    s.delete_dv("n = 1")                             # v1: DV rewrite
    s.delete_dv("n = 3")                             # v2: rewrite + ckpt@2
    log = os.path.join(path, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{2:020d}.checkpoint.parquet"))
    # classifying v2 needs v1's descriptor for the rewritten path
    acts = [json.loads(l) for l in open(os.path.join(log, f"{2:020d}.json"))]
    rewritten = next(a["add"]["path"] for a in acts if a.get("add"))
    # intact log: resolvable, and the prior bitmap has cardinality 1
    desc = DL.prior_dv_descs(path, {rewritten}, 2)[rewritten]
    assert desc is not None and int(desc["cardinality"]) == 1
    # simulate metadata-cleanup: commits < 2 deleted, checkpoint@2 is
    # AT the commit being classified, so it cannot witness the prior
    for v in (0, 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    with pytest.raises(ValueError, match="cannot resolve prior deletion"):
        DL.prior_dv_descs(path, {rewritten}, 2)


def test_prior_dv_descs_checkpoint_older_than_commit_still_resolves(
    spark, tmp_path
):
    path = str(tmp_path / "ok")
    s = DeltaSink(spark, path, checkpoint_interval=2)
    s.append(spark.range(10).toDF("n").coalesce(1))  # v0
    s.delete_dv("n = 1")                             # v1: rewrite + ckpt@1
    s.delete_dv("n = 3")                             # v2: rewrite
    log = os.path.join(path, "_delta_log")
    acts = [json.loads(l) for l in open(os.path.join(log, f"{2:020d}.json"))]
    rewritten = next(a["add"]["path"] for a in acts if a.get("add"))
    for v in (0, 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    # checkpoint@1 < before_version=2 CAN witness v1's descriptor
    desc = DL.prior_dv_descs(path, {rewritten}, 2)[rewritten]
    assert desc is not None and int(desc["cardinality"]) == 1


# --------------------------------------- 3: protocol gate stays lazy


def test_classify_mor_commit_gate_not_evaluated_when_unneeded(
    spark, tmp_path
):
    path = str(tmp_path / "gate")
    s = DeltaSink(spark, path)
    s.append(spark.range(10).toDF("n").coalesce(1))  # v0
    s.delete_dv("n = 1")                             # v1: DV rewrite
    log = os.path.join(path, "_delta_log")
    acts = [json.loads(l) for l in open(os.path.join(log, f"{1:020d}.json"))]

    def bomb():
        raise AssertionError("protocol gate evaluated without need")

    # v1 is a rewrite with a NEW vector — the prior lookup is driven by
    # the vector in hand, never by the protocol gate; and the remove
    # side carries no descriptor but is the rewrite's own path (popped
    # before the pure-remove loop), so the gate must not be consulted
    out = DL.classify_mor_commit(path, acts, 1, bomb)
    kinds = sorted(e["kind"] for e in out)
    assert kinds == ["delta"]
