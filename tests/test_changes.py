"""Batch change feed (Delta CDF analogue): insert/delete rows per
commit span, OPTIMIZE-invisible, loud on vacuumed history."""

from __future__ import annotations

import pytest

from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _sink(spark, tmp_path, name, **kw):
    return DeltaSink(spark, str(tmp_path / name), **kw)


def test_appends_become_versioned_inserts(spark, tmp_path):
    sink = _sink(spark, tmp_path, "ins")
    for b in range(3):
        sink.append(spark.range(b * 10, b * 10 + 10).toDF("id").coalesce(1))
    ch = sink.changes(0).collect()
    assert all(r["_change_type"] == "insert" for r in ch)
    by_v = {}
    for r in ch:
        by_v.setdefault(r["_commit_version"], []).append(r["id"])
    assert {v: sorted(ids) for v, ids in by_v.items()} == {
        0: list(range(10)), 1: list(range(10, 20)), 2: list(range(20, 30))
    }
    # subspan
    sub = sink.changes(2, 2).collect()
    assert sorted(r["id"] for r in sub) == list(range(20, 30))


def test_delete_appears_as_remove_plus_reinsert(spark, tmp_path):
    sink = _sink(spark, tmp_path, "del")
    sink.append(spark.range(10).toDF("id").coalesce(1))
    v = sink.delete("id >= 7")
    ch = sink.changes(v, v).collect()
    dels = sorted(r["id"] for r in ch if r["_change_type"] == "delete")
    ins = sorted(r["id"] for r in ch if r["_change_type"] == "insert")
    assert dels == list(range(10))  # whole old file out
    assert ins == list(range(7))  # survivors back in
    assert {r["_commit_version"] for r in ch} == {v}


def test_optimize_is_change_invisible(spark, tmp_path):
    sink = _sink(spark, tmp_path, "opt")
    for b in range(3):
        sink.append(spark.range(b * 5, b * 5 + 5).toDF("id").coalesce(1))
    v = sink.optimize()
    assert v > 0
    assert sink.changes(v, v).count() == 0
    # and z-order churn is invisible too
    v2 = sink.optimize(zorder_by=["id"])
    assert sink.changes(v2, v2).count() == 0


def test_partitioned_changes_inject_partition_values(spark, tmp_path):
    sink = _sink(spark, tmp_path, "part", partition_by=["g"])
    sink.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a")], "id long, g string"
        ).repartition(2, "g")
    )
    ch = sink.changes(0).collect()
    assert sorted((r["id"], r["g"]) for r in ch) == [(1, "a"), (2, "b"), (3, "a")]


def test_vacuumed_span_raises(spark, tmp_path):
    sink = _sink(spark, tmp_path, "vac", checkpoint_interval=2)
    for b in range(4):
        sink.append(spark.range(b, b + 1).toDF("id").coalesce(1))
    sink.delete("id = 0")
    sink.vacuum()  # truncates pre-checkpoint log + dead files
    with pytest.raises(ValueError, match="predates the retained log"):
        sink.changes(0)


def test_empty_span_keeps_schema(spark, tmp_path):
    sink = _sink(spark, tmp_path, "empty")
    sink.append(spark.range(3).toDF("id"))
    ch = sink.changes(1)  # past the last commit
    assert ch.count() == 0
    assert ch.columns == ["id", "_change_type", "_commit_version"]
