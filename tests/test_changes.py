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


# -- MERGE (copy-on-write upsert) --------------------------------------------


def test_merge_updates_and_inserts(spark, tmp_path):
    sink = _sink(spark, tmp_path, "m1")
    sink.append(
        spark.createDataFrame(
            [(i, f"old{i}") for i in range(10)], "id long, v string"
        ).coalesce(1)
    )
    src = spark.createDataFrame(
        [(7, "new7"), (9, "new9"), (42, "new42")], "id long, v string"
    )
    v = sink.merge(src, ["id"])
    got = {r["id"]: r["v"] for r in sink.to_df().collect()}
    assert got == {**{i: f"old{i}" for i in range(7)},
                   7: "new7", 8: "old8", 9: "new9", 42: "new42"}
    # change feed shows the rewrite + the fresh insert at one version
    ch = sink.changes(v, v).collect()
    assert {r["_change_type"] for r in ch} == {"insert", "delete"}


def test_merge_only_rewrites_touched_files(spark, tmp_path):
    sink = _sink(spark, tmp_path, "m2")
    for b in range(4):
        sink.append(
            spark.createDataFrame(
                [(b * 10 + i, "x") for i in range(10)], "id long, v string"
            ).coalesce(1)
        )
    from mirror_lake_kusto_spark.sources import delta_log as DL

    before = {f["path"] for f in DL.snapshot_files(spark, sink.path)}
    sink.merge(
        spark.createDataFrame([(15, "upd")], "id long, v string"), ["id"]
    )
    after = {f["path"] for f in DL.snapshot_files(spark, sink.path)}
    assert len(before & after) == 3  # three untouched files survive
    assert sink.to_df().filter("id = 15").collect()[0]["v"] == "upd"
    assert sink.to_df().count() == 40


def test_merge_duplicate_target_rows_all_update(spark, tmp_path):
    sink = _sink(spark, tmp_path, "m3")
    sink.append(
        spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "id long, v string"
        ).coalesce(1)
    )
    sink.merge(spark.createDataFrame([(1, "upd")], "id long, v string"), ["id"])
    rows = sorted((r["id"], r["v"]) for r in sink.to_df().collect())
    # both copies of id=1 carry the update (Delta matched-update multiplicity)
    assert rows == [(1, "upd"), (1, "upd"), (2, "c")]


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    sink = _sink(spark, tmp_path, "m4")
    sink.append(spark.range(3).toDF("id"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate keys"):
        sink.merge(
            spark.createDataFrame([(1,), (1,)], "id long"), ["id"]
        )


def test_merge_partitioned_requires_partition_key(spark, tmp_path):
    sink = _sink(spark, tmp_path, "m5", partition_by=["g"])
    sink.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, g string")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="partition columns"):
        sink.merge(
            spark.createDataFrame([(1, "a")], "id long, g string"), ["id"]
        )
    v = sink.merge(
        spark.createDataFrame(
            [(1, "a", ), (3, "c")], "id long, g string"
        ),
        ["id", "g"],
    )
    assert v >= 0
    rows = sorted((r["id"], r["g"]) for r in sink.to_df().collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_into_empty_table_is_append(spark, tmp_path):
    sink = _sink(spark, tmp_path, "m6")
    sink.merge(spark.createDataFrame([(1, "x")], "id long, v string"), ["id"])
    assert sink.to_df().count() == 1


# -- history / restore -------------------------------------------------------


def test_history_records_operations(spark, tmp_path):
    sink = _sink(spark, tmp_path, "hist")
    sink.append(spark.range(10).toDF("id").coalesce(1))
    sink.delete("id >= 8")
    sink.optimize(zorder_by=["id"])
    ops = {r["version"]: r["operation"] for r in sink.history().collect()}
    assert ops[0] == "WRITE" and ops[1] == "DELETE"
    assert ops[2] == "OPTIMIZE ZORDER"
    h = {r["version"]: r for r in sink.history().collect()}
    assert h[0].n_adds >= 1 and h[0].n_removes == 0
    assert h[1].n_removes >= 1


def test_restore_to_earlier_version(spark, tmp_path):
    sink = _sink(spark, tmp_path, "rest")
    sink.append(spark.range(10).toDF("id").coalesce(1))      # v0
    sink.append(spark.range(10, 20).toDF("id").coalesce(1))  # v1
    sink.delete("id < 5")                                    # v2
    assert sink.to_df().count() == 15
    v = sink.restore(1)
    assert v == 3  # restore is a NEW commit
    assert sorted(r["id"] for r in sink.to_df().collect()) == list(range(20))
    assert "RESTORE" in {r["operation"] for r in sink.history().collect() if r["version"] == 3}.pop()
    # restoring to v0 drops the second append too
    sink.restore(0)
    assert sorted(r["id"] for r in sink.to_df().collect()) == list(range(10))
    # change feed sees the restore as delete+insert rows
    ch = sink.changes(4, 4).collect()
    assert {r["_change_type"] for r in ch} == {"delete"}


def test_restore_after_vacuum_raises(spark, tmp_path):
    sink = _sink(spark, tmp_path, "restv")
    sink.append(spark.range(5).toDF("id").coalesce(1))
    sink.delete("id >= 0")  # all rows out; old file dead
    sink.vacuum()
    with pytest.raises(ValueError, match="vacuumed"):
        sink.restore(0)


def test_explicit_to_version_beyond_head_raises(spark, tmp_path):
    """An explicit [from, to] span must be fully committed — a
    to_version past head would silently under-report otherwise."""
    sink = _sink(spark, tmp_path, "span_hi")
    sink.append(spark.range(3).toDF("id"))  # head = 0
    with pytest.raises(ValueError, match="beyond the latest commit"):
        sink.changes(0, 5)


def test_inverted_explicit_span_raises(spark, tmp_path):
    sink = _sink(spark, tmp_path, "span_inv")
    sink.append(spark.range(3).toDF("id"))
    sink.append(spark.range(3, 6).toDF("id"))
    with pytest.raises(ValueError, match="empty change span"):
        sink.changes(1, 0)
