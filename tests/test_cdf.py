"""Change Data Feed (PROTOCOL.md "Change Data Feed" / "Add CDC File"):
DML paths stage row-level ``_change_data/`` files + ``cdc`` actions
when ``delta.enableChangeDataFeed`` is set, and ``read_changes``
prefers them exclusively over the commit's add/remove churn.  Without
the property the feed stays at the documented file-level granularity.
"""

from __future__ import annotations

import json

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _changes(spark, path, frm, to=None):
    rows = DL.read_changes(spark, str(path), frm, to).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in rows
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_cdf_delete_row_level(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    v0 = sink.append(_mk(spark, [(i, f"r{i}") for i in range(6)]))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    vd = sink.delete("id >= 4")

    # the delete commit carries cdc actions with dataChange: false
    log = (tmp_path / "t" / "_delta_log" / f"{vd:020d}.json").read_text()
    cdc = [
        json.loads(x)["cdc"]
        for x in log.splitlines()
        if '"cdc"' in x
    ]
    assert cdc and all(a["path"].startswith("_change_data/") for a in cdc)
    assert all(a["dataChange"] is False for a in cdc)

    # row-level deletes only — NOT the file-level remove+re-add shape
    ch = _changes(spark, path, vd, vd)
    assert ch == [(vd, "delete", 4, "r4"), (vd, "delete", 5, "r5")]

    # the append commit still synthesizes inserts from its add actions
    ch0 = _changes(spark, path, v0, v0)
    assert [c[1] for c in ch0] == ["insert"] * 6

    # snapshot is unaffected by the change files
    ids = sorted(
        r["id"] for r in DL.read_snapshot(spark, path).collect()
    )
    assert ids == [0, 1, 2, 3]


def test_cdf_merge_pre_post_insert_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(_mk(spark, [(1, "old1"), (2, "old2"), (3, "old3")]))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    vm = sink.merge(
        _mk(spark, [(2, "new2"), (9, "new9")]),
        ["id"],
        delete_keys=spark.createDataFrame([(3,)], "id long"),
    )
    ch = _changes(spark, path, vm, vm)
    assert ch == [
        (vm, "delete", 3, "old3"),
        (vm, "insert", 9, "new9"),
        (vm, "update_postimage", 2, "new2"),
        (vm, "update_preimage", 2, "old2"),
    ]


def test_cdf_delete_dv_reports_only_new_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(_mk(spark, [(i, f"r{i}") for i in range(8)]))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    v1 = sink.delete_dv("id IN (1, 2)")
    # overlapping predicate: rows 1-2 are already deleted and must
    # not re-report; only 3 is new
    v2 = sink.delete_dv("id IN (1, 2, 3)")
    assert _changes(spark, path, v1, v1) == [
        (v1, "delete", 1, "r1"),
        (v1, "delete", 2, "r2"),
    ]
    assert _changes(spark, path, v2, v2) == [(v2, "delete", 3, "r3")]
    ids = sorted(r["id"] for r in DL.read_snapshot(spark, path).collect())
    assert ids == [0, 4, 5, 6, 7]


def test_cdf_partitioned_change_files(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, partition_by=["p"])
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", f"r{i}") for i in range(6)],
        "id long, p string, v string",
    )
    sink.append(df)
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    vd = sink.delete("id >= 3")
    rows = DL.read_changes(spark, str(path), vd, vd).collect()
    got = sorted((r["id"], r["p"], r["_change_type"]) for r in rows)
    assert got == [(3, "b", "delete"), (4, "a", "delete"), (5, "b", "delete")]
    # cdc actions record the partition values like data files do
    log = (tmp_path / "t" / "_delta_log" / f"{vd:020d}.json").read_text()
    pvs = sorted(
        {
            json.loads(x)["cdc"]["partitionValues"]["p"]
            for x in log.splitlines()
            if '"cdc"' in x
        }
    )
    assert pvs == ["a", "b"]


def test_cdf_property_commits_writer_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(_mk(spark, [(1, "x")]))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    proto = DL.latest_protocol(path)
    assert "changeDataFeed" in (proto.get("writerFeatures") or [])
    # snapshot reads still pass the protocol guard (writer feature
    # only; reader version untouched by this upgrade)
    DL.check_protocol_supported(path)


def test_cdf_checkpoint_excludes_cdc_and_feed_survives(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, checkpoint_interval=2)
    sink.append(_mk(spark, [(i, f"r{i}") for i in range(4)]))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    vd = sink.delete("id = 0")
    sink.append(_mk(spark, [(10, "r10")]))
    sink.append(_mk(spark, [(11, "r11")]))  # crosses a checkpoint
    # checkpoint parquet carries no cdc column content; snapshot sound
    ids = sorted(r["id"] for r in DL.read_snapshot(spark, path).collect())
    assert ids == [1, 2, 3, 10, 11]
    # the feed still reads the delete row-level through the span
    ch = _changes(spark, path, vd, vd)
    assert ch == [(vd, "delete", 0, "r0")]


def test_file_level_synthesis_without_property(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    # one data file, so the CoW rewrite has survivors to re-add
    sink.append(_mk(spark, [(i, f"r{i}") for i in range(4)]).coalesce(1))
    vd = sink.delete("id = 0")
    # pre-CDF granularity: whole old file deleted + survivors inserted
    ch = _changes(spark, path, vd, vd)
    kinds = {c[1] for c in ch}
    assert kinds == {"delete", "insert"}
    assert (vd, "delete", 0, "r0") in ch
    # no change files were staged
    assert not (tmp_path / "t" / "_change_data").exists()


def test_vacuum_keeps_retained_change_files(spark, tmp_path):
    path = str(tmp_path / "t")
    # long checkpoint interval: no metadata truncation -> every cdc
    # commit is retained, so vacuum must keep every change file
    sink = DeltaSink(spark, path, checkpoint_interval=100)
    sink.append(_mk(spark, [(i, f"r{i}") for i in range(4)]).coalesce(1))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    vd = sink.delete("id = 1")
    sink.vacuum()
    assert _changes(spark, path, vd, vd) == [(vd, "delete", 1, "r1")]

    # after a checkpoint + vacuum truncates the log past the cdc
    # commit, its change files are garbage and must be collected
    sink2 = DeltaSink(spark, path, checkpoint_interval=1)
    sink2.append(_mk(spark, [(50, "r50")]))  # writes a checkpoint
    out = sink2.vacuum()
    assert out["log_files"] > 0
    import os

    cdc_left = []
    for dirpath, _dirs, files in os.walk(
        os.path.join(path, "_change_data")
    ):
        cdc_left.extend(f for f in files if f.endswith(".parquet"))
    assert cdc_left == []


def test_cdf_stream_replicates_table_end_to_end(spark, tmp_path):
    """Flagship CDC story: source table's change feed streamed into a
    replica via the exactly-once upsert sink — replica == source after
    appends, a CoW delete, and a merge (update + insert + delete)."""
    import pyspark.sql.functions as F

    from mirror_lake_kusto_spark.streaming.delta_source import (
        DeltaLogDataSource,
    )
    from mirror_lake_kusto_spark.streaming.upsert import upsert_stream

    spark.dataSource.register(DeltaLogDataSource)

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    src = DeltaSink(spark, src_path)
    src.append(_mk(spark, [(i, f"r{i}") for i in range(10)]).coalesce(1))
    src.set_properties({"delta.enableChangeDataFeed": "true"})
    src.delete("id >= 8")
    src.merge(
        _mk(spark, [(2, "X2"), (20, "X20")]),
        ["id"],
        delete_keys=spark.createDataFrame([(5,)], "id long"),
    )

    changes = (
        spark.readStream.format("mlk_delta")
        .option("path", src_path)
        .option("readChangeFeed", "true")
        .load()
        .filter("_change_type != 'update_preimage'")
        .withColumn("_is_del", F.expr("_change_type = 'delete'"))
    )
    dst = DeltaSink(spark, dst_path)
    q = upsert_stream(
        changes,
        dst,
        key_cols=["id"],
        app_id="cdc-replica",
        checkpoint_dir=str(tmp_path / "ckpt"),
        version_col="_commit_version",
        delete_col="_is_del",
        target_cols=["id", "v"],
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)

    got = sorted(
        (r["id"], r["v"])
        for r in DL.read_snapshot(spark, dst_path).collect()
    )
    want = sorted(
        (r["id"], r["v"])
        for r in DL.read_snapshot(spark, src_path).collect()
    )
    assert got == want
    assert got == [
        (0, "r0"), (1, "r1"), (2, "X2"), (3, "r3"), (4, "r4"),
        (6, "r6"), (7, "r7"), (20, "X20"),
    ]


def test_delete_dv_noop_when_all_matches_already_deleted(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(_mk(spark, [(i, f"r{i}") for i in range(6)]).coalesce(1))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    v1 = sink.delete_dv("id IN (1, 2)")
    head_before = v1
    # identical predicate: every match is already deleted — the commit
    # must be SKIPPED (a DV re-add with no cdc action would break the
    # change feed over that span)
    v2 = sink.delete_dv("id IN (1, 2)")
    assert v2 == head_before  # no new commit
    # feed over the whole span stays readable and exact
    ch = _changes(spark, path, 0)
    dels = [(c[2], c[0]) for c in ch if c[1] == "delete"]
    assert dels == [(1, v1), (2, v1)]
