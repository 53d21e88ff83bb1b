"""Round-8 column DEFAULT values (PROTOCOL.md "Default Columns",
writer feature ``allowColumnDefaults``): ``CURRENT_DEFAULT`` field
metadata + writer-side fill of ABSENT columns on append/merge.
Supplied values (including explicit NULL) always win; existing rows
are untouched; the feature is writer-only so the reader version never
moves.
"""

import json

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _mk(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t"))
    sink.append(
        spark.createDataFrame(
            [(1, "a", "legacy"), (2, "b", "legacy")],
            "id long, name string, status string",
        )
    )
    return sink


def test_absent_column_fills_default(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.set_column_default("status", "'active'")
    sink.append(
        spark.createDataFrame([(3, "c")], "id long, name string")
    )
    got = {
        r.id: r.status
        for r in DL.read_snapshot(spark, sink.path).collect()
    }
    assert got == {1: "legacy", 2: "legacy", 3: "active"}


def test_supplied_value_wins_including_null(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.set_column_default("status", "'active'")
    sink.append(
        spark.createDataFrame(
            [(3, "c", None), (4, "d", "manual")],
            "id long, name string, status string",
        )
    )
    got = {
        r.id: r.status
        for r in DL.read_snapshot(spark, sink.path).collect()
    }
    assert got[3] is None and got[4] == "manual"


def test_writer_only_feature_gate(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    before = DL.latest_protocol(sink.path) or {"minReaderVersion": 1}
    sink.set_column_default("status", "'active'")
    proto = DL.latest_protocol(sink.path)
    assert "allowColumnDefaults" in (proto.get("writerFeatures") or [])
    assert proto["minReaderVersion"] == before.get("minReaderVersion", 1)
    meta = DL.latest_metadata(spark, sink.path)
    fields = {
        f["name"]: f.get("metadata") or {}
        for f in json.loads(meta["schemaString"])["fields"]
    }
    assert fields["status"]["CURRENT_DEFAULT"] == "'active'"


def test_default_survives_later_appends(spark, tmp_path):
    """A plain append regenerates schemaString from the frame — the
    CURRENT_DEFAULT metadata must carry forward, like generation
    expressions do."""
    sink = _mk(spark, tmp_path)
    sink.set_column_default("status", "'active'")
    sink.append(
        spark.createDataFrame(
            [(3, "c", "x")], "id long, name string, status string"
        )
    )
    meta = DL.latest_metadata(spark, sink.path)
    fields = {
        f["name"]: f.get("metadata") or {}
        for f in json.loads(meta["schemaString"])["fields"]
    }
    assert fields["status"].get("CURRENT_DEFAULT") == "'active'"
    sink.append(
        spark.createDataFrame([(5, "e")], "id long, name string")
    )
    got = {
        r.id: r.status
        for r in DL.read_snapshot(spark, sink.path).collect()
    }
    assert got[5] == "active"


def test_bad_default_fails_at_declaration(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    with pytest.raises(Exception):
        sink.set_column_default("status", "no_such_function(1,2)")
    with pytest.raises(ValueError):
        sink.set_column_default("nope", "'x'")


def test_drop_default(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.set_column_default("status", "'active'")
    sink.drop_column_default("status")
    assert sink._defaults() == {}
    with pytest.raises(ValueError):
        sink.drop_column_default("status")


def test_merge_insert_fills_default(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.set_column_default("status", "'active'")
    sink.merge(
        spark.createDataFrame([(9, "i")], "id long, name string"),
        ["id"],
    )
    got = {
        r.id: r.status
        for r in DL.read_snapshot(spark, sink.path).collect()
    }
    assert got[9] == "active"


def test_default_casts_to_column_type(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t2"))
    sink.append(
        spark.createDataFrame([(1, 5.0)], "id long, score double")
    )
    sink.set_column_default("score", "1 + 2")  # int expr, double col
    sink.append(spark.createDataFrame([(2,)], "id long"))
    got = {
        r.id: r.score
        for r in DL.read_snapshot(spark, sink.path).collect()
    }
    assert got[2] == 3.0


def _merge_fixture(spark, tmp_path, name):
    sink = DeltaSink(spark, str(tmp_path / name))
    sink.append(
        spark.createDataFrame(
            [(1, "a", "legacy"), (2, "b", "keepme")],
            "id long, name string, status string",
        )
    )
    sink.set_column_default("status", "'active'")
    return sink


def test_merge_matched_keeps_target_value(spark, tmp_path):
    """UPDATE SET * semantics: a source that OMITS a defaulted column
    must not clobber matched rows' stored values with the default —
    only the INSERTED row gets it."""
    sink = _merge_fixture(spark, tmp_path, "t")
    sink.merge(
        spark.createDataFrame(
            [(2, "b2"), (9, "i")], "id long, name string"
        ),
        ["id"],
    )
    got = {
        (r.id): (r.name, r.status)
        for r in DL.read_snapshot(spark, sink.path).collect()
    }
    assert got[2] == ("b2", "keepme")      # matched: target value kept
    assert got[9] == ("i", "active")       # inserted: default fills
    assert got[1] == ("a", "legacy")       # untouched


def test_merge_dv_matched_keeps_target_value(spark, tmp_path):
    sink = _merge_fixture(spark, tmp_path, "t2")
    sink.merge_dv(
        spark.createDataFrame(
            [(2, "b2"), (9, "i")], "id long, name string"
        ),
        ["id"],
    )
    got = {
        (r.id): (r.name, r.status)
        for r in DL.read_snapshot(spark, sink.path).collect()
    }
    assert got[2] == ("b2", "keepme")
    assert got[9] == ("i", "active")
    assert got[1] == ("a", "legacy")


def test_merge_cdf_postimage_shows_kept_value(spark, tmp_path):
    """The change feed's update_postimage must agree with what the
    table actually contains after the merge (kept target value, not
    the default)."""
    sink = _merge_fixture(spark, tmp_path, "t3")
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    v = sink.merge(
        spark.createDataFrame([(2, "b2")], "id long, name string"),
        ["id"],
    )
    post = [
        r
        for r in sink.changes(v, v).collect()
        if r["_change_type"] == "update_postimage"
    ]
    assert len(post) == 1
    assert (post[0].name, post[0].status) == ("b2", "keepme")


def test_merge_dv_cdf_postimage_shows_kept_value(spark, tmp_path):
    sink = _merge_fixture(spark, tmp_path, "t4")
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    v = sink.merge_dv(
        spark.createDataFrame([(2, "b2")], "id long, name string"),
        ["id"],
    )
    post = [
        r
        for r in sink.changes(v, v).collect()
        if r["_change_type"] == "update_postimage"
    ]
    assert len(post) == 1
    assert (post[0].name, post[0].status) == ("b2", "keepme")
