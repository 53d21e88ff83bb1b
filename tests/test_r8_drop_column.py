"""Round-8 ALTER TABLE DROP COLUMN (column-mapping logical drop).

Metadata-only: data files keep their bytes, the field leaves the
logical schema, reads stop surfacing it, and a column RE-ADDED later
gets a fresh ``col-<uuid>`` physical name so the dropped bytes never
resurrect — Delta's own drop semantics.
"""

import json
import os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _mk(spark, tmp_path, name="t", partition_by=()):
    sink = DeltaSink(spark, str(tmp_path / name), partition_by=partition_by)
    sink.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)],
            "id long, name string, score double",
        )
    )
    return sink


def _data_files(path):
    out = []
    for dirpath, _dirs, names in os.walk(path):
        if "_delta_log" in dirpath:
            continue
        out += [n for n in names if n.endswith(".parquet")]
    return sorted(out)


def test_drop_is_metadata_only(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    before = _data_files(sink.path)
    sink.evolve_drop(["score"])
    assert _data_files(sink.path) == before, "no data file may move"
    df = DL.read_snapshot(spark, sink.path)
    assert sorted(df.columns) == ["id", "name"]
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    proto = DL.latest_protocol(sink.path)
    assert "columnMapping" in (proto["readerFeatures"] or [])


def test_append_and_read_after_drop(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.evolve_drop(["score"])
    sink.append(
        spark.createDataFrame([(3, "c")], "id long, name string")
    )
    got = sorted(
        (r.id, r.name)
        for r in DL.read_snapshot(spark, sink.path).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_readd_never_resurrects_dropped_bytes(spark, tmp_path):
    """The key Delta semantics: dropping `score` and re-adding a
    column named `score` must read NULL for the old rows, not the old
    bytes still sitting in the parquet files."""
    sink = _mk(spark, tmp_path)
    sink.evolve_drop(["score"])
    meta = DL.latest_metadata(spark, sink.path)
    schema = json.loads(meta["schemaString"])
    schema["fields"].append(
        {"name": "score", "type": "double", "nullable": True, "metadata": {}}
    )
    sink.evolve_add(json.dumps(schema))
    fields = {
        f["name"]: f.get("metadata") or {}
        for f in json.loads(
            DL.latest_metadata(spark, sink.path)["schemaString"]
        )["fields"]
    }
    phys = fields["score"]["delta.columnMapping.physicalName"]
    assert phys.startswith("col-"), phys
    got = {
        r.id: r.score
        for r in DL.read_snapshot(spark, sink.path).collect()
    }
    assert got == {1: None, 2: None}


def test_drop_on_previously_renamed_table(spark, tmp_path):
    sink = _mk(spark, tmp_path, "t2")
    sink.evolve_rename({"name": "label"})
    sink.evolve_drop(["score"])
    df = DL.read_snapshot(spark, sink.path)
    assert sorted(df.columns) == ["id", "label"]
    assert sorted((r.id, r.label) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_drop_refusals(spark, tmp_path):
    part = DeltaSink(
        spark, str(tmp_path / "p"), partition_by=["name"]
    )
    part.append(
        spark.createDataFrame(
            [(1, "a", 1.0)], "id long, name string, score double"
        )
    )
    with pytest.raises(ValueError, match="partition"):
        part.evolve_drop(["name"])
    sink = _mk(spark, tmp_path, "t3")
    with pytest.raises(ValueError, match="unknown"):
        sink.evolve_drop(["nope"])
    with pytest.raises(ValueError, match="every column"):
        sink.evolve_drop(["id", "name", "score"])
    sink.add_constraint("pos_score", "score >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        sink.evolve_drop(["score"])
    sink.drop_constraint("pos_score")
    sink.add_generated_column("dbl", "double", "score * 2")
    with pytest.raises(ValueError, match="generated"):
        sink.evolve_drop(["score"])
    # dropping the generated column itself is fine
    sink.evolve_drop(["dbl"])
    assert "dbl" not in DL.read_snapshot(spark, sink.path).columns


def test_drop_clustering_column_refused(spark, tmp_path):
    sink = _mk(spark, tmp_path, "t4")
    sink.set_cluster_by(["id", "score"])
    with pytest.raises(ValueError, match="clustering"):
        sink.evolve_drop(["score"])


def test_mirror_follows_source_drop(spark, tmp_path):
    """on_schema_change='evolve-drop': a SOURCE column drop narrows
    the TARGET metadata-only mid-stream, and the sync continues —
    pre-drop source files read fine under the narrow schema."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import (
        MirrorPipeline,
        SchemaChangedError,
    )

    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)],
            "id long, name string, score double",
        )
    )
    pipe = MirrorPipeline(
        spark,
        src,
        str(tmp_path / "dst"),
        str(tmp_path / "state"),
        table_name="t",
        on_schema_change="evolve-drop",
    )
    pipe.run_until_idle()
    s.evolve_drop(["score"])
    s.append(spark.createDataFrame([(3, "c")], "id long, name string"))
    pipe.run_until_idle()
    df = DL.read_snapshot(spark, pipe.sink.path)
    # the target also carries the mirror's MLK_* lineage columns —
    # what matters is that score is GONE and the data columns remain
    assert "score" not in df.columns
    assert {"id", "name"} <= set(df.columns)
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    # replay idempotence: nothing further to do
    assert pipe.run_once()["status"] == "up-to-date"
    # 'fail' parity: the same change under the default mode throws
    src2 = str(tmp_path / "src2")
    s2 = DeltaSink(spark, src2)
    s2.append(
        spark.createDataFrame([(1, "a", 1.0)], "id long, n string, x double")
    )
    pipe2 = MirrorPipeline(
        spark,
        src2,
        str(tmp_path / "dst2"),
        str(tmp_path / "state2"),
        table_name="t2",
    )
    pipe2.run_until_idle()
    s2.evolve_drop(["x"])
    s2.append(spark.createDataFrame([(2, "b")], "id long, n string"))
    with pytest.raises(SchemaChangedError):
        pipe2.run_until_idle()


def test_mirror_drop_rejects_retype_shaped_change(spark, tmp_path):
    """A drop+re-add with a DIFFERENT type reaches the mirror as a
    retype of the column — not drop-shaped — and must raise loudly
    rather than silently losing data."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import (
        MirrorPipeline,
        SchemaChangedError,
    )

    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.createDataFrame([(1, "a", 5)], "id long, n string, v long")
    )
    pipe = MirrorPipeline(
        spark,
        src,
        str(tmp_path / "dst"),
        str(tmp_path / "state"),
        table_name="t",
        on_schema_change="evolve-drop",
    )
    pipe.run_until_idle()
    # retype v: long -> string on the source (surviving-field retype)
    import json as _json

    meta = DL.latest_metadata(spark, src)
    schema = _json.loads(meta["schemaString"])
    s.evolve_drop(["v"])
    schema2 = _json.loads(
        DL.latest_metadata(spark, src)["schemaString"]
    )
    schema2["fields"].append(
        {"name": "v", "type": "string", "nullable": True, "metadata": {}}
    )
    s.evolve_add(_json.dumps(schema2))
    s.append(
        spark.createDataFrame([(2, "b", "s")], "id long, n string, v string")
    )
    # drop+re-add with a DIFFERENT type reaches the mirror as a
    # retype of v -> not drop-shaped -> loud failure, no silent loss
    with pytest.raises(SchemaChangedError):
        pipe.run_until_idle()


def test_mirror_drop_rejects_real_rename(spark, tmp_path):
    """A SOURCE RENAME is drop+add by logical name, but the mapping
    physicalName survives — evolve-drop must recognize the identity
    and raise instead of silently blanking the target column."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import (
        MirrorPipeline,
        SchemaChangedError,
    )

    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.createDataFrame(
            [(1, "a", 5.0)], "id long, n string, v double"
        )
    )
    pipe = MirrorPipeline(
        spark,
        src,
        str(tmp_path / "dst"),
        str(tmp_path / "state"),
        table_name="t",
        on_schema_change="evolve-drop",
    )
    pipe.run_until_idle()
    s.evolve_rename({"v": "w"})
    s.append(
        spark.createDataFrame([(2, "b", 7.0)], "id long, n string, w double")
    )
    with pytest.raises(SchemaChangedError):
        pipe.run_until_idle()


def test_mirror_drop_mode_follows_pure_add(spark, tmp_path):
    """The documented contract: evolve-drop accepts ADDED columns too
    (a pure add is the most routine schema change — the mode must not
    halt on it)."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline

    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(spark.createDataFrame([(1, "a")], "id long, n string"))
    pipe = MirrorPipeline(
        spark,
        src,
        str(tmp_path / "dst"),
        str(tmp_path / "state"),
        table_name="t",
        on_schema_change="evolve-drop",
    )
    pipe.run_until_idle()
    s.append(
        spark.createDataFrame([(2, "b", 9.0)], "id long, n string, x double")
    )
    pipe.run_until_idle()
    df = DL.read_snapshot(spark, pipe.sink.path)
    got = {(r.id): (r.n, r.x) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.0)}
    # ...and a drop AFTER the add still follows
    s.evolve_drop(["x"])
    s.append(spark.createDataFrame([(3, "c")], "id long, n string"))
    pipe.run_until_idle()
    df2 = DL.read_snapshot(spark, pipe.sink.path)
    assert "x" not in df2.columns
    assert sorted(r.id for r in df2.collect()) == [1, 2, 3]
