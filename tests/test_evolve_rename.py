"""Mapping-aware schema evolution (round 5).

A column RENAME is metadata-only under Delta column mapping: the
physical parquet spelling never changes, only the logical label.
``DeltaSink.evolve_rename`` enables 'name'-mode mapping (physicalName
= the spelling existing files carry) and relabels; the mirror's
``on_schema_change='evolve-rename'`` accepts a source rename
mid-stream and relabels the target the same way.  Drop/retype still
fail loudly (reference parity: Storage/TransactionLog.cs:153-157).
"""

from __future__ import annotations

import json
import os

import pytest

from mirror_lake_kusto_spark.pipeline.orchestrate import (
    MirrorPipeline,
    SchemaChangedError,
)
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _data_files(path):
    out = []
    for dirpath, _dirs, files in os.walk(path):
        if "_delta_log" in dirpath or "_staging" in dirpath:
            continue
        out.extend(f for f in files if f.endswith(".parquet"))
    return sorted(out)


def test_sink_evolve_rename_metadata_only(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t"))
    sink.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    before = _data_files(sink.path)
    sink.evolve_rename({"v": "val"})
    # no data file moved or rewritten
    assert _data_files(sink.path) == before
    df = DL.read_snapshot(spark, sink.path)
    assert df.columns == ["k", "val"]
    assert sorted((r["k"], r["val"]) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # protocol carries columnMapping + enumerated legacy features
    pr = DL.latest_protocol(sink.path)
    assert "columnMapping" in pr["readerFeatures"]
    assert {"appendOnly", "invariants", "columnMapping"} <= set(
        pr["writerFeatures"]
    )


def test_sink_append_after_rename_writes_physical(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t"))
    sink.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    sink.evolve_rename({"v": "val"})
    sink.append(spark.createDataFrame([(2, "b")], "k long, val string"))
    df = DL.read_snapshot(spark, sink.path)
    assert sorted((r["k"], r["val"]) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # the NEW file stores the physical spelling 'v'
    import pyarrow.parquet as papq

    newest = max(
        (
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(sink.path)
            for f in fs
            if f.endswith(".parquet") and "_delta_log" not in dp
        ),
        key=os.path.getmtime,
    )
    assert "v" in papq.read_schema(newest).names
    assert "val" not in papq.read_schema(newest).names


def test_sink_evolve_rename_partition_column(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t"), partition_by=["p"])
    sink.append(
        spark.createDataFrame(
            [(1, "A"), (2, "B")], "n long, p string"
        ).repartition(1)
    )
    sink.evolve_rename({"p": "region"})
    df = DL.read_snapshot(spark, sink.path)
    assert set(df.columns) == {"n", "region"}
    assert sorted((r["n"], r["region"]) for r in df.collect()) == [
        (1, "A"),
        (2, "B"),
    ]
    # appends after the rename land in the OLD physical dirs (p=...)
    sink.append(
        spark.createDataFrame([(3, "A")], "n long, region string").repartition(1)
    )
    assert sorted(
        r["n"]
        for r in DL.read_snapshot(
            spark, sink.path, partition_predicate="region = 'A'"
        ).collect()
    ) == [1, 3]
    assert not any(d.startswith("region=") for d in os.listdir(sink.path))


def test_sink_evolve_rename_rejects_unknown_and_dupes(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t"))
    sink.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(ValueError, match="unknown"):
        sink.evolve_rename({"nope": "x"})
    with pytest.raises(ValueError, match="duplicate"):
        sink.evolve_rename({"v": "k"})


def _mk_source(spark, tmp_path):
    src = DeltaSink(spark, str(tmp_path / "src"))
    src.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )
    return src


def test_mirror_rename_mid_stream(spark, tmp_path):
    """The VERDICT-prescribed fixture: batch 1 mirrors under the old
    name, the source renames v->val (metadata-only), batch 2 appends
    under the new name; evolve-rename relabels the target and keeps
    mirroring."""
    src = _mk_source(spark, tmp_path)
    pipe = MirrorPipeline(
        spark,
        source_path=src.path,
        target_path=str(tmp_path / "dst"),
        state_dir=str(tmp_path / "state"),
        table_name="ren",
        on_schema_change="evolve-rename",
    )
    pipe.run_until_idle()
    assert "v" in pipe.mirror_df().columns
    src.evolve_rename({"v": "val"})
    src.append(spark.createDataFrame([(3, "c")], "k long, val string"))
    pipe.run_until_idle()
    df = pipe.mirror_df()
    assert "val" in df.columns and "v" not in df.columns
    assert sorted((r["k"], r["val"]) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    assert pipe.run_once()["status"] == "up-to-date"


def test_mirror_rename_fail_mode_raises(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    pipe = MirrorPipeline(
        spark,
        source_path=src.path,
        target_path=str(tmp_path / "dst"),
        state_dir=str(tmp_path / "state"),
        table_name="ren_fail",
    )
    pipe.run_until_idle()
    src.evolve_rename({"v": "val"})
    src.append(spark.createDataFrame([(3, "c")], "k long, val string"))
    with pytest.raises(SchemaChangedError):
        pipe.run_once()


def test_mirror_rename_mode_still_rejects_retype(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    pipe = MirrorPipeline(
        spark,
        source_path=src.path,
        target_path=str(tmp_path / "dst"),
        state_dir=str(tmp_path / "state"),
        table_name="ren_retype",
        on_schema_change="evolve-rename",
    )
    pipe.run_until_idle()
    # forge a retype commit on the source (v: string -> long)
    meta = DL.latest_metadata(spark, src.path)
    parsed = json.loads(meta["schemaString"])
    for f in parsed["fields"]:
        if f["name"] == "v":
            f["type"] = "long"
    forged = {**meta, "schemaString": json.dumps(parsed)}
    with open(
        os.path.join(src.path, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"metaData": forged}) + "\n")
    with pytest.raises(SchemaChangedError, match="rename"):
        pipe.run_once()


def test_mirror_rename_mode_accepts_adds_too(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    pipe = MirrorPipeline(
        spark,
        source_path=src.path,
        target_path=str(tmp_path / "dst"),
        state_dir=str(tmp_path / "state"),
        table_name="ren_add",
        on_schema_change="evolve-rename",
    )
    pipe.run_until_idle()
    src.append(
        spark.createDataFrame([(3, "c", 9)], "k long, v string, extra long")
    )
    pipe.run_until_idle()
    df = pipe.mirror_df()
    assert "extra" in df.columns
    assert sorted(
        (r["k"], r["extra"]) for r in df.collect()
    ) == [(1, None), (2, None), (3, 9)]


def test_mirror_add_column_after_rename(spark, tmp_path):
    """Round-5 review finding: an ADD after a RENAME must not wedge.
    The rename makes the target column-mapped; the later additive
    change then evolves the mapped target via evolve_add (explicit
    metaData with fresh mapping identities) instead of the implicit
    schema-changing append _commit refuses."""
    src = _mk_source(spark, tmp_path)
    pipe = MirrorPipeline(
        spark,
        source_path=src.path,
        target_path=str(tmp_path / "dst"),
        state_dir=str(tmp_path / "state"),
        table_name="ren_then_add",
        on_schema_change="evolve-rename",
    )
    pipe.run_until_idle()
    # 1) rename v -> val on the source, mirror follows
    src.evolve_rename({"v": "val"})
    src.append(spark.createDataFrame([(3, "c")], "k long, val string"))
    pipe.run_until_idle()
    # 2) source ADDS a column — previously raised ValueError forever
    src.evolve_add(
        spark.createDataFrame([], "k long, val string, extra long")
        .schema.json()
    )
    src.append(
        spark.createDataFrame([(4, "d", 9)], "k long, val string, extra long")
    )
    pipe.run_until_idle()
    df = pipe.mirror_df()
    assert {"k", "val", "extra"} <= set(df.columns)
    assert sorted((r["k"], r["val"], r["extra"]) for r in df.collect()) == [
        (1, "a", None),
        (2, "b", None),
        (3, "c", None),
        (4, "d", 9),
    ]
    # steady state: nothing further to do, and a replayed run is a no-op
    assert pipe.run_once()["status"] == "up-to-date"
    # target metadata carries mapping identities for ALL columns
    meta = DL.latest_metadata(spark, pipe.sink.path)
    fields = json.loads(meta["schemaString"])["fields"]
    by_name = {f["name"]: f["metadata"] for f in fields}
    assert by_name["val"]["delta.columnMapping.physicalName"] == "v"
    # columns added AFTER mapping enablement get col-<uuid> physical
    # names (Delta's convention since round 8's evolve_drop: a
    # re-added name must never collide with dropped bytes)
    assert by_name["extra"]["delta.columnMapping.physicalName"].startswith(
        "col-"
    )


def test_evolve_add_idempotent_and_rejects_retype(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t"))
    sink.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    sink.evolve_rename({"v": "val"})
    widened = (
        spark.createDataFrame([], "k long, val string, extra long")
        .schema.json()
    )
    v1 = sink.evolve_add(widened)
    assert v1 >= 0
    # replay: no new fields -> no commit
    assert sink.evolve_add(widened) == -1
    with pytest.raises(ValueError, match="not additive"):
        sink.evolve_add(
            spark.createDataFrame([], "k string, val string").schema.json()
        )
