"""Round-6: IDENTITY columns (PROTOCOL.md "Identity Columns").

``add_identity_column`` records delta.identity.start/step/
allowExplicitInsert field metadata + the identityColumns writer
feature; every subsequent append assigns system-generated BIGINT
values — unique, monotonic, on the start+k*step grid, gap-tolerant
(Delta's own contract) — via a pure-JVM shuffle-free interleave, and
advances delta.identity.highWaterMark in the SAME commit as the data.
"""

from __future__ import annotations

import json

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _hwm(spark, path, name):
    meta = DL.latest_metadata(spark, path)
    f = [
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == name
    ][0]
    return f["metadata"].get("delta.identity.highWaterMark")


def test_identity_assignment_grid_unique_monotonic(spark, tmp_path):
    path = str(tmp_path / "idt")
    sink = DeltaSink(spark, path)
    sink.append(spark.range(0, 5).toDF("x").coalesce(1))
    sink.add_identity_column("rid", start=100, step=10)
    proto = DL.latest_protocol(path)
    assert "identityColumns" in (proto.get("writerFeatures") or [])
    sink.append(spark.range(5, 8).toDF("x").repartition(3))
    h1 = _hwm(spark, path, "rid")
    sink.append(spark.range(8, 10).toDF("x").coalesce(1))
    h2 = _hwm(spark, path, "rid")
    rows = {
        r.x: r.rid for r in DL.read_snapshot(spark, path).collect()
    }
    # pre-identity rows read NULL (assignment is write-time, like
    # generated columns); new rows are unique and on the grid
    assert all(rows[x] is None for x in range(5))
    rids = [rows[x] for x in range(5, 10)]
    assert len(set(rids)) == 5
    assert all((r - 100) % 10 == 0 and r >= 100 for r in rids)
    # watermark advanced per batch, monotonic, in the same commits
    assert h2 > h1 >= max(rids[:3]) - 0  # batch-1 max <= h1
    assert h2 == max(rids)


def test_identity_explicit_insert_refused(spark, tmp_path):
    path = str(tmp_path / "idtx")
    sink = DeltaSink(spark, path)
    sink.append(spark.range(0, 2).toDF("x"))
    sink.add_identity_column("rid")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        sink.append(spark.sql("select 9 as x, cast(1 as long) as rid"))


def test_identity_negative_step_and_restart(spark, tmp_path):
    path = str(tmp_path / "idtn")
    sink = DeltaSink(spark, path)
    sink.append(spark.range(0, 1).toDF("x"))
    sink.add_identity_column("down", start=0, step=-5)
    sink.append(spark.range(1, 4).toDF("x").coalesce(1))
    rids = [
        r.down
        for r in DL.read_snapshot(spark, path).filter("x >= 1").collect()
    ]
    assert sorted(rids, reverse=True) == [0, -5, -10]
    assert _hwm(spark, path, "down") == -10
    # a FRESH sink instance (restart) continues past the watermark
    sink2 = DeltaSink(spark, path)
    sink2.append(spark.range(4, 6).toDF("x").coalesce(1))
    rids2 = [
        r.down
        for r in DL.read_snapshot(spark, path).filter("x >= 4").collect()
    ]
    assert sorted(rids2, reverse=True) == [-15, -20]
