"""Round-6: row tracking (PROTOCOL.md "Row Tracking" + "Domain
Metadata") — stable per-row identities that survive rewrites, plus
mirror-side preservation of the SOURCE's row lineage.

- enabling ``delta.enableRowTracking`` commits the rowTracking +
  domainMetadata writer features, BACKFILLS ids for existing files and
  configures the materialized columns;
- every commit with adds assigns fresh ``baseRowId`` /
  ``defaultRowCommitVersion`` ranges and advances the
  ``delta.rowTracking`` high-water mark in the same commit;
- copy-on-write DELETE, OPTIMIZE, DV delete and REORG all preserve
  surviving rows' ids (materialized columns win over fresh ids);
- checkpoints carry baseRowId and live domain metadata (ids must
  survive log truncation);
- the MirrorPipeline materializes the source's row id per mirrored row
  (``MLK_SourceRowId``) and copies the source's app-domain metadata —
  the lineage the reference's single-writer design never had to keep
  (Storage/CheckpointGateway.cs:96-104).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _ids(spark, path):
    return {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }


def test_enable_backfill_and_fresh_ids(spark, tmp_path):
    path = str(tmp_path / "rt")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 5).toDF("id").coalesce(1))       # pre-RT
    sink.set_properties({"delta.enableRowTracking": "true"})
    proto = DL.latest_protocol(path)
    assert {"rowTracking", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    conf = DL.latest_metadata(spark, path)["configuration"]
    assert "delta.rowTracking.materializedRowIdColumnName" in conf
    dm = DL.latest_domain_metadata(path)
    assert json.loads(dm["delta.rowTracking"])["rowIdHighWaterMark"] == 4

    sink.append(spark.range(10, 13).toDF("id").coalesce(1))
    ids = _ids(spark, path)
    # backfilled rows got 0..4; the append got 5..7; all distinct
    assert sorted(rid for rid, _ in ids.values()) == list(range(8))
    assert json.loads(
        DL.latest_domain_metadata(path)["delta.rowTracking"]
    )["rowIdHighWaterMark"] == 7
    # defaultRowCommitVersion points at each row's commit
    assert len({rcv for _, rcv in ids.values()}) == 2


def test_delete_optimize_preserve_ids(spark, tmp_path):
    path = str(tmp_path / "rtp")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.set_properties  # noqa: B018 — silence linters on attr touch
    sink.append(spark.range(0, 6).toDF("id").repartition(3))
    sink.set_properties({"delta.enableRowTracking": "true"})
    before = _ids(spark, path)
    sink.delete("id = 2")
    mid = _ids(spark, path)
    assert all(before[i] == v for i, v in mid.items())
    sink.optimize()
    after = _ids(spark, path)
    assert set(after) == set(mid)
    assert all(before[i] == v for i, v in after.items())


def test_dv_delete_and_reorg_preserve_ids(spark, tmp_path):
    path = str(tmp_path / "rtdv")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 6).toDF("id").coalesce(1))
    sink.set_properties({"delta.enableRowTracking": "true"})
    before = _ids(spark, path)
    sink.delete_dv("id in (2, 4)")
    mid = _ids(spark, path)
    assert set(mid) == {0, 1, 3, 5}
    assert all(before[i] == v for i, v in mid.items())
    sink.reorg()
    after = _ids(spark, path)
    assert all(before[i] == v for i, v in after.items())


def test_row_ids_survive_checkpoint(spark, tmp_path):
    """baseRowId and the watermark domain live in the checkpoint: after
    truncating every JSON commit, ids read back unchanged."""
    path = str(tmp_path / "rtc")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 4).toDF("id").coalesce(1))
    sink.set_properties({"delta.enableRowTracking": "true"})
    sink.append(spark.range(10, 12).toDF("id").coalesce(1))
    before = _ids(spark, path)
    head = DL.list_commit_versions(path)[-1]
    sink._write_checkpoint(head)
    for v in DL.list_commit_versions(path):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    assert DL.list_commit_versions(path) == []
    assert _ids(spark, path) == before
    assert json.loads(
        DL.latest_domain_metadata(path)["delta.rowTracking"]
    )["rowIdHighWaterMark"] == 5
    # and the next append continues the id sequence, not restarts it
    sink2 = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink2.append(spark.range(20, 22).toDF("id").coalesce(1))
    after = _ids(spark, path)
    assert sorted(rid for rid, _ in after.values()) == list(range(8))


def test_cdf_and_row_tracking_interplay(spark, tmp_path):
    """The common Databricks combination: CDF + row tracking on one
    table.  Deletes produce exact change rows AND survivors keep their
    ids."""
    path = str(tmp_path / "rtcdf")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 6).toDF("id").coalesce(1))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    sink.set_properties({"delta.enableRowTracking": "true"})
    before = _ids(spark, path)
    vd = sink.delete("id >= 4")
    changes = DL.read_changes(spark, path, vd - 1).filter(
        f"_commit_version = {vd}"
    )
    deleted = sorted(
        r["id"] for r in changes.filter("_change_type = 'delete'").collect()
    )
    assert deleted == [4, 5]
    after = _ids(spark, path)
    assert set(after) == {0, 1, 2, 3}
    assert all(before[i] == v for i, v in after.items())


def test_mirror_preserves_source_row_ids_and_domains(spark, tmp_path):
    src_path = str(tmp_path / "src")
    src = DeltaSink(spark, src_path, checkpoint_interval=10**6)
    src.append(spark.range(0, 6).toDF("id").coalesce(1))
    src.set_properties({"delta.enableRowTracking": "true"})
    src._commit(
        [
            {
                "domainMetadata": {
                    "domain": "myapp.lineage",
                    "configuration": json.dumps({"x": 1}),
                    "removed": False,
                }
            }
        ],
        operation="SET DOMAIN",
    )
    src.append(spark.range(10, 13).toDF("id").coalesce(1))
    src.delete("id = 2")  # materializes survivor ids mid-history
    pipe = MirrorPipeline(
        spark,
        src_path,
        str(tmp_path / "dst"),
        str(tmp_path / "state"),
        table_name="t",
    )
    pipe.run_until_idle()
    mirror = {
        r["id"]: r["MLK_SourceRowId"]
        for r in pipe.mirror_df().select("id", "MLK_SourceRowId").collect()
    }
    source = {i: rid for i, (rid, _) in _ids(spark, src_path).items()}
    assert mirror == source
    # app domains copied; delta.* internals not
    dst_domains = DL.latest_domain_metadata(str(tmp_path / "dst"))
    assert dst_domains.get("myapp.lineage") == json.dumps({"x": 1})
    assert "delta.rowTracking" not in dst_domains


def test_rt_stats_required(spark, tmp_path):
    """An add without numRecords stats cannot size its id range: loud
    refusal, not silent id corruption."""
    path = str(tmp_path / "rte")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 2).toDF("id").coalesce(1))
    sink.set_properties({"delta.enableRowTracking": "true"})
    with pytest.raises(ValueError, match="numRecords"):
        sink._commit(
            [
                {
                    "add": {
                        "path": "x.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            ],
            operation="WRITE",
        )


def test_merge_preserves_ids_and_bumps_matched_rcv(spark, tmp_path):
    """Code-review regression: merge() must carry the materialized id
    columns through its rewrite — unmatched rows in rewritten files
    keep id AND commit version, matched rows keep id with the MERGE's
    commit version, inserted rows get fresh ids."""
    path = str(tmp_path / "rtm")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(
        spark.sql("select id as k, cast(id as long) as v from range(6)")
        .coalesce(1)
    )
    sink.set_properties({"delta.enableRowTracking": "true"})
    before = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }
    src = spark.sql(
        "select id as k, cast(id * 100 as long) as v from range(4, 8)"
    )
    vm = sink.merge(src, ["k"])
    after = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }
    # unmatched rows 0..3: id AND commit version unchanged
    for k in range(4):
        assert after[k] == before[k]
    # matched rows 4,5: same id, commit version = the merge's
    for k in (4, 5):
        assert after[k][0] == before[k][0]
        assert after[k][1] == vm
    # inserted rows 6,7: fresh distinct ids beyond the old watermark
    fresh = {after[k][0] for k in (6, 7)}
    assert len(fresh) == 2
    assert fresh.isdisjoint({rid for rid, _ in before.values()})
    assert all(after[k][1] == vm for k in (6, 7))


def test_reenable_row_tracking_is_idempotent(spark, tmp_path):
    """Code-review regression: re-running set_properties(enableRow
    Tracking) must keep the configured materialized column names (new
    names would orphan every materialized id) and must not corrupt the
    watermark."""
    path = str(tmp_path / "rti")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 4).toDF("id").coalesce(1))
    sink.set_properties({"delta.enableRowTracking": "true"})
    conf1 = DL.latest_metadata(spark, path)["configuration"]
    sink.delete("id = 1")  # materializes ids under the round-1 names
    ids1 = _ids(spark, path)
    sink.set_properties({"delta.enableRowTracking": "true"})  # re-apply
    conf2 = DL.latest_metadata(spark, path)["configuration"]
    assert (
        conf2["delta.rowTracking.materializedRowIdColumnName"]
        == conf1["delta.rowTracking.materializedRowIdColumnName"]
    )
    assert _ids(spark, path) == ids1  # identities survived the re-apply


def test_backfill_with_preassigned_ids_keeps_watermark(spark, tmp_path):
    """Code-review regression: a commit whose adds arrive with
    pre-assigned baseRowIds AND a caller watermark (the backfill shape)
    must keep the watermark action — and later stamping must start past
    both."""
    import json as _json

    path = str(tmp_path / "rtw")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 4).toDF("id").coalesce(1))
    sink.set_properties({"delta.enableRowTracking": "true"})
    # simulate an external writer's commit: pre-assigned range + its
    # own watermark, committed while rt is already enabled
    sink._commit(
        [
            {
                "add": {
                    "path": "ext.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": _json.dumps({"numRecords": 10}),
                    "baseRowId": 100,
                }
            },
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": _json.dumps(
                        {"rowIdHighWaterMark": 109}
                    ),
                    "removed": False,
                }
            },
        ],
        operation="WRITE",
    )
    dm = _json.loads(DL.latest_domain_metadata(path)["delta.rowTracking"])
    assert dm["rowIdHighWaterMark"] == 109  # caller watermark survived
    # fresh sink (no stale memo): next append stamps PAST the range
    sink2 = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink2.append(spark.range(20, 22).toDF("id").coalesce(1))
    files = {
        f["path"]: f for f in DL.snapshot_files(spark, path)
    }
    new = [
        f
        for p, f in files.items()
        if p != "ext.parquet" and (f.get("baseRowId") or 0) > 4
    ]
    assert new and all(f["baseRowId"] >= 110 for f in new)


def test_row_ids_survive_v2_checkpoint(spark, tmp_path):
    """The v2 (manifest+sidecar) checkpoint must carry baseRowId AND
    the watermark domain — the classic-checkpoint guarantee, same
    shape (caught in round 6: the manifest filter dropped
    domainMetadata rows)."""
    path = str(tmp_path / "rtv2")
    sink = DeltaSink(
        spark, path, checkpoint_interval=10**6, checkpoint_format="v2"
    )
    sink.append(spark.range(0, 4).toDF("id").coalesce(1))
    sink.set_properties({"delta.enableRowTracking": "true"})
    sink.append(spark.range(10, 12).toDF("id").coalesce(1))
    before = _ids(spark, path)
    head = DL.list_commit_versions(path)[-1]
    sink._write_checkpoint(head)
    for v in DL.list_commit_versions(path):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    assert _ids(spark, path) == before
    assert json.loads(
        DL.latest_domain_metadata(path)["delta.rowTracking"]
    )["rowIdHighWaterMark"] == 5
    sink2 = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink2.append(spark.range(20, 22).toDF("id").coalesce(1))
    after = _ids(spark, path)
    assert sorted(rid for rid, _ in after.values()) == list(range(8))
