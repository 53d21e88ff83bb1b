"""Round-8 VACUUM retention window + delta.checkpointPolicy property.

Delta's ``VACUUM ... RETAIN N HOURS``: an unreferenced file survives
until its tombstone (remove action deletionTimestamp; file mtime for
untracked garbage) leaves the window, so time travel within the window
and in-flight readers keep working.  ``delta.checkpointPolicy`` is the
table-property switch for v2 checkpoints (a foreign writer can flip a
table without every local writer changing constructor args).
"""

import json
import os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _data_parquets(path):
    out = []
    for dirpath, _dirs, names in os.walk(path):
        if "_delta_log" in dirpath:
            continue
        out += [n for n in names if n.endswith(".parquet")]
    return sorted(out)


def _build(spark, path):
    sink = DeltaSink(spark, path, checkpoint_interval=2)
    sink.append(spark.range(20).toDF("id"))
    sink.append(spark.range(20, 40).toDF("id"))
    sink.delete("id % 2 = 0")  # CoW rewrite strands the originals
    return sink


def test_retention_window_retains_tombstoned_files(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = _build(spark, path)
    before = _data_parquets(path)
    stats = sink.vacuum(retention_hours=168)
    assert stats["data_files"] == 0, "in-window tombstones must survive"
    assert _data_parquets(path) == before
    # time travel WITHIN the window still works: the pre-delete
    # snapshot's files are all on disk
    got = sorted(
        r.id for r in DL.read_snapshot(spark, path, upto=1).collect()
    )
    assert got == list(range(40))
    # ... and so does restore
    sink.restore(1)
    assert DL.read_snapshot(spark, path).count() == 40


def test_retention_keeps_tombstone_carrying_commits(spark, tmp_path):
    """A commit JSON below the checkpoint survives while it carries an
    in-window tombstone (it keeps the clock honest for the NEXT
    vacuum); tombstone-free commits below the checkpoint truncate as
    before, and the current snapshot is unaffected."""
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, checkpoint_interval=2)
    sink.append(spark.range(40).toDF("id"))      # v0: appends only
    sink.delete("id % 2 = 0")                    # v1: tombstones; ckpt@1
    sink.vacuum(retention_hours=168)
    versions = DL.list_commit_versions(path)
    assert 0 not in versions, "tombstone-free commit should truncate"
    assert 1 in versions, "in-window tombstone commit must survive"
    got = sorted(r.id for r in DL.read_snapshot(spark, path).collect())
    assert got == [i for i in range(40) if i % 2 == 1]


def test_zero_retention_is_the_historical_default(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = _build(spark, path)
    stats = sink.vacuum()  # None -> retain nothing
    assert stats["data_files"] > 0
    assert stats["log_files"] > 0
    got = sorted(r.id for r in DL.read_snapshot(spark, path).collect())
    assert got == [i for i in range(40) if i % 2 == 1]
    with pytest.raises(ValueError):
        sink.restore(1)  # the window is gone


def test_expired_tombstones_do_collect(spark, tmp_path):
    """Backdating every tombstone past the window makes the same
    vacuum collect them — the clock, not the call order, decides."""
    path = str(tmp_path / "t")
    sink = _build(spark, path)
    log = os.path.join(path, "_delta_log")
    for v in DL.list_commit_versions(path):
        p = os.path.join(log, "%020d.json" % v)
        acts = [json.loads(l) for l in open(p) if l.strip()]
        changed = False
        for a in acts:
            if "remove" in a:
                a["remove"]["deletionTimestamp"] = 1_000  # 1970
                changed = True
        if changed:
            with open(p, "w") as f:
                f.writelines(json.dumps(a) + "\n" for a in acts)
        # file mtimes must also look old for the mtime fallback
    stats = sink.vacuum(retention_hours=168)
    assert stats["data_files"] > 0


def test_checkpoint_policy_property_switches_to_v2(spark, tmp_path):
    """delta.checkpointPolicy=v2 on a CLASSIC-constructed sink writes
    the manifest+sidecar layout at the next checkpoint."""
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, checkpoint_interval=2)
    sink.append(spark.range(5).toDF("id"))
    sink.set_properties({"delta.checkpointPolicy": "v2"})
    sink.append(spark.range(5, 10).toDF("id"))
    sink.append(spark.range(10, 15).toDF("id"))  # v3 -> checkpoint
    log = os.path.join(path, "_delta_log")
    assert os.path.isdir(os.path.join(log, "_sidecars"))
    manifests = [
        n
        for n in os.listdir(log)
        if ".checkpoint." in n and n.endswith(".parquet")
    ]
    assert manifests, "expected a uuid-named v2 manifest"
    proto = DL.latest_protocol(path)
    assert "v2Checkpoint" in (proto["readerFeatures"] or [])
    # and the table still reads (checkpoint + tail)
    sink.append(spark.range(15, 18).toDF("id"))
    got = sorted(r.id for r in DL.read_snapshot(spark, path).collect())
    assert got == list(range(18))
