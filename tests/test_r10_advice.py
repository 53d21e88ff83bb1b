"""Round-10 ADVICE pin tests (round-9 review findings).

1. StagedCommitCoordinator must REJECT read-only (non-arbitrating)
   clients at construction: a failed client.commit() would otherwise
   strand a sole staged candidate that FileSystemCommitCoordinator's
   ratified-by-uniqueness inference then serves as ratified — a FAILED
   commit becoming readable (atomicity violation).
2. A race-losing staged candidate is REMOVED on CommitConflict, and a
   staged candidate whose ratification call crashed is removed too
   (fail loud, never torn).
3. _read_commit survives a concurrent _TAIL_CACHE eviction: a ratified
   tail version whose plain spelling does not exist re-resolves
   through the coordinator instead of failing FileNotFoundError.
4. _COORD_NAME_CACHE keys on the last-checkpoint version too, so a
   fully vacuumed coordinated table (backfilled head pinned at -1)
   picks up a coordinator name declared by a NEWER checkpoint.
5. The float->double widening path verifies FRACTIONAL values exactly
   (the hashed driver contract is floor-integral by design, so this
   pytest is the fractional coverage — queries/mirror.py:905).
"""

import os

import pytest

from mirror_lake_kusto_spark.sources import coordinator as COORD
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import (
    DeltaSink,
    StagedCommitCoordinator,
)

# ---------------------------------------------------------------- 1+2


def test_staged_writer_rejects_read_only_client(tmp_path):
    name = f"ro-{tmp_path.name}"
    COORD.register_commit_coordinator(name, COORD.FileSystemCommitCoordinator())
    try:
        with pytest.raises(ValueError, match="read-only"):
            StagedCommitCoordinator(name)
    finally:
        COORD.unregister_commit_coordinator(name)


def test_staged_writer_accepts_arbitrating_client(tmp_path):
    name = f"rw-{tmp_path.name}"
    COORD.register_commit_coordinator(name, COORD.TrackingCommitCoordinator())
    try:
        StagedCommitCoordinator(name)  # must not raise
    finally:
        COORD.unregister_commit_coordinator(name)


class _FS:
    """Minimal fs double for exercising create_commit standalone."""

    def makedirs(self, d):
        os.makedirs(d, exist_ok=True)

    def write_text(self, p, data):
        with open(p, "w") as f:
            f.write(data)

    def create_exclusive(self, p, data):
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(data)

    def remove(self, p):
        os.remove(p)

    def exists(self, p):
        return os.path.exists(p)


def _staged_candidates(table):
    d = os.path.join(table, "_delta_log", "_commits")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_conflict_loser_staged_file_is_removed(tmp_path):
    name = f"cf-{tmp_path.name}"
    tracker = COORD.TrackingCommitCoordinator()
    COORD.register_commit_coordinator(name, tracker)
    try:
        table = str(tmp_path / "t")
        log = os.path.join(table, "_delta_log")
        os.makedirs(log)
        # someone else already won version 1
        tracker.ratify(table, 1, "_commits/x.json")
        w = StagedCommitCoordinator(name)
        with pytest.raises(FileExistsError):
            w.create_commit(_FS(), os.path.join(log, f"{1:020d}.json"), "{}")
        assert _staged_candidates(table) == []  # loser cleaned up
    finally:
        COORD.unregister_commit_coordinator(name)


def test_crashed_ratification_staged_file_is_removed(tmp_path):
    class _Crashing(COORD.TrackingCommitCoordinator):
        def commit(self, table_path, version, rel_path):
            raise RuntimeError("coordinator unreachable")

    name = f"cr-{tmp_path.name}"
    COORD.register_commit_coordinator(name, _Crashing())
    try:
        table = str(tmp_path / "t")
        log = os.path.join(table, "_delta_log")
        os.makedirs(log)
        w = StagedCommitCoordinator(name)
        with pytest.raises(RuntimeError, match="unreachable"):
            w.create_commit(_FS(), os.path.join(log, f"{1:020d}.json"), "{}")
        # the unratified candidate must NOT linger: a sole staged file
        # would read as ratified-by-uniqueness through the filesystem
        # coordinator double
        assert _staged_candidates(table) == []
    finally:
        COORD.unregister_commit_coordinator(name)


# ------------------------------------------------------------------ 3


def test_read_commit_survives_tail_cache_eviction(spark, tmp_path):
    name = f"ev-{tmp_path.name}"
    COORD.register_commit_coordinator(name, COORD.TrackingCommitCoordinator())
    try:
        table = str(tmp_path / "t")
        sink = DeltaSink(spark, table, coordinated_commits=name)
        sink.append(spark.createDataFrame([(1, "a")], "id long, name string"))
        sink.append(spark.createDataFrame([(2, "b")], "id long, name string"))
        # v1 exists ONLY in its staged spelling
        assert not os.path.exists(
            os.path.join(table, "_delta_log", f"{1:020d}.json")
        )
        assert DL.list_commit_versions(table) == [0, 1]
        # simulate a CONCURRENT reader of another coordinated table
        # clearing the process-global cache between enumeration and read
        DL._TAIL_CACHE.clear()
        acts = DL._read_commit(table, 1)  # re-resolves, not FileNotFound
        assert any(a.get("add") for a in acts)
    finally:
        COORD.unregister_commit_coordinator(name)


# ------------------------------------------------------------------ 4


def _vacuum_plain_jsons(table):
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and len(f) == 25 and f[:20].isdigit():
            os.remove(os.path.join(log, f))


def test_coord_name_cache_sees_newer_checkpoint_declaration(spark, tmp_path):
    table = str(tmp_path / "t")
    name = f"ck-{tmp_path.name}"
    sink = DeltaSink(spark, table)
    sink.append(spark.createDataFrame([(1, "a")], "id long, name string"))
    v = sink.set_properties(
        {"delta.coordinatedCommits.commitCoordinator-preview": name}
    )
    sink._write_checkpoint(v)
    _vacuum_plain_jsons(table)
    # prime the cache at this (head=-1, ckpt=v) state
    assert DL._declared_coordinator(table) == name
    # a NEWER checkpoint re-declares a different coordinator: the
    # cache key must include the checkpoint version or this stays stale
    v2 = sink.set_properties(
        {"delta.coordinatedCommits.commitCoordinator-preview": name + "-2"}
    )
    sink._write_checkpoint(v2)
    _vacuum_plain_jsons(table)
    assert DL._declared_coordinator(table) == name + "-2"


# ------------------------------------------------------------------ 5


def test_float_to_double_widen_preserves_fractions(spark, tmp_path):
    """Mirror follow across a float->double widen with FRACTIONAL
    values: every float32-representable fraction must survive the
    promotion bit-exactly (compared as DECIMAL strings, no hashing)."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline

    src_path = str(tmp_path / "src")
    src = DeltaSink(spark, src_path)
    # .25 steps are exact in float32 AND in decimal(12,3)
    src.append(
        spark.sql(
            "SELECT id, CAST(id + (id % 4) * 0.25 AS float) AS bal "
            "FROM range(1, 51) AS t(id)"
        )
    )
    pipe = MirrorPipeline(
        spark,
        src_path,
        str(tmp_path / "dst"),
        str(tmp_path / "state"),
        table_name="frac",
        on_schema_change="widen",
    )
    pipe.run_until_idle()
    src.widen_column("bal", "double")
    src.append(
        spark.sql(
            "SELECT id, CAST(id + 0.125 AS double) AS bal "
            "FROM range(51, 101) AS t(id)"
        )
    )
    pipe.run_until_idle()
    got = {
        r.id: str(r.bal)
        for r in pipe.mirror_df()
        .selectExpr("id", "CAST(bal AS decimal(12,3)) AS bal")
        .collect()
    }
    want = {
        r.id: str(r.bal)
        for r in DL.read_snapshot(spark, src_path)
        .selectExpr("id", "CAST(bal AS decimal(12,3)) AS bal")
        .collect()
    }
    assert got == want and len(got) == 100
    # spot-check actual fractional content (not all integral)
    assert want[2].endswith(".500") and want[51].endswith(".125")


def test_ratified_then_crashed_call_keeps_the_commit(spark, tmp_path):
    """Round-10 review: if client.commit durably RECORDS the version
    and then the call fails (timeout after the write), the staged file
    is the commit's only copy — it must survive and the write must
    count as succeeded, not be discarded (which would permanently lose
    a ratified commit)."""

    class _RecordsThenRaises(COORD.TrackingCommitCoordinator):
        def commit(self, table_path, version, rel_path):
            super().commit(table_path, version, rel_path)  # recorded!
            raise RuntimeError("timeout after the record")

    name = f"rr-{tmp_path.name}"
    tracker = _RecordsThenRaises()
    COORD.register_commit_coordinator(name, tracker)
    try:
        table = str(tmp_path / "t")
        sink = DeltaSink(spark, table, coordinated_commits=name)
        sink.append(spark.createDataFrame([(1, "a")], "id long, v string"))
        # the staged v1 write's ratification call "crashes" AFTER
        # recording: the append must succeed end-to-end
        sink.append(spark.createDataFrame([(2, "b")], "id long, v string"))
        assert len(_staged_candidates(table)) == 1  # kept, not discarded
        got = sorted(
            r["id"]
            for r in DL.read_snapshot(spark, table).collect()
        )
        assert got == [1, 2]
    finally:
        COORD.unregister_commit_coordinator(name)


def test_probe_failure_surfaces_original_commit_error(spark, tmp_path):
    """If the post-crash ratification probe ALSO fails, the caller
    must see the ORIGINAL commit error (alerting keys on it), and the
    staged file must survive (it may be the ratified copy)."""

    class _BothFail(COORD.TrackingCommitCoordinator):
        def commit(self, table_path, version, rel_path):
            raise TimeoutError("commit timed out")

        def get_commits(self, table_path, start_version):
            raise ConnectionError("probe also failed")

    name = f"bf-{tmp_path.name}"
    COORD.register_commit_coordinator(name, _BothFail())
    try:
        table = str(tmp_path / "t")
        log = os.path.join(table, "_delta_log")
        os.makedirs(log)
        w = StagedCommitCoordinator(name)
        with pytest.raises(TimeoutError, match="commit timed out"):
            w.create_commit(_FS(), os.path.join(log, f"{1:020d}.json"), "{}")
        assert len(_staged_candidates(table)) == 1  # kept: may be ratified
    finally:
        COORD.unregister_commit_coordinator(name)


def test_adopted_table_gains_catalog_managed_feature(spark, tmp_path):
    """An EXISTING plain table adopted with catalog_managed=True must
    declare the catalogManaged reader feature with its FIRST staged
    commit — otherwise unbound filesystem readers silently serve the
    stale published prefix instead of failing closed."""
    table = str(tmp_path / "t")
    plain = DeltaSink(spark, table)
    plain.append(spark.range(3).toDF("n"))      # v0 published, no feature
    name = f"ad-{tmp_path.name}"
    COORD.register_commit_coordinator(name, COORD.TrackingCommitCoordinator())
    COORD.register_catalog_table(table, name)
    try:
        sink = DeltaSink(spark, table, catalog_managed=True)
        sink.append(spark.range(3, 6).toDF("n"))  # v1 staged + upgrade
        proto = DL.latest_protocol(table)
        assert "catalogManaged" in (proto.get("readerFeatures") or [])
        got = sorted(r["n"] for r in DL.read_snapshot(spark, table).collect())
        assert got == [0, 1, 2, 3, 4, 5]
    finally:
        COORD.unregister_catalog_table(table)
        COORD.unregister_commit_coordinator(name)
    # unbound: the staged tail is now VISIBLY gated
    with pytest.raises(Exception, match="STALE|catalogManaged"):
        DL.read_snapshot(spark, table).collect()


def test_classifier_charges_remove_size(spark, tmp_path):
    """Byte-based admission control must charge a removed file's size
    (the file is re-read to stream its delete rows)."""
    acts = [
        {
            "remove": {
                "path": "f.parquet",
                "dataChange": True,
                "partitionValues": {},
                "size": 12345,
            }
        }
    ]
    out = DL.classify_mor_commit(str(tmp_path), acts, 1, False)
    assert out == [
        {
            "path": "f.parquet",
            "pv": {},
            "size": 12345,
            "kind": "delete",
        }
    ]


def test_dv_possible_thunk_scans_protocol_once(spark, tmp_path):
    """The streaming reader's protocol check runs at most ONE
    latest_protocol scan per reader lifetime: False is sticky until a
    protocol action in a later commit's acts flips it (a delete-heavy
    CDF replay was O(commits^2) before)."""
    from mirror_lake_kusto_spark.streaming.delta_source import (
        DeltaLogStreamReader,
    )

    table = str(tmp_path / "t")
    DeltaSink(spark, table).append(spark.range(3).toDF("n"))
    reader = DeltaLogStreamReader(
        table, spark.range(1).schema, False, read_change_feed=True
    )
    calls = {"n": 0}
    real = DL.latest_protocol

    def counting(path, upto=None):
        calls["n"] += 1
        return real(path, upto)

    import mirror_lake_kusto_spark.sources.delta_log as dlmod

    dlmod.latest_protocol = counting
    try:
        for v in range(5):
            thunk = reader._dv_possible([])
            assert thunk() is False
        assert calls["n"] == 1
        # a protocol action in a later commit flips it WITHOUT a scan
        reader._dv_possible(
            [{"protocol": {"readerFeatures": ["deletionVectors"]}}]
        )
        assert reader._dv_possible([])() is True
        assert calls["n"] == 1
    finally:
        dlmod.latest_protocol = real
