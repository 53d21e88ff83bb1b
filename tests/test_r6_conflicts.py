"""Round-6: concurrent-commit conflict RESOLUTION (retry + rebase).

Delta's logical conflict rules (delta-io PROTOCOL.md, the
OptimisticTransaction semantics delta-spark implements): a commit-race
loser re-reads the winner's commits, proves disjointness, rebases onto
the new head and retries — erroring only on true conflicts.  The
reference never faces this (single-writer checkpoint rename dance,
Storage/CheckpointGateway.cs:96-104); a Delta mirror sharing a table
with other writers hits it daily:

- append vs append on disjoint files: BOTH succeed;
- mirror append vs OPTIMIZE (``dataChange: false``): BOTH succeed,
  in either loss order — the race converges;
- a winner's benign metaData (property tweak, schema-identical
  bootstrap) rebases; a schema change / new CHECK constraint /
  partition change under a staged append conflicts;
- a reading transaction (DELETE: removes with ``dataChange: true``)
  conflicts with concurrently APPENDED data (write-skew rule);
- a winner advancing the same ``txn`` appId conflicts (idempotence
  watermark must not go backwards);
- a winner's protocol upgrade within the sink's enforced feature set
  rebases; one demanding unimplemented obligations conflicts.
"""

import json
import threading

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources import fs as FS
from mirror_lake_kusto_spark.sources.delta_sink import (
    CommitCoordinator,
    ConcurrentCommitConflict,
    DeltaSink,
    DeltaSink as _DS,
)

_EMPTY_SCHEMA = '{"type":"struct","fields":[]}'
_AB_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "a", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
)


def _add(path, data_change=True):
    return {
        "add": {
            "path": path,
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": data_change,
        }
    }


def _remove(path, data_change=True):
    return {
        "remove": {
            "path": path,
            "deletionTimestamp": 0,
            "dataChange": data_change,
            "partitionValues": {},
        }
    }


class _InjectOnce(CommitCoordinator):
    """Deterministic race: the FIRST create_commit loses — ``rival()``
    commits first, then we report FileExistsError so the loser walks
    the conflict-check + rebase path."""

    def __init__(self, rival):
        self.rival = rival
        self.raced = False

    def create_commit(self, fs, path, data):
        if not self.raced:
            self.raced = True
            self.rival()
            raise FileExistsError(path)
        fs.create_exclusive(path, data)


def _sink(spark, path, **kw):
    s = DeltaSink(spark, path, checkpoint_interval=10**6, **kw)
    s._pending_schema = _EMPTY_SCHEMA
    return s


def _mem(name):
    FS._MEMORY.clear()
    return f"memory://bucket/{name}"


# -- benign rebases --------------------------------------------------------


def test_append_loser_vs_optimize_winner_rebases(spark):
    """Mirror append loses the race to OPTIMIZE (adds+removes all
    dataChange=false on other files): the loser must rebase and land
    at the next version — no error."""
    path = _mem("app_vs_opt")
    a = _sink(spark, path)
    a._commit([_add("f0.parquet"), _add("f1.parquet")], operation="WRITE")

    def optimize_wins():
        a._commit(
            [
                _remove("f0.parquet", data_change=False),
                _remove("f1.parquet", data_change=False),
                _add("compact.parquet", data_change=False),
            ],
            operation="OPTIMIZE",
        )

    b = _sink(spark, path, commit_coordinator=_InjectOnce(optimize_wins))
    v = b._commit([_add("new.parquet")], operation="WRITE")
    assert v == 2
    files = {f["path"] for f in DL.snapshot_files(spark, path)}
    assert files == {"compact.parquet", "new.parquet"}


def test_optimize_loser_vs_append_winner_rebases(spark):
    """OPTIMIZE loses to a concurrent append: its removes are
    dataChange=false (it read no rows, only rewrote files), so the
    winner's new data does NOT conflict — rebase and commit."""
    path = _mem("opt_vs_app")
    a = _sink(spark, path)
    a._commit([_add("f0.parquet"), _add("f1.parquet")], operation="WRITE")

    def append_wins():
        a._commit([_add("new.parquet")], operation="WRITE")

    b = _sink(spark, path, commit_coordinator=_InjectOnce(append_wins))
    v = b._commit(
        [
            _remove("f0.parquet", data_change=False),
            _remove("f1.parquet", data_change=False),
            _add("compact.parquet", data_change=False),
        ],
        operation="OPTIMIZE",
    )
    assert v == 2
    files = {f["path"] for f in DL.snapshot_files(spark, path)}
    assert files == {"compact.parquet", "new.parquet"}


def test_append_loser_vs_property_tweak_rebases(spark):
    """A winner's metaData that only tweaks a table property (schema,
    partitioning, constraints unchanged) must NOT kill a staged
    append — the files still conform."""
    path = _mem("app_vs_props")
    a = _sink(spark, path)
    a._pending_schema = _AB_SCHEMA
    a._commit([_add("f0.parquet")], operation="WRITE")
    meta = DL.latest_metadata(spark, path)

    def props_win():
        a._commit(
            [{"metaData": {**meta, "configuration": {"foo": "bar"}}}],
            operation="SET TBLPROPERTIES",
        )

    b = _sink(spark, path, commit_coordinator=_InjectOnce(props_win))
    b._pending_schema = _AB_SCHEMA
    v = b._commit([_add("f1.parquet")], operation="WRITE")
    assert v == 2
    md = DL.latest_metadata(spark, path)
    assert md["configuration"]["foo"] == "bar"  # winner's state survived


def test_append_loser_vs_supported_protocol_upgrade_rebases(spark):
    path = _mem("app_vs_proto_ok")
    a = _sink(spark, path)
    a._commit([_add("f0.parquet")], operation="WRITE")

    def proto_wins():
        a._commit(
            [
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["appendOnly", "invariants",
                                           "changeDataFeed"],
                    }
                }
            ],
            operation="UPGRADE PROTOCOL",
        )

    b = _sink(spark, path, commit_coordinator=_InjectOnce(proto_wins))
    assert b._commit([_add("f1.parquet")], operation="WRITE") == 2


# -- true conflicts ---------------------------------------------------------


def test_delete_loser_vs_concurrent_append_raises(spark):
    """Write-skew rule: a DELETE computed from the old snapshot loses
    to an append — the new file may hold rows matching the predicate,
    so a blind re-submit would miss them."""
    path = _mem("del_vs_app")
    a = _sink(spark, path)
    a._commit([_add("f0.parquet")], operation="WRITE")

    def append_wins():
        a._commit([_add("late.parquet")], operation="WRITE")

    b = _sink(spark, path, commit_coordinator=_InjectOnce(append_wins))
    with pytest.raises(ConcurrentCommitConflict, match="deletes by predicate"):
        b._commit([_remove("f0.parquet")], operation="DELETE")


def test_append_loser_vs_schema_change_raises(spark):
    path = _mem("app_vs_schema")
    a = _sink(spark, path)
    a._pending_schema = _AB_SCHEMA
    a._commit([_add("f0.parquet")], operation="WRITE")
    meta = DL.latest_metadata(spark, path)
    widened = json.loads(_AB_SCHEMA)
    widened["fields"].append(
        {"name": "b", "type": "string", "nullable": True, "metadata": {}}
    )

    def schema_wins():
        a._commit(
            [{"metaData": {**meta, "schemaString": json.dumps(widened)}}],
            operation="ADD COLUMNS",
        )

    b = _sink(spark, path, commit_coordinator=_InjectOnce(schema_wins))
    b._pending_schema = _AB_SCHEMA
    with pytest.raises(ConcurrentCommitConflict, match="schema"):
        b._commit([_add("f1.parquet")], operation="WRITE")


def test_append_loser_vs_new_check_constraint_raises(spark):
    path = _mem("app_vs_constraint")
    a = _sink(spark, path)
    a._pending_schema = _AB_SCHEMA
    a._commit([_add("f0.parquet")], operation="WRITE")
    meta = DL.latest_metadata(spark, path)

    def constraint_wins():
        a._commit(
            [
                {
                    "metaData": {
                        **meta,
                        "configuration": {"delta.constraints.pos": "a > 0"},
                    }
                }
            ],
            operation="ADD CONSTRAINT",
        )

    b = _sink(spark, path, commit_coordinator=_InjectOnce(constraint_wins))
    b._pending_schema = _AB_SCHEMA
    with pytest.raises(ConcurrentCommitConflict, match="constraint"):
        b._commit([_add("f1.parquet")], operation="WRITE")


def test_txn_appid_collision_raises(spark):
    """The winner advanced MY appId's watermark — re-submitting my txn
    action would move it backwards and break exactly-once."""
    path = _mem("txn_collide")
    a = _sink(spark, path)
    a._commit([_add("f0.parquet")], operation="WRITE")

    def rival_txn_wins():
        a._commit(
            [
                {"txn": {"appId": "mirror-1", "version": 9}},
                _add("rival.parquet"),
            ],
            operation="WRITE",
        )

    b = _sink(spark, path, commit_coordinator=_InjectOnce(rival_txn_wins))
    with pytest.raises(ConcurrentCommitConflict, match="appId"):
        b._commit(
            [
                {"txn": {"appId": "mirror-1", "version": 8}},
                _add("mine.parquet"),
            ],
            operation="WRITE",
        )


def test_append_loser_vs_unsupported_protocol_raises(spark):
    path = _mem("app_vs_proto_bad")
    a = _sink(spark, path)
    a._commit([_add("f0.parquet")], operation="WRITE")

    def proto_wins():
        a._commit(
            [
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        # a writer obligation this sink genuinely
                        # does not implement
                        "writerFeatures": ["icebergCompatV2"],
                    }
                }
            ],
            operation="UPGRADE PROTOCOL",
        )

    b = _sink(spark, path, commit_coordinator=_InjectOnce(proto_wins))
    with pytest.raises(ConcurrentCommitConflict, match="protocol"):
        b._commit([_add("f1.parquet")], operation="WRITE")


# -- the race converges end-to-end -----------------------------------------


def test_threaded_append_vs_optimize_converges(spark, tmp_path):
    """Real data, real threads: appenders and a compactor hammer one
    table; every row appended is present exactly once at the end and
    the log is contiguous — the mirror-vs-OPTIMIZE race converges."""
    path = str(tmp_path / "converge")
    seed = DeltaSink(spark, path, checkpoint_interval=10**6)
    seed.append(spark.range(0, 10).withColumnRenamed("id", "a"))
    errors: list = []

    def appender():
        s = DeltaSink(spark, path, checkpoint_interval=10**6)
        try:
            for i in range(1, 4):
                s.append(
                    spark.range(10 * i, 10 * (i + 1)).withColumnRenamed(
                        "id", "a"
                    )
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def compactor():
        s = DeltaSink(spark, path, checkpoint_interval=10**6)
        for _ in range(3):
            try:
                s.optimize()
            except ConcurrentCommitConflict:
                # a rival removed/compacted the same inputs mid-flight:
                # re-plan from the new snapshot (the documented
                # caller contract for true conflicts)
                continue

    ts = [threading.Thread(target=appender) for _ in range(2)] + [
        threading.Thread(target=compactor)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    vs = DL.list_commit_versions(path)
    assert vs == list(range(len(vs)))
    got = sorted(
        r.a for r in DL.read_snapshot(spark, path).select("a").collect()
    )
    assert got == sorted(list(range(0, 10)) + list(range(10, 40)) * 2)


def test_variant_bootstrap_race_rebases(spark):
    """Code-review regression: the sink writes variantType protocols
    itself, so a rival's variantType upgrade must rebase — not
    hard-fail the race."""
    path = _mem("var_race")
    a = _sink(spark, path)
    a._commit([_add("f0.parquet")], operation="WRITE")

    def variant_proto_wins():
        a._commit(
            [
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["variantType"],
                        "writerFeatures": ["appendOnly", "invariants",
                                           "variantType"],
                    }
                }
            ],
            operation="UPGRADE PROTOCOL",
        )

    b = _sink(spark, path, commit_coordinator=_InjectOnce(variant_proto_wins))
    assert b._commit([_add("f1.parquet")], operation="WRITE") == 2
