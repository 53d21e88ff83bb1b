"""Round-10: streaming THROUGH mid-stream deletion vectors (the r9
VERDICT top ask — the one place a modern default-DV Delta writer still
stopped the engine).

Semantics (shared by batch ``delta_log.read_changes`` and the
``mlk_delta`` streaming source's readChangeFeed mode — round 10 made
them identical):

- a DV REWRITE commit (remove(P)+add(P,DV'), the delete_dv/update_dv/
  merge_dv shape) contributes the bitmap DELTA: rows in new∖old as
  ``delete`` change rows, rows in old∖new (a RESTORE shrinking the
  vector) as resurrecting ``insert`` rows;
- a file BORN with a DV (foreign default-DV writers) contributes its
  SURVIVORS as inserts;
- a remove of a DV'd file retracts only its LIVE rows;
- the PLAIN stream gains ``onDv='materialize'``: DV-born files stream
  their survivors, but a DV rewrite still refuses loudly (an
  append-only stream cannot retract) with a pointer at readChangeFeed.

Reference invariant preserved: one-shot ≡ two-shot (the
MirrorLakeKustoTest idiom, SURVEY §5) via stream restarts from the
checkpoint.
"""

import json
import os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources import dv as dvm
from mirror_lake_kusto_spark.sources import fs as FS
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from mirror_lake_kusto_spark.streaming.delta_source import DeltaLogDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    try:
        spark.dataSource.register(DeltaLogDataSource)
    except Exception:
        pass


def _drain(spark, path, ckpt, options=None):
    rows: list = []

    def collect_batch(bdf, _bid):
        rows.extend(bdf.collect())

    reader = spark.readStream.format("mlk_delta").option("path", path)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(collect_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def _dv_chain_table(spark, path):
    """10 rows, delete_dv twice on the same file (changed bitmap),
    append 4 more, then delete_dv them all (full-file remove)."""
    s = DeltaSink(spark, path)
    s.append(
        spark.range(10).selectExpr("id AS n", "concat('v', id) AS v").coalesce(1)
    )                                                   # v0
    s.delete_dv("n IN (1, 3)")                          # v1: DV {1,3}
    s.delete_dv("n = 5")                                # v2: DV {1,3,5}
    s.append(
        spark.range(10, 14)
        .selectExpr("id AS n", "concat('v', id) AS v")
        .coalesce(1)
    )                                                   # v3
    s.delete_dv("n >= 10")                              # v4: full remove
    return s


def _net(rows):
    """Surviving rows from a change stream: per full row value,
    inserts minus deletes."""
    from collections import Counter

    c: Counter = Counter()
    for r in rows:
        c[(r["n"], r["v"])] += 1 if r["_change_type"] == "insert" else -1
    return sorted(k for k, alive in c.items() if alive > 0)


# ------------------------------------------------------- batch feed


def test_batch_changes_dv_rewrite_is_bitmap_delta(spark, tmp_path):
    path = str(tmp_path / "t")
    _dv_chain_table(spark, path)
    ch = DL.read_changes(spark, path, 0)
    by_v = {}
    for r in ch.collect():
        by_v.setdefault(r["_commit_version"], []).append(
            (r["n"], r["_change_type"])
        )
    # v1 deletes exactly {1,3}; v2 exactly {5} — the OLD bitmap rows
    # must NOT re-delete (the wrong answer a naive reader gives)
    assert sorted(by_v[1]) == [(1, "delete"), (3, "delete")]
    assert sorted(by_v[2]) == [(5, "delete")]
    assert sorted(by_v[4]) == [(n, "delete") for n in (10, 11, 12, 13)]


def test_batch_changes_net_state_equals_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    _dv_chain_table(spark, path)
    rows = DL.read_changes(spark, path, 0).collect()
    snap = sorted(
        (r["n"], r["v"]) for r in DL.read_snapshot(spark, path).collect()
    )
    assert _net(rows) == snap


def test_batch_changes_remove_of_dvd_file_retracts_live_rows_only(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    s = DeltaSink(spark, path)
    s.append(spark.range(8).selectExpr("id AS n", "'x' AS v").coalesce(1))
    s.delete_dv("n = 2")                                # v1
    # v2: merged bitmap covers every row -> delete_dv emits a PLAIN
    # remove of the DV'd file (its full-delete path)
    s.delete_dv("n >= 0")
    by_v = {}
    for r in DL.read_changes(spark, path, 0).collect():
        by_v.setdefault(r["_commit_version"], []).append(
            (r["n"], r["_change_type"])
        )
    # the v2 retraction must exclude n=2 (already deleted at v1)
    assert sorted(by_v[2]) == [
        (n, "delete") for n in range(8) if n != 2
    ]
    assert _net(DL.read_changes(spark, path, 0).collect()) == []


def test_batch_changes_shrinking_vector_resurrects(spark, tmp_path):
    """A commit replacing a DV with a SMALLER one (RESTORE shape)
    emits the resurrected rows as inserts."""
    path = str(tmp_path / "t")
    s = DeltaSink(spark, path)
    s.append(spark.range(6).selectExpr("id AS n", "'x' AS v").coalesce(1))
    s.delete_dv("n IN (1, 4)")                          # v1: DV {1,4}
    f = [x for x in DL.snapshot_files(spark, path)][0]
    shrunk = dvm.inline_descriptor([4])                 # v2: DV {4}
    acts = [
        {
            "remove": {
                "path": f["path"],
                "deletionTimestamp": 0,
                "dataChange": True,
                "partitionValues": {},
            }
        },
        {
            "add": {
                "path": f["path"],
                "partitionValues": {},
                "size": f["size"],
                "modificationTime": 0,
                "dataChange": True,
                "stats": f["stats"],
                "deletionVector": shrunk,
            }
        },
    ]
    FS.get_fs(path).write_text(
        DL._commit_file(path, 2),
        "\n".join(json.dumps(a) for a in acts) + "\n",
    )
    by_v = {}
    for r in DL.read_changes(spark, path, 0).collect():
        by_v.setdefault(r["_commit_version"], []).append(
            (r["n"], r["_change_type"])
        )
    assert sorted(by_v[2]) == [(1, "insert")]
    snap = sorted(r["n"] for r in DL.read_snapshot(spark, path).collect())
    assert snap == [0, 1, 2, 3, 5]


# --------------------------------------------------- streaming feed


def test_cdf_stream_equals_batch_across_delete_dv(spark, tmp_path):
    path = str(tmp_path / "t")
    _dv_chain_table(spark, path)
    rows = _drain(
        spark, path, str(tmp_path / "ck"), {"readChangeFeed": "true"}
    )
    stream = sorted(
        (r["n"], r["v"], r["_change_type"], r["_commit_version"])
        for r in rows
    )
    batch = sorted(
        (r["n"], r["v"], r["_change_type"], r["_commit_version"])
        for r in DL.read_changes(spark, path, 0).collect()
    )
    assert stream == batch
    assert _net(rows) == sorted(
        (r["n"], r["v"]) for r in DL.read_snapshot(spark, path).collect()
    )


def test_cdf_stream_one_shot_equals_two_shot(spark, tmp_path):
    """Restart mid-history (the reference's one-shot≡two-shot idiom):
    drain after the first delete_dv, commit more (including another
    delete_dv), drain again from the SAME checkpoint — the union must
    equal a fresh one-shot drain."""
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")
    s = DeltaSink(spark, path)
    s.append(
        spark.range(10).selectExpr("id AS n", "concat('v', id) AS v").coalesce(1)
    )
    s.delete_dv("n IN (1, 3)")
    first = _drain(spark, path, ckpt, {"readChangeFeed": "true"})
    s.append(
        spark.range(10, 14)
        .selectExpr("id AS n", "concat('v', id) AS v")
        .coalesce(1)
    )
    s.delete_dv("n = 5 OR n = 11")
    second = _drain(spark, path, ckpt, {"readChangeFeed": "true"})
    one_shot = _drain(
        spark, path, str(tmp_path / "ck_fresh"), {"readChangeFeed": "true"}
    )

    def key(rows):
        return sorted(
            (r["n"], r["v"], r["_change_type"], r["_commit_version"])
            for r in rows
        )

    assert key(first + second) == key(one_shot)
    assert _net(one_shot) == sorted(
        (r["n"], r["v"]) for r in DL.read_snapshot(spark, path).collect()
    )


def test_plain_stream_materialize_streams_dv_born_file(spark, tmp_path):
    """onDv='materialize': a file whose add carries a DV from birth
    streams its SURVIVING rows (bitmap applied at scan)."""
    path = str(tmp_path / "t")
    s = DeltaSink(spark, path)
    s.append(spark.range(10).selectExpr("id AS n", "'x' AS v").coalesce(1))
    f = DL.snapshot_files(spark, path)[0]
    acts = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "add": {
                "path": f["path"],
                "partitionValues": {},
                "size": f["size"],
                "modificationTime": 0,
                "dataChange": True,
                "stats": f["stats"],
                "deletionVector": dvm.inline_descriptor([0, 7]),
            }
        },
    ]
    FS.get_fs(path).write_text(
        DL._commit_file(path, 1),
        "\n".join(json.dumps(a) for a in acts) + "\n",
    )
    rows = _drain(
        spark,
        path,
        str(tmp_path / "ck"),
        {"onDv": "materialize", "startingVersion": "1"},
    )
    assert sorted(r["n"] for r in rows) == [n for n in range(10) if n not in (0, 7)]


def test_plain_stream_materialize_refuses_restage(spark, tmp_path):
    """onDv='materialize' on the PLAIN stream still refuses a DV
    rewrite — an append-only stream cannot retract — with a pointer
    at readChangeFeed (the documented limit)."""
    path = str(tmp_path / "t")
    s = DeltaSink(spark, path)
    s.append(spark.range(6).toDF("n").coalesce(1))
    s.delete_dv("n = 1")
    q = (
        spark.readStream.format("mlk_delta")
        .option("path", path)
        .option("onDv", "materialize")
        .load()
        .writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    with pytest.raises(Exception, match="re-stages files|readChangeFeed"):
        q.awaitTermination()


def test_bogus_on_dv_value_fails_at_load(spark, tmp_path):
    path = str(tmp_path / "t")
    DeltaSink(spark, path).append(spark.range(3).toDF("n"))
    with pytest.raises(Exception, match="onDv must be"):
        (
            spark.readStream.format("mlk_delta")
            .option("path", path)
            .option("onDv", "bogus")
            .load()
        )


def test_cdf_stream_update_dv_mid_stream(spark, tmp_path):
    """update_dv mid-stream: the DV rewrite streams the preimage rows
    as deletes and the rewritten rows arrive as inserts from the new
    file — net state equals the snapshot."""
    path = str(tmp_path / "t")
    s = DeltaSink(spark, path)
    s.append(
        spark.range(8).selectExpr("id AS n", "concat('v', id) AS v").coalesce(1)
    )
    s.update_dv("n = 4", {"v": "'patched'"})
    rows = _drain(
        spark, path, str(tmp_path / "ck"), {"readChangeFeed": "true"}
    )
    assert _net(rows) == sorted(
        (r["n"], r["v"]) for r in DL.read_snapshot(spark, path).collect()
    )
    assert ("patched" in {r["v"] for r in rows})


def test_restore_in_place_resurrects_via_prior_bitmap(spark, tmp_path):
    """Round-10 review gap: a rewrite whose NEW add carries NO vector
    (RESTORE-in-place: all deletions undone, remove(P, no desc) +
    add(P, no DV)) must emit the previously-dead rows as net inserts —
    the remove side retracts only the rows that were LIVE under the
    prior bitmap, so resurrected rows net to +1, not 0."""
    path = str(tmp_path / "t")
    s = DeltaSink(spark, path)
    s.append(spark.range(6).selectExpr("id AS n", "'x' AS v").coalesce(1))
    s.delete_dv("n IN (1, 4)")                          # v1: DV {1,4}
    f = [x for x in DL.snapshot_files(spark, path)][0]
    acts = [
        {
            "remove": {
                "path": f["path"],
                "deletionTimestamp": 0,
                "dataChange": True,
                "partitionValues": {},
            }
        },
        {
            "add": {
                "path": f["path"],
                "partitionValues": {},
                "size": f["size"],
                "modificationTime": 0,
                "dataChange": True,
                "stats": f["stats"],
                # NO deletionVector: every row live again
            }
        },
    ]
    FS.get_fs(path).write_text(
        DL._commit_file(path, 2),
        "\n".join(json.dumps(a) for a in acts) + "\n",
    )
    snap = sorted(r["n"] for r in DL.read_snapshot(spark, path).collect())
    assert snap == [0, 1, 2, 3, 4, 5]                   # restored
    # batch feed nets to the snapshot
    rows = DL.read_changes(spark, path, 0).collect()
    assert [n for n, _v in _net(rows)] == snap
    # the commit is a shrink-to-empty delta: EXACTLY the resurrected
    # rows stream, nothing retracts and nothing re-inserts live rows
    v2 = sorted(
        (r["n"], r["_change_type"])
        for r in rows
        if r["_commit_version"] == 2
    )
    assert v2 == [(1, "insert"), (4, "insert")]
    # stream agrees (shared classifier)
    srows = _drain(
        spark, path, str(tmp_path / "ck"), {"readChangeFeed": "true"}
    )
    assert sorted(
        (r["n"], r["_change_type"], r["_commit_version"]) for r in srows
    ) == sorted(
        (r["n"], r["_change_type"], r["_commit_version"]) for r in rows
    )


def test_restore_across_delete_dv_feeds_resurrection(spark, tmp_path):
    """A REAL writer producing the shrink shape: restore() to the
    pre-delete version re-adds the file with its older (absent)
    vector — the change feed must resurrect the deleted rows and net
    to the restored snapshot, batch and stream agreeing."""
    path = str(tmp_path / "t")
    s = DeltaSink(spark, path)
    s.append(spark.range(8).selectExpr("id AS n", "'x' AS v").coalesce(1))
    s.delete_dv("n IN (2, 5)")                          # v1
    s.restore(0)                                        # v2: undo
    snap = sorted(r["n"] for r in DL.read_snapshot(spark, path).collect())
    assert snap == list(range(8))
    rows = DL.read_changes(spark, path, 0).collect()
    assert [n for n, _v in _net(rows)] == snap
    v2 = sorted(
        (r["n"], r["_change_type"])
        for r in rows
        if r["_commit_version"] == 2
    )
    assert v2 == [(2, "insert"), (5, "insert")]         # pure resurrection
    srows = _drain(
        spark, path, str(tmp_path / "ck"), {"readChangeFeed": "true"}
    )
    assert sorted(
        (r["n"], r["_change_type"], r["_commit_version"]) for r in srows
    ) == sorted(
        (r["n"], r["_change_type"], r["_commit_version"]) for r in rows
    )
