"""Streaming upsert sink (streaming/upsert.py): exactly-once CDC apply
— idempotent replays, within-batch latest-per-key, tombstone deletes,
and an end-to-end change-feed -> keyed-table pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from mirror_lake_kusto_spark.streaming.upsert import (
    foreach_batch_upsert,
    upsert_stream,
)


def _state(spark, sink):
    return {
        r["k"]: r["v"]
        for r in DL.read_snapshot(spark, sink.path).collect()
    }


def _df(spark, rows, schema="k long, v string, ts long, is_delete boolean"):
    return spark.createDataFrame(rows, schema)


def test_upsert_insert_update_delete(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t1"))
    sink.append(_df(spark, [], "k long, v string").select("k", "v"))
    apply = foreach_batch_upsert(
        sink, ["k"], "app1", version_col="ts", delete_col="is_delete"
    )
    apply(
        _df(spark, [(1, "a", 10, False), (2, "b", 10, False)])
        .drop("is_delete").withColumn("is_delete", F.lit(False)),
        0,
    )
    assert _state(spark, sink) == {1: "a", 2: "b"}
    # batch 1: update k=1, tombstone k=2, insert k=3
    apply(
        _df(
            spark,
            [(1, "a2", 20, False), (2, "b", 20, True), (3, "c", 20, False)],
        ),
        1,
    )
    assert _state(spark, sink) == {1: "a2", 3: "c"}


def test_upsert_replay_is_noop(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t2"))
    sink.append(_df(spark, [(1, "a", 1, False)]).select("k", "v"))
    apply = foreach_batch_upsert(
        sink, ["k"], "app2", version_col="ts", delete_col="is_delete"
    )
    apply(_df(spark, [(1, "a2", 2, False), (4, "d", 2, False)]), 0)
    v_after = DL.list_commit_versions(sink.path)[-1]
    # crash replay: same batch id arrives again — must not commit
    apply(_df(spark, [(1, "a2", 2, False), (4, "d", 2, False)]), 0)
    assert DL.list_commit_versions(sink.path)[-1] == v_after
    assert _state(spark, sink) == {1: "a2", 4: "d"}


def test_upsert_latest_per_key_within_batch(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t3"))
    sink.append(_df(spark, [], "k long, v string").select("k", "v"))
    apply = foreach_batch_upsert(
        sink, ["k"], "app3", version_col="ts", delete_col="is_delete"
    )
    apply(
        _df(
            spark,
            [(7, "old", 1, False), (7, "mid", 5, False), (7, "new", 9, False)],
        ),
        0,
    )
    assert _state(spark, sink) == {7: "new"}


def test_upsert_stream_end_to_end_change_feed(spark, tmp_path):
    """Author a source table (inserts + a row-level delete), stream its
    change feed with availableNow, and apply it as a keyed upsert —
    the target converges to the source's live rows."""
    src = DeltaSink(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a", 1, False), (2, "b", 1, False)]).select("k", "v"))
    src.append(_df(spark, [(3, "c", 2, False)]).select("k", "v"))
    src.delete("k = 2")
    src.append(_df(spark, [(1, "a2", 3, False)]).select("k", "v"))

    tgt = DeltaSink(spark, str(tmp_path / "tgt"))
    tgt.append(_df(spark, [], "k long, v string").select("k", "v"))

    from mirror_lake_kusto_spark.streaming.delta_source import (
        DeltaLogDataSource,
    )

    spark.dataSource.register(DeltaLogDataSource)
    stream = (
        spark.readStream.format("mlk_delta")
        .option("path", src.path)
        .option("readChangeFeed", "true")
        .load()
        .withColumn("_is_delete", F.col("_change_type") == "delete")
        .select("k", "v", "_commit_version", "_is_delete")
    )
    q = upsert_stream(
        stream,
        tgt,
        key_cols=["k"],
        app_id="e2e",
        checkpoint_dir=str(tmp_path / "ckpt"),
        version_col="_commit_version",
        delete_col="_is_delete",
    )
    q.awaitTermination(120)
    # the merge source carries _commit_version; target schema evolves
    # to include it — compare on the key/value columns
    got = {
        r["k"]: r["v"] for r in DL.read_snapshot(spark, tgt.path).collect()
    }
    assert got == {1: "a2", 3: "c"}


def test_upsert_empty_target_records_txn(spark, tmp_path):
    """First batch into an EMPTY table goes through the append path —
    the txn ledger entry must still ride it, or a crash replay would
    double-apply batch 0."""
    sink = DeltaSink(spark, str(tmp_path / "t5"))
    apply = foreach_batch_upsert(
        sink, ["k"], "app5", version_col="ts", delete_col="is_delete",
        target_cols=["k", "v"],
    )
    apply(_df(spark, [(1, "a", 1, False)]), 0)
    assert DL.last_txn_version(spark, sink.path, "app5") == 0
    apply(_df(spark, [(1, "XX", 9, False)]), 0)  # replay — must skip
    assert _state(spark, sink) == {1: "a"}
    # and the empty-target path did NOT bake bookkeeping columns in
    cols = set(DL.read_snapshot(spark, sink.path).columns)
    assert cols == {"k", "v"}


def test_upsert_no_version_col_conflicts_raise(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t6"))
    sink.append(_df(spark, [], "k long, v string").select("k", "v"))
    apply = foreach_batch_upsert(sink, ["k"], "app6")
    # exact duplicates collapse silently
    apply(
        spark.createDataFrame([(1, "a"), (1, "a")], "k long, v string"), 0
    )
    assert _state(spark, sink) == {1: "a"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="version_col"):
        apply(
            spark.createDataFrame(
                [(2, "x"), (2, "y")], "k long, v string"
            ),
            1,
        )


def test_upsert_tombstones_single_atomic_commit(spark, tmp_path):
    """Tombstone deletes ride the SAME merge commit as the upserts —
    one commit per batch (not delete+merge), and the delete-key frame
    is never collected to the driver (no driver-built predicate)."""
    sink = DeltaSink(spark, str(tmp_path / "atomic"))
    sink.append(
        _df(spark, [(1, "a", 1, False), (2, "b", 1, False)]).select("k", "v")
    )
    v0 = max(DL.list_commit_versions(sink.path))
    apply = foreach_batch_upsert(
        sink, ["k"], "app-atomic", version_col="ts", delete_col="is_delete",
        target_cols=["k", "v"],
    )
    apply(_df(spark, [(1, None, 2, True), (3, "c", 2, False)]), 0)
    v1 = max(DL.list_commit_versions(sink.path))
    assert v1 == v0 + 1  # exactly ONE commit applied both ops
    assert _state(spark, sink) == {2: "b", 3: "c"}


def test_merge_delete_keys_only(spark, tmp_path):
    """merge() with only delete_keys removes matching rows and still
    commits the txn action (idempotence for delete-only batches)."""
    sink = DeltaSink(spark, str(tmp_path / "delonly"))
    sink.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    empty = spark.createDataFrame([], "k long, v string")
    dels = spark.createDataFrame([(1,)], "k long")
    sink.merge(empty, ["k"], txn=("app-d", 5), delete_keys=dels)
    assert _state(spark, sink) == {2: "b"}
    assert DL.last_txn_version(spark, sink.path, "app-d") == 5


def test_merge_delete_keys_overlap_raises(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "overlap"))
    sink.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    src = spark.createDataFrame([(1, "x")], "k long, v string")
    dels = spark.createDataFrame([(1,)], "k long")
    import pytest

    with pytest.raises(ValueError, match="both source and delete_keys"):
        sink.merge(src, ["k"], delete_keys=dels)
