"""Round-9 coordinated-commits WRITE path: DeltaSink stages commits in
``_delta_log/_commits`` and a registered coordinator client ratifies
them — arbitration without any filesystem conditional-create, the
raw-S3 shape.  Version 0 bootstraps plain (spec: commit 0 is always
backfilled); ``backfill_commits`` publishes the ratified tail.
"""

import glob
import os

import pytest

from mirror_lake_kusto_spark.sources import coordinator as COORD
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


@pytest.fixture
def tracker():
    t = COORD.TrackingCommitCoordinator()
    COORD.register_commit_coordinator("t9tracker", t)
    yield t
    COORD.unregister_commit_coordinator("t9tracker")


def _plain(path):
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(path, "_delta_log", "*.json"))
    )


def test_staged_writes_read_through_client(spark, tmp_path, tracker):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, coordinated_commits="t9tracker")
    sink.append(spark.range(5).toDF("id"))      # v0: plain bootstrap
    sink.append(spark.range(5, 9).toDF("id"))   # v1: staged
    sink.append(spark.range(9, 12).toDF("id"))  # v2: staged
    assert _plain(path) == ["%020d.json" % 0]
    assert DL.list_commit_versions(path) == [0, 1, 2]
    assert sorted(
        r.id for r in DL.read_snapshot(spark, path).collect()
    ) == list(range(12))
    # the bootstrap metaData declares the coordinator and the protocol
    # carries the writer feature
    meta = DL.latest_metadata(spark, path)
    assert (
        meta["configuration"][
            "delta.coordinatedCommits.commitCoordinator-preview"
        ]
        == "t9tracker"
    )
    proto = DL.latest_protocol(path)
    assert "coordinatedCommits" in proto["writerFeatures"]


def test_ratification_conflict_rebases_and_retries(spark, tmp_path, tracker):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, coordinated_commits="t9tracker")
    sink.append(spark.range(3).toDF("id"))
    # a rival writer ratifies the next version out from under us (an
    # empty-actions commit is a valid no-op for replay)
    rel = "_commits/%020d.feedfeed-0001.json" % 1
    os.makedirs(os.path.join(path, "_delta_log", "_commits"), exist_ok=True)
    with open(os.path.join(path, "_delta_log", rel), "w") as f:
        f.write("{}\n")
    tracker.ratify(path, 1, rel)
    sink.append(spark.range(3, 6).toDF("id"))  # loses v1, lands v2
    assert DL.list_commit_versions(path) == [0, 1, 2]
    assert DL.read_snapshot(spark, path).count() == 6


def test_race_loser_staged_file_is_ignored(spark, tmp_path, tracker):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, coordinated_commits="t9tracker")
    sink.append(spark.range(3).toDF("id"))
    sink.append(spark.range(3, 6).toDF("id"))  # staged + ratified v1
    # an abandoned candidate for v1 that never got ratified
    with open(
        os.path.join(
            path, "_delta_log", "_commits", "%020d.deadbeef-9999.json" % 1
        ),
        "w",
    ) as f:
        f.write('{"add": {"path": "nonexistent.parquet"}}\n')
    assert DL.read_snapshot(spark, path).count() == 6
    assert DL.list_commit_versions(path) == [0, 1]


def test_filesystem_client_is_read_only(spark, tmp_path):
    # round-10 ADVICE: rejection moved from first-staged-append to
    # CONSTRUCTION — a failed ratification after staging would strand
    # a sole candidate that ratified-by-uniqueness then serves as a
    # readable FAILED commit (atomicity violation)
    with pytest.raises(ValueError, match="read-only"):
        DeltaSink(spark, str(tmp_path / "t"), coordinated_commits="filesystem")


def test_unknown_coordinator_name_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no registered"):
        DeltaSink(
            spark, str(tmp_path / "t"), coordinated_commits="nope"
        )
    with pytest.raises(ValueError, match="at most one"):
        from mirror_lake_kusto_spark.sources.delta_sink import (
            FsCommitCoordinator,
        )

        DeltaSink(
            spark,
            str(tmp_path / "t2"),
            commit_coordinator=FsCommitCoordinator(),
            coordinated_commits="filesystem",
        )


def test_backfill_publishes_and_is_idempotent(spark, tmp_path, tracker):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, coordinated_commits="t9tracker")
    sink.append(spark.range(4).toDF("id"))
    sink.append(spark.range(4, 8).toDF("id"))
    sink.append(spark.range(8, 10).toDF("id"))
    before = DL.read_snapshot(spark, path).count()
    assert sink.backfill_commits() == 2
    assert _plain(path) == ["%020d.json" % v for v in (0, 1, 2)]
    assert sink.backfill_commits() == 0  # idempotent
    assert DL.read_snapshot(spark, path).count() == before
    # after backfill even a reader with NO registered client serves all
    COORD.unregister_commit_coordinator("t9tracker")
    try:
        assert DL.read_snapshot(spark, path).count() == before
    finally:
        COORD.register_commit_coordinator("t9tracker", tracker)


def test_mirror_follows_coordinated_write_source(spark, tmp_path, tracker):
    from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline

    path = str(tmp_path / "src")
    src = DeltaSink(spark, path, coordinated_commits="t9tracker")
    src.append(spark.range(6).toDF("id"))
    pipe = MirrorPipeline(
        spark,
        path,
        str(tmp_path / "dst"),
        str(tmp_path / "state"),
        table_name="cw",
    )
    pipe.run_until_idle()
    src.append(spark.range(6, 10).toDF("id"))   # staged tail
    src.delete("id = 3")                         # staged tail too
    pipe.run_until_idle()
    assert sorted(r.id for r in pipe.mirror_df().collect()) == [
        i for i in range(10) if i != 3
    ]
    assert pipe.state.high_water("cw") == 2
