"""Round-8 coordinated-commits / catalog-managed PARTIAL READ.

PROTOCOL.md backfill rules: the backfilled ``<version>.json`` prefix of
a coordinated table's filesystem log is immutable and totally ordered,
so a snapshot at or below the last backfilled commit is exact.  The
engine serves it; it refuses only when the staged (coordinator-owned)
tail in ``_delta_log/_commits`` / ``_staged_commits`` is visibly
unpublished past the read point — with the staleness named.
"""

import json as _json
import os as _os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _make_coordinated(spark, tmp_path, name, feature="catalogManaged"):
    """A real 2-commit table whose protocol then declares the catalog
    feature (the shape a foreign writer leaves after migration)."""
    sink = DeltaSink(spark, str(tmp_path / name))
    sink.append(spark.range(5).toDF("id"))
    sink.append(spark.range(5, 8).toDF("id"))
    log = _os.path.join(sink.path, "_delta_log")
    with open(_os.path.join(log, "%020d.json" % 2), "w") as f:
        f.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": [feature],
                        "writerFeatures": [feature],
                    }
                }
            )
            + "\n"
        )
    return sink


def _stage(path, version):
    staged = _os.path.join(path, "_delta_log", "_commits")
    _os.makedirs(staged, exist_ok=True)
    with open(
        _os.path.join(staged, "%020d.%s.json" % (version, "ab12cd34-ef56")),
        "w",
    ) as f:
        f.write("{}\n")


def test_backfilled_coordinated_table_reads(spark, tmp_path):
    """No staged tail (or a fully-backfilled one): the filesystem
    snapshot IS the table — serve it."""
    sink = _make_coordinated(spark, tmp_path, "cc1")
    assert sorted(
        r.id for r in DL.read_snapshot(spark, sink.path).collect()
    ) == list(range(8))
    # a staged DUPLICATE of an already-backfilled version is published
    _stage(sink.path, 1)
    assert DL.read_snapshot(spark, sink.path).count() == 8


def test_unpublished_tail_refuses_with_staleness(spark, tmp_path):
    sink = _make_coordinated(spark, tmp_path, "cc2")
    _stage(sink.path, 3)
    _stage(sink.path, 4)
    with pytest.raises(DL.UnsupportedTableFeature) as ei:
        DL.snapshot_files(spark, sink.path)
    msg = str(ei.value)
    assert "[3, 4]" in msg          # which commits are unpublished
    assert "version 2" in msg        # how stale the served view would be
    assert "2 commit(s) behind v4" in msg
    assert "catalogManaged" in msg   # the feature, still named


def test_historical_read_below_backfilled_head_is_exact(spark, tmp_path):
    """Time travel at or below the backfilled head stays readable even
    with an unpublished tail — those snapshots are immutable."""
    sink = _make_coordinated(spark, tmp_path, "cc3")
    _stage(sink.path, 3)
    assert len(DL.snapshot_files(spark, sink.path, upto=2)) > 0
    assert sorted(
        r.id for r in DL.read_snapshot(spark, sink.path, upto=1).collect()
    ) == list(range(8))
    with pytest.raises(DL.UnsupportedTableFeature):
        DL.snapshot_files(spark, sink.path)  # head read still refuses


def test_coordinated_mirror_syncs_backfilled_prefix(spark, tmp_path):
    """The MIRROR of a coordinated source follows the backfilled
    prefix (the reference's whole job) and stalls loudly — not
    silently — when the tail is unpublished."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline

    sink = _make_coordinated(spark, tmp_path, "cc4")
    pipe = MirrorPipeline(
        spark,
        sink.path,
        str(tmp_path / "dst"),
        str(tmp_path / "state"),
        table_name="cc_mirror",
    )
    pipe.run_until_idle()
    assert sorted(
        r.id for r in pipe.mirror_df().select("id").collect()
    ) == list(range(8))
    _stage(sink.path, 3)
    with pytest.raises(DL.UnsupportedTableFeature, match="staged"):
        pipe.run_until_idle()
