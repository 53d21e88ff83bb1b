"""Round-10: catalogManaged READ through the coordinator-client seam.

A catalogManaged table carries NO coordinator name in its metaData —
the managing catalog is out-of-band.  The application binds the path
to a registered client (coordinator.register_catalog_table); the
ratified catalog-owned tail then splices into reads exactly like a
coordinated-commits table.  UNBOUND tables keep the r7/r8 fail-closed
staleness refusal (serving the filesystem view could be stale/torn).
"""

import json
import os
import uuid

import pytest

from mirror_lake_kusto_spark.sources import coordinator as COORD
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_log import UnsupportedTableFeature
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _catalog_table(spark, tmp_path):
    """v0 backfilled (3 rows), v1 protocol=catalogManaged, v2 staged
    ONLY (2 more rows) — returns (path, rel_staged_path)."""
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(spark.range(3).toDF("n").coalesce(1))
    meta = DL.latest_metadata(spark, path)
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "%020d.json" % 1), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["catalogManaged"],
                        "writerFeatures": ["catalogManaged"],
                    }
                }
            )
            + "\n"
            + json.dumps({"metaData": meta})
            + "\n"
        )
    aux = DeltaSink(spark, str(tmp_path / "aux"))
    aux.append(spark.range(3, 5).toDF("n").coalesce(1))
    os.makedirs(os.path.join(log, "_staged_commits"), exist_ok=True)
    lines = []
    for a in DL._read_commit(aux.path, 0):
        if "add" in a:
            import shutil

            shutil.copy(
                os.path.join(aux.path, a["add"]["path"]),
                os.path.join(path, a["add"]["path"]),
            )
            lines.append(json.dumps({"add": a["add"]}))
    rel = "_staged_commits/%020d.%s.json" % (2, uuid.uuid4())
    with open(os.path.join(log, *rel.split("/")), "w") as f:
        f.write("\n".join(lines) + "\n")
    return path, rel


def test_unbound_catalog_managed_table_fails_closed(spark, tmp_path):
    path, _rel = _catalog_table(spark, tmp_path)
    with pytest.raises(
        UnsupportedTableFeature, match="register_catalog_table"
    ):
        DL.read_snapshot(spark, path).collect()


def test_bound_catalog_managed_table_reads_tail(spark, tmp_path):
    path, rel = _catalog_table(spark, tmp_path)
    name = f"cat-{tmp_path.name}"
    catalog = COORD.TrackingCommitCoordinator()
    catalog.ratify(path, 2, rel)
    COORD.register_commit_coordinator(name, catalog)
    COORD.register_catalog_table(path, name)
    try:
        assert DL.list_commit_versions(path) == [0, 1, 2]
        got = sorted(r["n"] for r in DL.read_snapshot(spark, path).collect())
        assert got == [0, 1, 2, 3, 4]
    finally:
        COORD.unregister_catalog_table(path)
        COORD.unregister_commit_coordinator(name)
    # unbound again: the refusal returns (no sticky cache)
    with pytest.raises(UnsupportedTableFeature, match="STALE"):
        DL.read_snapshot(spark, path).collect()


def test_binding_requires_registered_client(tmp_path):
    with pytest.raises(ValueError, match="no registered"):
        COORD.register_catalog_table(str(tmp_path / "t"), "never-registered")


def test_declared_coordinator_wins_over_catalog_binding(spark, tmp_path):
    """A table that DOES declare a coordinator name resolves through
    it; the path binding is the fallback, not an override."""
    path = str(tmp_path / "t")
    name = f"decl-{tmp_path.name}"
    tracker = COORD.TrackingCommitCoordinator()
    COORD.register_commit_coordinator(name, tracker)
    try:
        sink = DeltaSink(spark, path, coordinated_commits=name)
        sink.append(spark.range(3).toDF("n"))
        sink.append(spark.range(3, 6).toDF("n"))  # staged via tracker
        # bind the path to a DIFFERENT (empty) catalog: the declared
        # name must still win and serve the tail
        other = f"other-{tmp_path.name}"
        COORD.register_commit_coordinator(
            other, COORD.TrackingCommitCoordinator()
        )
        COORD.register_catalog_table(path, other)
        try:
            got = sorted(
                r["n"] for r in DL.read_snapshot(spark, path).collect()
            )
            assert got == [0, 1, 2, 3, 4, 5]
        finally:
            COORD.unregister_catalog_table(path)
            COORD.unregister_commit_coordinator(other)
    finally:
        COORD.unregister_commit_coordinator(name)


# ------------------------------------------------------- write side


def _bound_catalog(tmp_path, path):
    name = f"wcat-{tmp_path.name}"
    catalog = COORD.TrackingCommitCoordinator()
    COORD.register_commit_coordinator(name, catalog)
    COORD.register_catalog_table(path, name)
    return name


def test_catalog_managed_write_roundtrip(spark, tmp_path):
    """catalogManaged WRITE (round 10): commits after the v0 bootstrap
    stage under the bound catalog's arbitration; the v0 protocol
    advertises catalogManaged (reader+writer) and the metaData carries
    NO coordinator name; reads resolve through the binding; backfill
    publishes and the snapshot must not change."""
    path = str(tmp_path / "t")
    name = _bound_catalog(tmp_path, path)
    try:
        sink = DeltaSink(spark, path, catalog_managed=True)
        sink.append(spark.range(3).toDF("n"))            # v0 plain
        sink.append(spark.range(3, 6).toDF("n"))         # v1 staged
        sink.delete("n = 4")                             # v2 staged
        proto = DL.latest_protocol(path)
        assert "catalogManaged" in (proto.get("readerFeatures") or [])
        assert "catalogManaged" in (proto.get("writerFeatures") or [])
        meta = DL.latest_metadata(spark, path)
        conf = meta.get("configuration") or {}
        assert not any("commitCoordinator" in k for k in conf)
        got = sorted(r["n"] for r in DL.read_snapshot(spark, path).collect())
        assert got == [0, 1, 2, 3, 5]
        n = sink.backfill_commits()
        assert n == 2
        assert sorted(
            r["n"] for r in DL.read_snapshot(spark, path).collect()
        ) == got
    finally:
        COORD.unregister_catalog_table(path)
        COORD.unregister_commit_coordinator(name)
    # backfilled prefix readable even unbound (partial-read rule)
    assert sorted(
        r["n"] for r in DL.read_snapshot(spark, path).collect()
    ) == [0, 1, 2, 3, 5]


def test_catalog_managed_write_requires_binding(spark, tmp_path):
    with pytest.raises(ValueError, match="not bound"):
        DeltaSink(spark, str(tmp_path / "t"), catalog_managed=True)


def test_catalog_managed_unbound_tail_fails_closed(spark, tmp_path):
    path = str(tmp_path / "t")
    name = _bound_catalog(tmp_path, path)
    try:
        sink = DeltaSink(spark, path, catalog_managed=True)
        sink.append(spark.range(3).toDF("n"))
        sink.append(spark.range(3, 6).toDF("n"))         # staged only
    finally:
        COORD.unregister_catalog_table(path)
        COORD.unregister_commit_coordinator(name)
    from mirror_lake_kusto_spark.sources.delta_log import (
        UnsupportedTableFeature,
    )

    with pytest.raises(UnsupportedTableFeature, match="STALE"):
        DL.read_snapshot(spark, path).collect()


def test_catalog_managed_exclusive_with_coordinated(spark, tmp_path):
    with pytest.raises(ValueError, match="at most one"):
        DeltaSink(
            spark,
            str(tmp_path / "t"),
            coordinated_commits="filesystem",
            catalog_managed=True,
        )


def test_mirror_follows_catalog_managed_source(spark, tmp_path):
    """The pipeline consumes a catalogManaged SOURCE through the
    binding: staged-tail commits (append + row-level delete) mirror
    exactly once, like any coordinated source."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline

    path = str(tmp_path / "src")
    name = _bound_catalog(tmp_path, path)
    try:
        src = DeltaSink(spark, path, catalog_managed=True)
        src.append(spark.range(6).toDF("id"))
        pipe = MirrorPipeline(
            spark,
            path,
            str(tmp_path / "dst"),
            str(tmp_path / "state"),
            table_name="cmsrc",
        )
        pipe.run_until_idle()
        src.append(spark.range(6, 10).toDF("id"))   # staged tail
        src.delete("id = 3")                        # staged tail too
        pipe.run_until_idle()
        assert sorted(r.id for r in pipe.mirror_df().collect()) == [
            i for i in range(10) if i != 3
        ]
    finally:
        COORD.unregister_catalog_table(path)
        COORD.unregister_commit_coordinator(name)
