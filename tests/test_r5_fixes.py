"""Round-5 hardening regressions.

1. File-identity joins must preserve a literal ``+`` in data-file paths
   (partition values like ``tz=UTC+8``): Spark's ``url_decode`` is
   form-decoding (``+`` -> space) while the Python side uses
   ``urllib.parse.unquote`` (``+`` preserved) — before the fix every
   DV/lineage identity join silently missed such files.
2. Checkpoint part/sidecar column reads must go through the
   scheme-dispatched fs backend (pyarrow alone cannot open memory:// or
   abfss:// paths) and must RAISE on real I/O errors instead of
   silently treating a corrupt/unreadable part as "column absent".
3. Protocol feature upgrades must enumerate the legacy features the
   old minReader/WriterVersion numbers implied (PROTOCOL.md table-
   features upgrade rules).
"""

import io
import json
import os

import pyarrow as pa
import pyarrow.parquet as papq
import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources import fs as FS
from mirror_lake_kusto_spark.sources.delta_sink import (
    CommitCoordinator,
    ConcurrentCommitConflict,
    DeltaSink,
    LockCommitCoordinator,
    upgraded_protocol,
)


# -- 1. literal '+' in data-file paths ------------------------------------


def test_delete_dv_plus_in_partition_value(spark, tmp_path):
    """DV delete + merge-on-read read on a partition value containing
    '+': the (file, row_index) identity join must match (url_decode
    alone would rewrite 'UTC+8' to 'UTC 8' on the Spark side only)."""
    sink = DeltaSink(spark, str(tmp_path / "pt"), partition_by=["tz"])
    sink.append(
        spark.createDataFrame(
            [(i, "UTC+8" if i < 5 else "UTC-5") for i in range(10)],
            "n long, tz string",
        ).repartition(1)
    )
    # the partition dir really carries the raw '+' spelling
    assert any("+" in d for d in os.listdir(sink.path) if d.startswith("tz="))
    sink.delete_dv("n IN (1, 7)")
    got = sorted(
        (r["n"], r["tz"])
        for r in DL.read_snapshot(spark, sink.path).collect()
    )
    assert [n for n, _ in got] == [0, 2, 3, 4, 5, 6, 8, 9]
    # second DV delete on the same '+' file merges with the existing
    # vector (driver-side by_norm lookup keyed on the same spelling)
    sink.delete_dv("n = 3")
    got = sorted(r["n"] for r in DL.read_snapshot(spark, sink.path).collect())
    assert got == [0, 2, 4, 5, 6, 8, 9]


def test_reorg_purges_dv_with_plus_path(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "pt"), partition_by=["tz"])
    sink.append(
        spark.createDataFrame(
            [(i, "UTC+8") for i in range(6)], "n long, tz string"
        ).repartition(1)
    )
    sink.delete_dv("n = 2")
    sink.reorg()
    files = DL.snapshot_files(spark, sink.path)
    assert all(not (f.get("deletionVector") or {}) for f in files)
    got = sorted(r["n"] for r in DL.read_snapshot(spark, sink.path).collect())
    assert got == [0, 1, 3, 4, 5]


def test_spark_scan_path_preserves_plus(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("/data/tz=UTC+8/part-00000.parquet",),
         ("file:///d/a%20b/p.parquet",)],
        "p string",
    ).select(FS.spark_scan_path(F.col("p")).alias("out"))
    got = [r["out"] for r in df.collect()]
    assert got == ["/data/tz=UTC+8/part-00000.parquet", "/d/a b/p.parquet"]
    # Python-side twin agrees on the '+' spelling
    assert FS.data_path_spelling("/data", "tz=UTC%2B8/p.parquet").endswith(
        "tz=UTC+8/p.parquet"
    )
    assert FS.data_path_spelling("/data", "tz=UTC+8/p.parquet").endswith(
        "tz=UTC+8/p.parquet"
    )


# -- 2. checkpoint part reads through the fs seam -------------------------


def _parquet_bytes(table: pa.Table) -> bytes:
    buf = io.BytesIO()
    papq.write_table(table, buf)
    return buf.getvalue()


def test_checkpoint_part_column_on_memory_fs():
    """A checkpoint part stored on a non-local scheme is readable via
    the fs adapter (plain pyarrow.read_table(path) cannot open it)."""
    fs = FS._MEMORY
    fs.clear()
    p = "memory://t/_delta_log/00000000000000000009.checkpoint.parquet"
    tbl = pa.table(
        {
            "add": pa.array(
                [{"path": "p1.parquet"}, None],
                type=pa.struct([("path", pa.string())]),
            )
        }
    )
    fs.write_bytes(p, _parquet_bytes(tbl))
    vals = DL._checkpoint_part_column(p, "add")
    assert [v for v in vals if v is not None] == [{"path": "p1.parquet"}]
    # absent column -> None (classic checkpoint has no 'sidecar')
    assert DL._checkpoint_part_column(p, "sidecar") is None


def test_checkpoint_part_column_raises_on_corruption():
    """Corruption/permission errors must RAISE (a silently skipped
    checkpoint part is a silently wrong snapshot), not read as
    'column absent'."""
    fs = FS._MEMORY
    fs.clear()
    p = "memory://t/_delta_log/00000000000000000009.checkpoint.parquet"
    fs.write_bytes(p, b"not a parquet file at all")
    with pytest.raises(Exception):
        DL._checkpoint_part_column(p, "add")
    # and a genuinely missing part raises too
    with pytest.raises(FileNotFoundError):
        DL._checkpoint_part_column("memory://t/_delta_log/nope.parquet", "add")


# -- 3. legacy feature enumeration on protocol upgrade --------------------


def test_upgraded_protocol_enumerates_legacy_features():
    pr = upgraded_protocol(
        {"minReaderVersion": 1, "minWriterVersion": 4},
        ("deletionVectors",),
        ("deletionVectors",),
    )
    assert pr["minReaderVersion"] == 3 and pr["minWriterVersion"] == 7
    assert set(pr["writerFeatures"]) >= {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
        "deletionVectors",
    }
    # writer v4 never implied columnMapping/identityColumns
    assert "columnMapping" not in pr["writerFeatures"]
    assert "identityColumns" not in pr["writerFeatures"]


def test_upgraded_protocol_reader2_implies_columnmapping_both_lists():
    pr = upgraded_protocol(
        {"minReaderVersion": 2, "minWriterVersion": 5},
        ("v2Checkpoint",),
        ("v2Checkpoint",),
    )
    assert "columnMapping" in pr["readerFeatures"]
    assert "columnMapping" in pr["writerFeatures"]  # reader-writer feature
    assert "v2Checkpoint" in pr["readerFeatures"]


def test_upgraded_protocol_merges_existing_features():
    cur = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["timestampNtz"],
        "writerFeatures": ["timestampNtz", "appendOnly"],
    }
    pr = upgraded_protocol(cur, ("deletionVectors",), ("deletionVectors",))
    assert "timestampNtz" in pr["readerFeatures"]
    assert "deletionVectors" in pr["writerFeatures"]
    # already table-features: no legacy re-enumeration beyond what's there
    assert "invariants" not in pr["writerFeatures"]
    # idempotent: re-upgrading an already-upgraded protocol is a no-op
    assert upgraded_protocol(pr, ("deletionVectors",), ("deletionVectors",)) == pr


# -- 4. object-store commit atomicity (CommitCoordinator seam) ------------

_EMPTY_SCHEMA = '{"type":"struct","fields":[]}'


def _add(path):
    return {
        "add": {
            "path": path,
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def test_sink_refuses_raw_s3_without_coordinator(spark):
    with pytest.raises(ValueError, match="coordinator"):
        DeltaSink(spark, "s3a://bucket/table")


def test_two_writer_contention_on_memory_fs(spark):
    """Two writers hammering one memory:// table through the lock
    coordinator: every commit survives, versions are contiguous, no
    commit is torn or lost (the exclusive-create primitive raw S3
    lacks, supplied by the coordinator)."""
    import threading

    FS._MEMORY.clear()
    path = "memory://bucket/contended"
    a = DeltaSink(
        spark, path, checkpoint_interval=10**6,
        commit_coordinator=LockCommitCoordinator(path),
    )
    b = DeltaSink(
        spark, path, checkpoint_interval=10**6,
        commit_coordinator=LockCommitCoordinator(path),
    )
    a._pending_schema = b._pending_schema = _EMPTY_SCHEMA
    errors: list = []

    def run(sink, tag):
        try:
            for i in range(10):
                sink._commit([_add(f"{tag}-{i}.parquet")], operation="WRITE")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    ts = [
        threading.Thread(target=run, args=(a, "a")),
        threading.Thread(target=run, args=(b, "b")),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    versions = DL.list_commit_versions(path)
    assert versions == list(range(20))
    files = {f["path"] for f in DL.snapshot_files(spark, path)}
    assert len(files) == 20


def test_contention_loser_with_real_conflict_raises(spark):
    """A loser whose retried commit overlaps the winner's files must
    raise ConcurrentCommitConflict, not blindly re-submit."""
    FS._MEMORY.clear()
    path = "memory://bucket/conflict"
    a = DeltaSink(spark, path, checkpoint_interval=10**6)
    a._pending_schema = _EMPTY_SCHEMA
    a._commit([_add("shared.parquet")], operation="WRITE")

    class RacingCoordinator(CommitCoordinator):
        """First create_commit loses a simulated race: the rival's
        commit (removing the same file) lands first."""

        def __init__(self):
            self.raced = False

        def create_commit(self, fs, path_, data):
            if not self.raced:
                self.raced = True
                a._commit(
                    [
                        {
                            "remove": {
                                "path": "shared.parquet",
                                "deletionTimestamp": 0,
                                "dataChange": True,
                                "partitionValues": {},
                            }
                        }
                    ],
                    operation="DELETE",
                )
                raise FileExistsError(path_)
            fs.create_exclusive(path_, data)

    b = DeltaSink(
        spark, path, checkpoint_interval=10**6,
        commit_coordinator=RacingCoordinator(),
    )
    b._pending_schema = _EMPTY_SCHEMA
    with pytest.raises(ConcurrentCommitConflict):
        b._commit(
            [
                {
                    "remove": {
                        "path": "shared.parquet",
                        "deletionTimestamp": 1,
                        "dataChange": True,
                        "partitionValues": {},
                    }
                }
            ],
            operation="DELETE",
        )
    # the table is consistent: the winner's delete stands
    assert DL.snapshot_files(spark, path) == []


def test_delete_dv_skips_protocol_action_when_current(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "t"))
    sink.append(spark.range(10).toDF("n"))
    sink.delete_dv("n = 1")
    v1_acts = [
        json.loads(line)
        for line in open(
            os.path.join(sink.path, "_delta_log", f"{1:020d}.json")
        )
        if line.strip()
    ]
    # first DV delete upgraded the protocol...
    sink.delete_dv("n = 5")
    v2_acts = [
        json.loads(line)
        for line in open(
            os.path.join(sink.path, "_delta_log", f"{2:020d}.json")
        )
        if line.strip()
    ]
    assert any("protocol" in a for a in v1_acts)
    # ...the second sees it already satisfied and commits no protocol row
    assert not any("protocol" in a for a in v2_acts)


# -- CHECK constraints (PROTOCOL.md "CHECK Constraints") -------------------


def test_check_constraints_enforced(spark, tmp_path):
    from mirror_lake_kusto_spark.sources import delta_log as DL
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(spark.createDataFrame([(1, 5.0), (2, 9.0)], "id long, v double"))
    sink.add_constraint("v_positive", "v > 0")

    # the feature is committed to the protocol
    proto = DL.latest_protocol(path)
    assert "checkConstraints" in (proto.get("writerFeatures") or [])

    # compliant append passes; violating append refuses the WHOLE batch
    sink.append(spark.createDataFrame([(3, 1.5)], "id long, v double"))
    with pytest.raises(ValueError, match="v_positive"):
        sink.append(
            spark.createDataFrame([(4, 2.0), (5, -1.0)], "id long, v double")
        )
    # NULL predicate result counts as a violation (CHECK must be true)
    with pytest.raises(ValueError, match="v_positive"):
        sink.append(spark.createDataFrame([(6, None)], "id long, v double"))
    ids = sorted(r["id"] for r in DL.read_snapshot(spark, path).collect())
    assert ids == [1, 2, 3]

    # merge sources are enforced too
    with pytest.raises(ValueError, match="v_positive"):
        sink.merge(
            spark.createDataFrame([(1, -9.0)], "id long, v double"), ["id"]
        )

    # dropping the constraint lifts enforcement (feature stays)
    sink.drop_constraint("v_positive")
    sink.append(spark.createDataFrame([(7, -3.0)], "id long, v double"))
    assert "checkConstraints" in DL.latest_protocol(path)["writerFeatures"]


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(spark.createDataFrame([(1, -5.0)], "id long, v double"))
    with pytest.raises(ValueError, match="existing row"):
        sink.add_constraint("v_positive", "v > 0")
    with pytest.raises(ValueError, match="bare word"):
        sink.add_constraint("bad name", "v > 0")


# -- generated columns (PROTOCOL.md "Generated Columns") -------------------


def test_generated_column_computed_and_validated(spark, tmp_path):
    from mirror_lake_kusto_spark.sources import delta_log as DL
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.createDataFrame([(1, "2024-03-05 10:00:00")], "id long, ts string")
    )
    sink.add_generated_column("day", "string", "substring(ts, 1, 10)")
    proto = DL.latest_protocol(path)
    assert "generatedColumns" in (proto.get("writerFeatures") or [])

    # absent from the input -> computed at write
    sink.append(
        spark.createDataFrame([(2, "2024-03-06 11:00:00")], "id long, ts string")
    )
    rows = {r["id"]: r for r in DL.read_snapshot(spark, path).collect()}
    assert rows[2]["day"] == "2024-03-06"
    # pre-evolution file reads NULL (generation applies at write)
    assert rows[1]["day"] is None

    # present and consistent -> accepted; inconsistent -> refused
    ok = spark.createDataFrame(
        [(3, "2024-03-07 09:00:00", "2024-03-07")],
        "id long, ts string, day string",
    )
    sink.append(ok)
    bad = spark.createDataFrame(
        [(4, "2024-03-08 09:00:00", "2024-01-01")],
        "id long, ts string, day string",
    )
    with pytest.raises(ValueError, match="generated column day"):
        sink.append(bad)

    # merge sources are generated too
    sink.merge(
        spark.createDataFrame(
            [(2, "2024-04-01 00:30:00")], "id long, ts string"
        ),
        ["id"],
    )
    rows = {r["id"]: r for r in DL.read_snapshot(spark, path).collect()}
    assert rows[2]["day"] == "2024-04-01"

    with pytest.raises(ValueError, match="already exists"):
        sink.add_generated_column("day", "string", "substring(ts, 1, 10)")


def test_generated_partition_column_prunes(spark, tmp_path):
    import os

    from mirror_lake_kusto_spark.sources import delta_log as DL
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path, partition_by=["day"])
    first = spark.createDataFrame(
        [(1, "2024-03-05 10:00:00", "2024-03-05")],
        "id long, ts string, day string",
    )
    sink.append(first)
    sink.add_generated_column("tag", "string", "substring(day, 6, 2)")
    # writers not supplying day still partition correctly when day is
    # itself derivable — here day IS supplied; tag is generated
    sink.append(
        spark.createDataFrame(
            [(2, "2024-04-06 11:00:00", "2024-04-06")],
            "id long, ts string, day string",
        )
    )
    dirs = {d for d in os.listdir(path) if d.startswith("day=")}
    assert dirs == {"day=2024-03-05", "day=2024-04-06"}
    got = DL.read_snapshot(
        spark, path, partition_predicate="day = '2024-04-06'"
    ).collect()
    assert [r["id"] for r in got] == [2]
    assert got[0]["tag"] == "04"


def test_generated_column_survives_schema_evolving_append(spark, tmp_path):
    from mirror_lake_kusto_spark.sources import delta_log as DL
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.createDataFrame([(1, "2024-03-05 10:00:00")], "id long, ts string")
    )
    sink.add_generated_column("day", "string", "substring(ts, 1, 10)")
    # schema-evolving append (extra column): the new metaData must
    # carry the generation expression forward, not erase it
    sink.append(
        spark.createDataFrame(
            [(2, "2024-03-06 11:00:00", "x")], "id long, ts string, extra string"
        )
    )
    import json

    meta = DL.latest_metadata(spark, path)
    gen = {
        f["name"]: (f.get("metadata") or {}).get("delta.generationExpression")
        for f in json.loads(meta["schemaString"])["fields"]
    }
    assert gen["day"] == "substring(ts, 1, 10)"
    # enforcement still live: the generated value is computed
    sink.append(
        spark.createDataFrame(
            [(3, "2024-03-07 09:00:00", "y")], "id long, ts string, extra string"
        )
    )
    rows = {r["id"]: r for r in DL.read_snapshot(spark, path).collect()}
    assert rows[3]["day"] == "2024-03-07"
