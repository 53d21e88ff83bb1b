"""Mirror-pipeline round-trip queries: the reference's ACTUAL job —
incremental Delta->table sync with deletes — as an oracle-checked
end-to-end query.

Each call authors a real Delta source (multi-commit, partitioned, with
a row-level delete) from a deterministic lineitem slice, runs the full
MirrorPipeline (discover -> analyze -> stage+load -> removes), and
returns the mirrored table.  The DuckDB oracle is the *logical*
definition of what must survive: the slice minus the deleted rows.
Hash-matching it proves log parsing, add/remove coalescing, partition
constant injection, atomic publish, and remove-by-lineage all at once
(SURVEY §3; reference Orchestrations/DeltaTableOrchestration.cs:85-133).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid

import pyspark.sql.functions as F

from ..pipeline.orchestrate import MirrorPipeline
from ..sources.delta_sink import DeltaSink
from ..sources.tables import load_table
from .base import query

_COLS = (
    "l_orderkey l_partkey l_suppkey l_linenumber l_quantity l_extendedprice "
    "l_discount l_tax l_returnflag l_linestatus l_shipdate"
).split()


def _run_mirror(spark, sf_dir: str, workdir: str):
    """Author source (2 commits, partitioned by l_returnflag) -> sync ->
    source delete -> sync.  Returns the pipeline."""
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    # cache the slice: both authoring commits and neither rescans lineitem
    li = load_table(spark, "lineitem", sf_dir).filter("l_orderkey <= 4000").cache()
    src = DeltaSink(spark, src_path, partition_by=["l_returnflag"])
    src.append(li.filter("l_linenumber <= 3"))
    src.append(li.filter("l_linenumber > 3"))
    li.unpersist()
    pipe = MirrorPipeline(
        spark,
        src_path,
        os.path.join(workdir, "dst"),
        os.path.join(workdir, "state"),
        table_name="lineitem_slice",
    )
    pipe.run_until_idle()
    src.delete("l_linestatus = 'F' AND l_quantity < 10")
    pipe.run_until_idle()
    return pipe


def _workdir(tag: str, sf_dir: str) -> str:
    """A FRESH fixture dir per invocation (round 8): bench reruns and
    the correctness gate may execute the same query from concurrent
    sessions, and a shared path means one session's rmtree+rebuild
    lands mid-read of another's Delta log — hash flakiness.  The uuid
    isolates invocations; the sweep is scoped to THIS pid (its own
    earlier, strictly-sequential invocations) so another live session's
    fixture is never touched."""
    sf = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(
        tempfile.gettempdir(), f"mlk_{tag}_{sf}_{os.getpid()}"
    )
    for old in glob.glob(base + "_*"):
        shutil.rmtree(old, ignore_errors=True)
    return f"{base}_{uuid.uuid4().hex[:8]}"


@query(
    "mirror_e2e_roundtrip",
    f"""
    SELECT {", ".join(_COLS)} FROM lineitem
    WHERE l_orderkey <= 4000
      AND NOT (l_linestatus = 'F' AND l_quantity < 10)
    """,
    doc="full mirror pipeline round trip: 2-commit partitioned Delta "
    "source + row-level delete -> exactly-once sync -> mirrored rows "
    "hash-equal the logical survivor set",
)
def mirror_e2e_roundtrip(spark, sf_dir):
    pipe = _run_mirror(spark, sf_dir, _workdir("mirror_e2e", sf_dir))
    return pipe.mirror_df().select(*_COLS)


@query(
    "mirror_dv_source_materialize",
    f"""
    SELECT {", ".join(_COLS)} FROM lineitem
    WHERE l_orderkey <= 4000
      AND NOT (l_linestatus = 'F' AND l_quantity < 10)
      AND NOT (l_returnflag = 'R' AND l_linenumber >= 5)
    """,
    doc="on_dv='materialize' (round 9): the SOURCE is a merge-on-read "
    "Delta table — two delete_dv commits rewrite files in place with "
    "deletion-vector bitmaps (remove(P)+add(P,DV), which coalescing "
    "cancels) — and the mirror FOLLOWS instead of refusing: surviving "
    "rows are staged with the bitmap applied at read, DV provenance "
    "is recorded in the item state, and the second (grown) bitmap "
    "re-stages the path after deleting the previously mirrored rows "
    "inside the same exactly-once staging step.  Reference analogue "
    "surpassed: TransactionLogEntry.cs:341-342 throws on DV adds; "
    "BlobStagingOrchestration.cs:244-289 copies raw bytes",
)
def mirror_dv_source_materialize(spark, sf_dir):
    workdir = _workdir("mirror_dvsrc", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    li = load_table(spark, "lineitem", sf_dir).filter(
        "l_orderkey <= 4000"
    ).cache()
    src = DeltaSink(spark, src_path)
    src.append(li.filter("l_linenumber <= 3"))
    src.append(li.filter("l_linenumber > 3"))
    li.unpersist()
    pipe = MirrorPipeline(
        spark,
        src_path,
        os.path.join(workdir, "dst"),
        os.path.join(workdir, "state"),
        table_name="lineitem_dv",
        on_dv="materialize",
    )
    pipe.run_until_idle()
    src.delete_dv("l_linestatus = 'F' AND l_quantity < 10")
    pipe.run_until_idle()
    # second merge-on-read delete GROWS bitmaps on already-DV'd files:
    # the changed descriptors re-stage those paths
    src.delete_dv("l_returnflag = 'R' AND l_linenumber >= 5")
    pipe.run_until_idle()
    return pipe.mirror_df().select(*_COLS)


@query(
    "mirror_state_machine",
    """
    SELECT * FROM (VALUES
        ('Add', 'Done', TRUE),
        ('Remove', 'Done', TRUE),
        ('Schema', 'Done', TRUE),
        ('StagingTable', 'Done', TRUE)
    ) AS t(action, state, nonempty)
    ORDER BY action, state
    """,
    doc="state-store contents after the sync: every TransactionItem "
    "reaches a terminal state (Done/Skipped) across both batches "
    "(reference state machine, Storage/TransactionItemState.cs:9-17). "
    "The scenario's terminal (action, state) groups are an invariant "
    "of the state machine, not of the data scale, so the oracle is "
    "the exact VALUES table — hash-checked since round 7",
)
def mirror_state_machine(spark, sf_dir):
    pipe = _run_mirror(spark, sf_dir, _workdir("mirror_state", sf_dir))
    return (
        pipe.state.status_df()
        .groupBy("action", "state")
        .agg(F.count("*").alias("n_items"))
        .orderBy("action", "state")
        .select("action", "state", (F.col("n_items") > 0).alias("nonempty"))
    )


@query(
    "mirror_show_tables",
    f"""
    SELECT 'lineitem_slice' AS table_name,
           CAST(2 AS BIGINT) AS high_water_tx,
           CAST(0 AS BIGINT) AS n_pending,
           CAST(COUNT(*) AS BIGINT) AS live_records
    FROM lineitem
    WHERE l_orderkey <= 4000
      AND NOT (l_linestatus = 'F' AND l_quantity < 10)
    """,
    doc="K8 `.show tables` twin: per-table sync posture from state "
    "metadata only — live_records equals the logical survivor count, "
    "high-water mark at the delete commit, nothing pending "
    "(DeltaTableOrchestration.cs:233-235)",
)
def mirror_show_tables(spark, sf_dir):
    from ..pipeline.multi import MirrorOrchestration

    wd = _workdir("mirror_show", sf_dir)
    _run_mirror(spark, sf_dir, wd)
    orch = MirrorOrchestration(
        spark,
        {
            "lineitem_slice": {
                "source_path": os.path.join(wd, "src"),
                "target_path": os.path.join(wd, "dst"),
                "state_dir": os.path.join(wd, "state"),
            }
        },
        wd,
    )
    orch.run_until_idle()  # already synced by _run_mirror; stays idle
    return orch.show_tables().select(
        "table_name", "high_water_tx", "n_pending", "live_records"
    )


@query(
    "mirror_change_feed",
    f"""
    WITH slice AS (
      SELECT {", ".join(_COLS)} FROM lineitem WHERE l_orderkey <= 4000
    )
    SELECT 'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version,
           {", ".join(_COLS)} FROM slice WHERE l_linenumber <= 3
    UNION ALL
    SELECT 'insert', CAST(1 AS BIGINT), {", ".join(_COLS)}
    FROM slice WHERE l_linenumber > 3
    UNION ALL
    SELECT 'delete', CAST(2 AS BIGINT), {", ".join(_COLS)} FROM slice
    UNION ALL
    SELECT 'insert', CAST(2 AS BIGINT), {", ".join(_COLS)}
    FROM slice WHERE NOT (l_linestatus = 'F' AND l_quantity < 10)
    """,
    doc="batch change feed (Delta CDF analogue): 2 appends + a "
    "copy-on-write delete -> versioned insert/delete rows.  Both data "
    "files contain delete matches, so the v2 rewrite is exactly the "
    "whole slice out + survivors back in — the logical oracle form "
    "(file-level CDF is the remove⋈add stream the mirror consumes, "
    "C1/C3)",
)
def mirror_change_feed(spark, sf_dir):
    wd = _workdir("mirror_cdf", sf_dir)
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    li = load_table(spark, "lineitem", sf_dir).filter("l_orderkey <= 4000").cache()
    src = DeltaSink(spark, os.path.join(wd, "src"))
    src.append(li.filter("l_linenumber <= 3").select(*_COLS).coalesce(1))
    src.append(li.filter("l_linenumber > 3").select(*_COLS).coalesce(1))
    li.unpersist()
    src.delete("l_linestatus = 'F' AND l_quantity < 10")
    return src.changes(0).select("_change_type", "_commit_version", *_COLS)


@query(
    "mirror_dv_read",
    """
    SELECT r_regionkey, r_name FROM region
    WHERE r_regionkey NOT IN (1, 3)
    """,
    doc="deletion-vector read (Delta PROTOCOL.md merge-on-read): a "
    "reader-v3 table whose add action carries an inline roaring-bitmap "
    "deletion vector over physical rows 1 and 3 returns exactly the "
    "surviving rows — the feature the reference era predated "
    "(TransactionLogEntry.cs parses classic actions only) and current "
    "Delta writers emit by default",
)
def mirror_dv_read(spark, sf_dir):
    import json

    from ..sources import delta_log as DL
    from ..sources import dv as dvm

    workdir = _workdir("mirror_dv", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    region = (
        load_table(spark, "region", sf_dir)
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
        .coalesce(1)
    )
    sink = DeltaSink(spark, path)
    sink.append(region)
    f = DL.snapshot_files(spark, path)[0]
    # physical row order = r_regionkey order (single sorted file), so
    # deleting row indices {1, 3} deletes region keys 1 and 3
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
                "deletionVector": dvm.inline_descriptor([1, 3]),
            }
        },
    ]
    from ..sources import fs as FS

    FS.get_fs(path).write_text(
        DL._commit_file(path, 1),
        "\n".join(json.dumps(a) for a in acts) + "\n",
    )
    return DL.read_snapshot(spark, path)


@query(
    "mirror_colmap_read",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_regionkey <= 2
    """,
    doc="column-mapping read (Delta PROTOCOL.md 'Column Mapping', name "
    "mode): data files store physical names (col-xxxx), the metaData "
    "schema records logical->physical via "
    "delta.columnMapping.physicalName, add.partitionValues are keyed "
    "physically — read_snapshot renames to logical names and prunes "
    "partitions with logical predicates",
)
def mirror_colmap_read(spark, sf_dir):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources import delta_log as DL

    workdir = _workdir("mirror_colmap", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    path = os.path.join(workdir, "t")
    os.makedirs(os.path.join(path, "_delta_log"))
    nation = (
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    )
    # physical layout: one file per n_regionkey partition, data files
    # store physical names only
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "n_nationkey",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-1a",
                },
            },
            {
                "name": "n_name",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-2b",
                },
            },
            {
                "name": "n_regionkey",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 3,
                    "delta.columnMapping.physicalName": "col-3c",
                },
            },
        ],
    }
    acts = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "colmap-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["col-3c"],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
                "createdTime": 0,
            }
        },
    ]
    by_region: dict[int, list] = {}
    for r in nation:
        by_region.setdefault(r["n_regionkey"], []).append(r)
    for rk, rows in sorted(by_region.items()):
        rel = f"r{rk}/part-0.parquet"
        os.makedirs(os.path.join(path, f"r{rk}"), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "col-1a": pa.array(
                        [int(r["n_nationkey"]) for r in rows], pa.int64()
                    ),
                    "col-2b": [r["n_name"] for r in rows],
                }
            ),
            os.path.join(path, rel),
        )
        acts.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {"col-3c": str(rk)},
                    "size": os.path.getsize(os.path.join(path, rel)),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": len(rows)}),
                }
            }
        )
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    # logical-name partition predicate prunes physical-keyed groups
    return DL.read_snapshot(
        spark, path, partition_predicate="n_regionkey <= 2"
    ).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "mirror_colmap_evolve",
    """
    SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation
    """,
    doc="mapping-aware schema evolution end-to-end (beyond reference "
    "parity — Storage/TransactionLog.cs:153-157 hard-stops on any "
    "rename): mirror batch 1 under the original name, the source "
    "RENAMEs n_name->nation_name metadata-only (DeltaSink."
    "evolve_rename: column-mapping 'name' mode, physicalName = old "
    "spelling, no data rewrite), batch 2 appends under the new "
    "logical name; on_schema_change='evolve-rename' relabels the "
    "target the same way and keeps mirroring — the final mirror "
    "hash-equals the renamed full table",
)
def mirror_colmap_evolve(spark, sf_dir):
    workdir = _workdir("mirror_cm_evolve", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    src = DeltaSink(spark, src_path)
    src.append(nation.filter("n_nationkey <= 12"))
    pipe = MirrorPipeline(
        spark,
        src_path,
        os.path.join(workdir, "dst"),
        os.path.join(workdir, "state"),
        table_name="nation_evolve",
        on_schema_change="evolve-rename",
    )
    pipe.run_until_idle()
    src.evolve_rename({"n_name": "nation_name"})
    src.append(
        nation.filter("n_nationkey > 12").withColumnRenamed(
            "n_name", "nation_name"
        )
    )
    pipe.run_until_idle()
    return pipe.mirror_df().select(
        "n_nationkey", "nation_name", "n_regionkey"
    )


@query(
    "mirror_dv_delete",
    """
    SELECT r_regionkey, r_name FROM region
    WHERE r_regionkey NOT IN (1, 3)
    """,
    doc="merge-on-read DELETE round trip: DeltaSink.delete_dv writes a "
    "roaring-bitmap deletion vector (KBs) instead of rewriting the "
    "file, upgrades the protocol to readerVersion 3, and read_snapshot "
    "applies the bitmap — the 100 TB delete path (delete a few rows "
    "from terabyte files without touching the data)",
)
def mirror_dv_delete(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_dvw", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    region = (
        load_table(spark, "region", sf_dir)
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
        .coalesce(1)
    )
    sink = DeltaSink(spark, path)
    sink.append(region)
    sink.delete_dv("r_regionkey IN (1, 3)")
    return DL.read_snapshot(spark, path)


@query(
    "mirror_cdf_read",
    """
    WITH live AS (
      SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20
    )
    SELECT n_nationkey, n_name, 'delete' AS change_type,
           CAST(3 AS BIGINT) AS commit_version
    FROM nation WHERE n_nationkey >= 20
    UNION ALL
    SELECT n_nationkey, n_name, 'update_preimage', 4
    FROM live WHERE n_nationkey = 5
    UNION ALL
    SELECT 5, 'UPDATED', 'update_postimage', 4
    UNION ALL
    SELECT 99, 'NEWLAND', 'insert', 4
    UNION ALL
    SELECT n_nationkey, n_name, 'delete', 4
    FROM live WHERE n_nationkey = 7
    ORDER BY commit_version, change_type, n_nationkey
    """,
    doc="Change Data Feed round trip (PROTOCOL.md 'Change Data Feed'): "
    "with delta.enableChangeDataFeed set, DELETE and MERGE stage "
    "row-level _change_data files + cdc actions (delete / "
    "update_preimage / update_postimage / insert), and read_changes "
    "reads a cdc commit EXCLUSIVELY from them — exact row-level "
    "changes instead of the file-level remove+re-add synthesis.  The "
    "oracle derives the expected change rows independently from the "
    "nation table",
)
def mirror_cdf_read(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_cdf", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    base = (
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .coalesce(1)
    )
    sink = DeltaSink(spark, path)
    sink.append(base)                                   # v0
    sink.set_properties(
        {"delta.enableChangeDataFeed": "true"}
    )                                                   # v1 proto, v2 meta
    sink.delete("n_nationkey >= 20")                    # v3
    key_t = dict(base.dtypes)["n_nationkey"]
    upd = base.filter("n_nationkey = 5").withColumn(
        "n_name", F.lit("UPDATED")
    )
    ins = base.limit(1).select(
        F.lit(99).cast(key_t).alias("n_nationkey"),
        F.lit("NEWLAND").alias("n_name"),
    )
    sink.merge(
        upd.unionByName(ins),
        ["n_nationkey"],
        delete_keys=base.filter("n_nationkey = 7").select("n_nationkey"),
    )                                                   # v4
    ch = DL.read_changes(spark, path, 3, 4)
    return ch.select(
        "n_nationkey",
        "n_name",
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    ).orderBy("commit_version", "change_type", "n_nationkey")


@query(
    "mirror_time_travel",
    """
    SELECT n_nationkey, n_name,
           'v0' AS at FROM nation
    UNION ALL
    SELECT n_nationkey, n_name, 'head'
    FROM nation WHERE n_nationkey % 3 != 0
    ORDER BY at, n_nationkey
    """,
    doc="Time travel (Delta VERSION AS OF): read_snapshot(upto=v) "
    "replays the log only to v — the pre-delete version still shows "
    "every row after a later DELETE, the head shows the survivors.  "
    "Log replay is O(commits <= v) driver metadata; the data reads "
    "stay distributed",
)
def mirror_time_travel(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_tt", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    base = (
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .coalesce(1)
    )
    sink = DeltaSink(spark, path)
    sink.append(base)                       # v0
    sink.delete("n_nationkey % 3 = 0")      # v1
    old = DL.read_snapshot(spark, path, upto=0).withColumn(
        "at", F.lit("v0")
    )
    head = DL.read_snapshot(spark, path).withColumn("at", F.lit("head"))
    return old.unionByName(head).orderBy("at", "n_nationkey")


@query(
    "mirror_concurrent_writers",
    f"""
    SELECT {", ".join(_COLS)} FROM lineitem
    WHERE l_orderkey <= 2000
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Concurrent-commit conflict RESOLUTION (round 6): two "
    "independent DeltaSink writers race disjoint appends while a "
    "third OPTIMIZEs (dataChange=false) the same table; losers "
    "rebase onto the winner's head and retry per Delta's logical "
    "conflict rules (delta_sink._check_conflicts) — the reference "
    "is single-writer by construction "
    "(Storage/CheckpointGateway.cs:96-104).  The post-race table "
    "must hold every appended row exactly once",
)
def mirror_concurrent_writers(spark, sf_dir):
    import threading

    from ..sources import delta_log as DL
    from ..sources.delta_sink import ConcurrentCommitConflict

    workdir = _workdir("mirror_race", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter("l_orderkey <= 2000")
        .select(*_COLS)
        .cache()
    )
    li.count()
    seed = DeltaSink(spark, path, checkpoint_interval=10**6)
    seed.append(li.limit(0))  # bootstrap schema at v0
    errors: list = []

    def appender(parity: int):
        s = DeltaSink(spark, path, checkpoint_interval=10**6)
        try:
            for third in range(3):
                s.append(
                    li.filter(
                        (F.col("l_orderkey") % 2 == parity)
                        & (F.col("l_orderkey") % 3 == third)
                    )
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def compactor():
        s = DeltaSink(spark, path, checkpoint_interval=10**6)
        for _ in range(2):
            try:
                s.optimize()
            except ConcurrentCommitConflict:
                continue  # true conflict: re-plan from the new snapshot

    ts = [
        threading.Thread(target=appender, args=(0,)),
        threading.Thread(target=appender, args=(1,)),
        threading.Thread(target=compactor),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    li.unpersist()
    if errors:
        raise errors[0]
    return (
        DL.read_snapshot(spark, path)
        .select(*_COLS)
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "mirror_time_travel_ts",
    """
    SELECT n_nationkey, n_name, 'pre' AS at FROM nation
    UNION ALL
    SELECT n_nationkey, n_name, 'head'
    FROM nation WHERE n_nationkey % 2 != 0
    ORDER BY at, n_nationkey
    """,
    doc="Timestamp time travel (Delta TIMESTAMP AS OF) on an "
    "inCommitTimestamp table: enabling the writer feature stamps an "
    "authoritative monotonic clock into commitInfo; resolve_timestamp "
    "maps a wall-clock point to the latest commit at-or-before it, "
    "so reading one tick before the DELETE's ICT shows every row and "
    "the head shows the survivors.  Resolution is O(commits) driver "
    "metadata; the data reads stay distributed",
)
def mirror_time_travel_ts(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_tt_ts", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    base = (
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .coalesce(1)
    )
    sink = DeltaSink(spark, path)
    sink.append(base)                                          # v0
    sink.set_properties({"delta.enableInCommitTimestamps": "true"})
    v_del = sink.delete("n_nationkey % 2 = 0")
    ts_of = dict(DL.commit_timestamps(path))
    pre = DL.read_snapshot(
        spark, path, timestamp=ts_of[v_del] - 1
    ).withColumn("at", F.lit("pre"))
    head = DL.read_snapshot(spark, path).withColumn("at", F.lit("head"))
    return pre.unionByName(head).orderBy("at", "n_nationkey")


@query(
    "mirror_type_widening",
    """
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           ROUND(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal
    FROM supplier
    ORDER BY s_suppkey
    """,
    doc="typeWidening (PROTOCOL.md): first commit writes s_suppkey as "
    "INT / s_acctbal as FLOAT, the second appends the widened "
    "BIGINT/DOUBLE schema — metaData records the wide types while the "
    "old files keep narrow physical types.  read_snapshot reads every "
    "file with the LATEST schema; Spark's parquet readers promote "
    "int->long and float->double natively, so old and new files "
    "union losslessly",
)
def mirror_type_widening(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_tw", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    sup = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_acctbal"
    ).cache()
    sink = DeltaSink(spark, path)
    sink.append(                                      # v0: narrow types
        sup.filter("s_suppkey % 2 = 0").select(
            F.col("s_suppkey").cast("int").alias("s_suppkey"),
            "s_name",
            F.col("s_acctbal").cast("float").alias("s_acctbal"),
        )
    )
    sink.append(                                      # v1: widened
        sup.filter("s_suppkey % 2 = 1").select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )
    sup.unpersist()
    # ROUND both sides: the narrow files round-trip s_acctbal through
    # float32 (the widening semantic), reintroducing ~1e-4 noise on a
    # 2-decimal currency column
    return (
        DL.read_snapshot(spark, path)
        .withColumn("s_acctbal", F.round("s_acctbal", 2))
        .orderBy("s_suppkey")
    )


@query(
    "mirror_clustered_target",
    """
    SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_orderkey <= 4000
      AND l_orderkey BETWEEN 500 AND 1500
      AND l_partkey  BETWEEN 100 AND 1200
    ORDER BY l_orderkey, l_partkey, l_suppkey, l_quantity
    """,
    doc="liquid clustering on the mirror target (round 7): "
    "optimize_target_cluster_by declares the clustering writer "
    "feature + delta.clustering domain metadata on the TARGET and "
    "every periodic OPTIMIZE lays rows along the HILBERT curve over "
    "(l_orderkey, l_partkey) — dataChange=false churn the mirror "
    "must not re-ingest.  The returned slice filters on BOTH cluster "
    "keys, the exact workload the layout makes stats-skippable; a "
    "plan test (test_r7_clustering) pins the actual file pruning.  "
    "Reference analogue: K2 extent policies, surpassed (the "
    "reference delegates layout to Kusto)",
)
def mirror_clustered_target(spark, sf_dir):
    workdir = _workdir("mirror_clu", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    li = load_table(spark, "lineitem", sf_dir).filter(
        "l_orderkey <= 4000"
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity").cache()
    src = DeltaSink(spark, src_path)
    src.append(li.filter("l_orderkey % 2 = 0"))
    src.append(li.filter("l_orderkey % 2 = 1"))
    li.unpersist()
    pipe = MirrorPipeline(
        spark,
        src_path,
        os.path.join(workdir, "dst"),
        os.path.join(workdir, "state"),
        table_name="li_clustered",
        optimize_target_every=1,
        optimize_target_cluster_by=["l_orderkey", "l_partkey"],
    )
    pipe.run_until_idle()
    return (
        pipe.sink.to_df(
            predicate="l_orderkey >= 500 AND l_orderkey <= 1500"
        )
        .filter(
            "l_orderkey BETWEEN 500 AND 1500 "
            "AND l_partkey BETWEEN 100 AND 1200"
        )
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    )


def _twe_mirror(spark, sf_dir, prefix):
    """Shared type-widening fixture: author a narrow source, widen it
    mid-stream (int->bigint, float->double, decimal(10,2)->(14,4)),
    mirror with on_schema_change='widen', return the mirrored DF.

    Hash-contract hardening (round 9, after two driver-red rounds that
    passed every local reproduction): ``s_acctbal`` is FLOORED to a
    whole-dollar integer BEFORE the float32 cast, so every value is
    exactly representable in float32 and the float->double promotion is
    bit-identical on any engine — ROUND/decimal normalization leaves
    the hashed contract entirely (the final projections compare pure
    BIGINT/STRING columns only).
    """
    workdir = _workdir(prefix, sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    sup = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        "s_name",
        # whole-dollar values: integral, float32-exact, FLOOR on both
        # engines is unambiguous (half-even vs half-up never fires)
        F.floor("s_acctbal").cast("double").alias("s_acctbal"),
        "s_nationkey",
    ).cache()

    def narrow(pred):
        return sup.filter(pred).select(
            F.col("s_suppkey").cast("int").alias("s_suppkey"),
            "s_name",
            F.col("s_acctbal").cast("float").alias("s_acctbal"),
            F.col("s_nationkey").cast("decimal(10,2)").alias("s_nationkey"),
        )

    src = DeltaSink(spark, src_path)
    src.append(narrow("s_suppkey % 3 = 0"))               # v0 narrow
    pipe = MirrorPipeline(
        spark,
        src_path,
        os.path.join(workdir, "dst"),
        os.path.join(workdir, "state"),
        table_name="sup_widen",
        on_schema_change="widen",
    )
    pipe.run_until_idle()                # target created NARROW
    src.append(narrow("s_suppkey % 3 = 1"))               # v1 narrow
    src.widen_column("s_suppkey", "long")                 # v2
    src.widen_column("s_acctbal", "double")               # v3
    src.widen_column("s_nationkey", "decimal(14,4)")      # v4
    src.append(                                           # v5 wide
        sup.filter("s_suppkey % 3 = 2").select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("s_nationkey").cast("decimal(14,4)").alias("s_nationkey"),
        )
    )
    pipe.run_until_idle()                # ONE batch spans v1..v5
    sup.unpersist()
    return pipe.mirror_df()


def _twe_acctbal():
    # the hashed contract is integers-and-strings ONLY: acctbal is
    # integral by construction (floor before the float cast), so a
    # bigint cast is exact — no float repr or decimal rendering can
    # diverge between engines or hasher builds
    return F.col("s_acctbal").cast("bigint").alias("s_acctbal_i")


def _twe_nationkey():
    return (F.col("s_nationkey") * 10000).cast("bigint").alias(
        "s_nationkey_e4"
    )


@query(
    "mirror_type_widening_evolve",
    """
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           CAST(FLOOR(s_acctbal) AS BIGINT) AS s_acctbal_i,
           CAST(s_nationkey * 10000 AS BIGINT) AS s_nationkey_e4
    FROM supplier
    ORDER BY s_suppkey
    """,
    doc="on_schema_change='widen' (round 7): the SOURCE widens columns "
    "mid-stream (widen_column: int->bigint, float->double, "
    "decimal(10,2)->decimal(14,4)) and the MIRROR FOLLOWS instead of "
    "stranding — sync #1 lands the narrow half, then one sync #2 "
    "batch spans a narrow commit, the widen commits, and a wide "
    "commit; DeltaSink.evolve_widen rewrites the target metaData with "
    "the typeWidening feature + delta.typeChanges history, so the "
    "target's own narrow files promote on read.  Round 9: hashed "
    "contract rebuilt as pure BIGINT/STRING (floor-integral acctbal, "
    "e4-scaled nationkey) after two driver-only hash mismatches that "
    "no local reproduction could exhibit.  Reference analogue "
    "surpassed: Storage/TransactionLog.cs:153-157 refuses all schema "
    "changes",
)
def mirror_type_widening_evolve(spark, sf_dir):
    return (
        _twe_mirror(spark, sf_dir, "mirror_twe")
        .select("s_suppkey", "s_name", _twe_acctbal(), _twe_nationkey())
        .orderBy("s_suppkey")
    )


@query(
    "mirror_twe_probe_acctbal",
    """
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
           CAST(FLOOR(s_acctbal) AS BIGINT) AS s_acctbal_i
    FROM supplier
    ORDER BY s_suppkey
    """,
    doc="localizer probe A for mirror_type_widening_evolve (round-9 "
    "VERDICT ask): the float->double-widened column ONLY.  If the "
    "full query is driver-red while this is green, the divergence is "
    "not in the acctbal promotion path",
)
def mirror_twe_probe_acctbal(spark, sf_dir):
    return (
        _twe_mirror(spark, sf_dir, "mirror_twe_pa")
        .select("s_suppkey", _twe_acctbal())
        .orderBy("s_suppkey")
    )


@query(
    "mirror_twe_probe_exactcols",
    """
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           CAST(s_nationkey * 10000 AS BIGINT) AS s_nationkey_e4
    FROM supplier
    ORDER BY s_suppkey
    """,
    doc="localizer probe B for mirror_type_widening_evolve: the "
    "int->bigint and decimal-widened columns plus the untouched "
    "string — everything EXCEPT the float path.  Together with probe "
    "A, a remaining driver divergence names its column",
)
def mirror_twe_probe_exactcols(spark, sf_dir):
    return (
        _twe_mirror(spark, sf_dir, "mirror_twe_pe")
        .select("s_suppkey", "s_name", _twe_nationkey())
        .orderBy("s_suppkey")
    )


@query(
    "mirror_widen_chain",
    """
    SELECT p_partkey,
           CAST(p_size AS BIGINT) AS sz,
           CAST(p_size AS BIGINT) * 100 AS szd_e2
    FROM part WHERE p_partkey <= 2000
    ORDER BY p_partkey
    """,
    doc="round-9 full widening matrix: a 3-STEP chain "
    "(byte->short->integer->long, four file eras in one table) plus "
    "the era-split pair (byte->decimal — Spark's vectorized reader "
    "cannot promote INT(8) physicals to decimal, so those scans group "
    "by sniffed footer type and cast after the scan, "
    "delta_log.physical_read_groups).  The mirror follows every step "
    "with on_schema_change='widen' in ONE spanning batch; the hashed "
    "contract is pure BIGINT (decimal scaled e2).  Reference: "
    "TransactionLog.cs:153-157 refuses all retypes",
)
def mirror_widen_chain(spark, sf_dir):
    workdir = _workdir("mirror_wchain", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    part = load_table(spark, "part", sf_dir).filter(
        "p_partkey <= 2000"
    ).select("p_partkey", "p_size").cache()

    def era(pred, t_sz, t_szd):
        return part.filter(pred).select(
            "p_partkey",
            F.col("p_size").cast(t_sz).alias("sz"),
            F.col("p_size").cast(t_szd).alias("szd"),
        )

    src = DeltaSink(spark, src_path)
    src.append(era("p_partkey % 4 = 0", "byte", "byte"))        # v0
    pipe = MirrorPipeline(
        spark,
        src_path,
        os.path.join(workdir, "dst"),
        os.path.join(workdir, "state"),
        table_name="part_wchain",
        on_schema_change="widen",
    )
    pipe.run_until_idle()                      # target created byte/byte
    src.widen_column("sz", "short")
    src.append(era("p_partkey % 4 = 1", "short", "byte"))
    src.widen_column("sz", "integer")
    src.append(era("p_partkey % 4 = 2", "int", "byte"))
    src.widen_column("sz", "long")
    src.widen_column("szd", "decimal(9,2)")    # the era-split pair
    src.append(era("p_partkey % 4 = 3", "bigint", "decimal(9,2)"))
    pipe.run_until_idle()                      # ONE batch spans it all
    part.unpersist()
    return (
        pipe.mirror_df()
        .select(
            "p_partkey",
            F.col("sz").cast("bigint").alias("sz"),
            (F.col("szd") * 100).cast("bigint").alias("szd_e2"),
        )
        .orderBy("p_partkey")
    )


@query(
    "mirror_variant_roundtrip",
    """
    SELECT n_nationkey,
           n_name AS vname,
           CAST(n_regionkey AS INT) AS vregion
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="variantType (PROTOCOL.md 'Variant Data Type'): rows are "
    "packed into a VARIANT column (parse_json), written through the "
    "sink — which commits the variantType reader+writer feature gate "
    "and falls back to a distributed row count for add stats (pyarrow "
    "cannot parse the VARIANT footer) — with the second commit "
    "written SHREDDED (typed_value layout); read_snapshot "
    "reconstructs both layouts and variant_get extracts typed fields "
    "back out losslessly",
)
def mirror_variant_roundtrip(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_variant", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    base = load_table(spark, "nation", sf_dir).selectExpr(
        "n_nationkey",
        "parse_json(to_json(named_struct("
        "'name', n_name, 'region', n_regionkey))) AS v",
    )
    sink = DeltaSink(spark, path)
    sink.append(base.filter("n_nationkey % 2 = 0"))   # v0: unshredded
    spark.conf.set(
        "spark.sql.variant.forceShreddingSchemaForTest",
        "name string, region int",
    )
    try:
        sink.append(base.filter("n_nationkey % 2 = 1"))  # v1: shredded
    finally:
        spark.conf.unset("spark.sql.variant.forceShreddingSchemaForTest")
    return (
        DL.read_snapshot(spark, path)
        .selectExpr(
            "n_nationkey",
            "variant_get(v, '$.name', 'string') AS vname",
            "variant_get(v, '$.region', 'int') AS vregion",
        )
        .orderBy("n_nationkey")
    )


@query(
    "mirror_row_tracking",
    """
    WITH src AS (
      SELECT n_nationkey, n_name,
             ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1 AS rid
      FROM nation
    )
    SELECT n_nationkey, n_name, CAST(rid AS BIGINT) AS src_row_id
    FROM src
    WHERE n_nationkey % 5 != 0
    ORDER BY n_nationkey
    """,
    doc="Row tracking (PROTOCOL.md 'Row Tracking'): the source table "
    "enables delta.enableRowTracking (feature commit + id backfill + "
    "watermark domain metadata), deletes rows (the copy-on-write "
    "rewrite MATERIALIZES survivors' ids so identities never change), "
    "and the mirror pipeline carries each row's source identity as "
    "the MLK_SourceRowId lineage column.  Ids are assigned in "
    "n_nationkey order (single sorted file), so the oracle can "
    "recompute them with ROW_NUMBER",
)
def mirror_row_tracking(spark, sf_dir):
    workdir = _workdir("mirror_rt", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    base = (
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .coalesce(1)
    )
    src = DeltaSink(spark, src_path)
    src.append(base)                                           # ids 0..N-1
    src.set_properties({"delta.enableRowTracking": "true"})
    src.delete("n_nationkey % 5 = 0")    # rewrite materializes ids
    pipe = MirrorPipeline(
        spark,
        src_path,
        os.path.join(workdir, "dst"),
        os.path.join(workdir, "state"),
        table_name="nation_rt",
    )
    pipe.run_until_idle()
    return (
        pipe.mirror_df()
        .select(
            "n_nationkey",
            "n_name",
            F.col("MLK_SourceRowId").alias("src_row_id"),
        )
        .orderBy("n_nationkey")
    )


@query(
    "mirror_update",
    """
    SELECT o_orderkey,
           CAST(CASE WHEN o_orderpriority = '1-URGENT'
                THEN ROUND(CAST(o_totalprice AS DECIMAL(15,2)) * 1.1, 2)
                ELSE CAST(o_totalprice AS DECIMAL(15,2)) END
                AS DOUBLE) AS o_totalprice,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN 'REPRICED' ELSE o_orderstatus END AS o_orderstatus
    FROM orders
    WHERE o_orderkey <= 5000
    ORDER BY o_orderkey
    """,
    doc="UPDATE ... SET (Delta copy-on-write): only the files holding "
    "matching rows rewrite; every right-hand side sees the pre-update "
    "row; non-matching rows are byte-stable.  The oracle recomputes "
    "the same transformation relationally.  The reference never "
    "updates in place (K6 is delete-only) — standalone-engine surface",
)
def mirror_update(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_upd", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    # keep o_totalprice DECIMAL through the update: decimal * 1.1
    # rounds exactly on both engines (doubles hit .5-tie divergence)
    base = (
        load_table(spark, "orders", sf_dir)
        .filter("o_orderkey <= 5000")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(15,2)").alias(
                "o_totalprice"
            ),
            "o_orderstatus",
            "o_orderpriority",
        )
    )
    sink = DeltaSink(spark, path)
    sink.append(base.repartition(4))
    sink.update(
        "o_orderpriority = '1-URGENT'",
        {
            "o_totalprice":
                "cast(round(o_totalprice * 1.1, 2) as decimal(15,2))",
            "o_orderstatus": "'REPRICED'",
        },
    )
    return (
        DL.read_snapshot(spark, path)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderstatus",
        )
        .orderBy("o_orderkey")
    )


@query(
    "mirror_update_dv",
    """
    SELECT o_orderkey,
           CAST(CASE WHEN o_orderpriority = '1-URGENT'
                THEN ROUND(CAST(o_totalprice AS DECIMAL(15,2)) * 1.1, 2)
                ELSE CAST(o_totalprice AS DECIMAL(15,2)) END
                AS DOUBLE) AS o_totalprice,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN 'REPRICED' ELSE o_orderstatus END AS o_orderstatus
    FROM orders
    WHERE o_orderkey <= 5000
      AND NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 0)
    ORDER BY o_orderkey
    """,
    doc="merge-on-read UPDATE (round 8): matched rows join their "
    "file's DELETION VECTOR and only the post-update rows append — "
    "no touched file rewrites (the 100 TB shape; delta_sink.py "
    "update_dv).  The fixture first delete_dv's a row subset, so the "
    "update also proves already-deleted rows never resurrect as "
    "postimages.  Oracle recomputes both steps relationally",
)
def mirror_update_dv(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_udv", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    base = (
        load_table(spark, "orders", sf_dir)
        .filter("o_orderkey <= 5000")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(15,2)").alias(
                "o_totalprice"
            ),
            "o_orderstatus",
            "o_orderpriority",
        )
    )
    sink = DeltaSink(spark, path)
    sink.append(base.repartition(4))
    sink.delete_dv("o_orderstatus = 'F' AND o_orderkey % 10 = 0")
    sink.update_dv(
        "o_orderpriority = '1-URGENT'",
        {
            "o_totalprice":
                "cast(round(o_totalprice * 1.1, 2) as decimal(15,2))",
            "o_orderstatus": "'REPRICED'",
        },
    )
    return (
        DL.read_snapshot(spark, path)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderstatus",
        )
        .orderBy("o_orderkey")
    )


@query(
    "mirror_merge_dv",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey > 2000 THEN UPPER(c_name)
                ELSE c_name END AS c_name,
           CAST(CASE WHEN c_custkey > 2000
                THEN CAST(c_acctbal AS DECIMAL(12,2)) * 2
                ELSE CAST(c_acctbal AS DECIMAL(12,2)) END
                AS DOUBLE) AS c_acctbal
    FROM customer
    WHERE c_custkey > 100 AND c_custkey <= 4000
    ORDER BY c_custkey
    """,
    doc="merge-on-read MERGE (round 8): matched target rows join "
    "their file's deletion vector, source rows (updates + inserts) "
    "append as new files, delete_keys DV their rows in the SAME "
    "commit (delta_sink.py merge_dv).  Update slice 2000<k<=3000, "
    "insert slice 3000<k<=4000, delete k<=100 — one atomic commit; "
    "the oracle recomputes the upsert relationally",
)
def mirror_merge_dv(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_mdv", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal"),
    )
    sink = DeltaSink(spark, path)
    sink.append(cust.filter("c_custkey <= 3000").repartition(4))
    source = cust.filter("c_custkey > 2000 AND c_custkey <= 4000").select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        (F.col("c_acctbal") * 2).cast("decimal(12,2)").alias("c_acctbal"),
    )
    dels = cust.filter("c_custkey <= 100").select("c_custkey")
    sink.merge_dv(source, ["c_custkey"], delete_keys=dels)
    return (
        DL.read_snapshot(spark, path)
        .select(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy("c_custkey")
    )


@query(
    "mirror_identity_column",
    """
    SELECT n_nationkey, n_name,
           CAST(100 + 10 * (ROW_NUMBER()
                OVER (ORDER BY n_nationkey) - 1) AS BIGINT) AS rid
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="IDENTITY columns (PROTOCOL.md): add_identity_column records "
    "start/step/allowExplicitInsert field metadata + the "
    "identityColumns writer feature; the append assigns values via a "
    "pure-JVM shuffle-free interleave and advances "
    "delta.identity.highWaterMark in the same commit.  A single "
    "sorted input partition makes the assignment order-deterministic "
    "so the oracle can recompute it with ROW_NUMBER",
)
def mirror_identity_column(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_ident", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    sink = DeltaSink(spark, path)
    sink.append(
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name")
        .limit(0)
    )
    sink.add_identity_column("rid", start=100, step=10)
    sink.append(
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .coalesce(1)
    )
    return DL.read_snapshot(spark, path).orderBy("n_nationkey")


@query(
    "mirror_restore",
    """
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier WHERE s_suppkey <= 60
    ORDER BY s_suppkey
    """,
    doc="RESTORE TABLE TO VERSION (round 8, delta_sink.restore): two "
    "append commits, a copy-on-write DELETE that drops every third "
    "supplier, then restore(1) — one metadata commit whose adds/"
    "removes turn the head back into the pre-delete snapshot (the "
    "rewritten files drop out, the original files return).  The "
    "oracle is the full slice: hash-equality proves the restore "
    "resurrected exactly the deleted rows and nothing else",
)
def mirror_restore(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_restore", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    sup = (
        load_table(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_name", "s_nationkey")
        .filter("s_suppkey <= 60")
    )
    sink = DeltaSink(spark, path)
    sink.append(sup.filter("s_suppkey <= 30"))
    sink.append(sup.filter("s_suppkey > 30"))
    sink.delete("s_suppkey % 3 = 0")
    sink.restore(1)
    return DL.read_snapshot(spark, path).orderBy("s_suppkey")


@query(
    "mirror_vacuum",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority, TRUE AS gc_ran
    FROM orders WHERE o_orderkey <= 2000 AND o_orderstatus <> 'F'
    ORDER BY o_orderkey
    """,
    doc="VACUUM + metadata cleanup (round 8, delta_sink.vacuum): a "
    "checkpointed table whose copy-on-write DELETE stranded the "
    "original files; vacuum physically deletes the orphans AND "
    "truncates the pre-checkpoint commit JSONs, so the read that "
    "follows MUST replay checkpoint-then-tail (the A2/A3 path). "
    "gc_ran pins that both sweeps actually removed something; the "
    "row set pins that vacuum deleted only dead bytes",
)
def mirror_vacuum(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_vac", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    ords = (
        load_table(spark, "orders", sf_dir)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .filter("o_orderkey <= 2000")
    )
    sink = DeltaSink(spark, path, checkpoint_interval=2)
    sink.append(ords.filter("o_orderkey <= 1000").repartition(2))
    sink.append(ords.filter("o_orderkey > 1000").repartition(2))
    sink.delete("o_orderstatus = 'F'")
    stats = sink.vacuum()
    gc_ran = stats["data_files"] > 0 and stats["log_files"] > 0
    return (
        DL.read_snapshot(spark, path)
        .withColumn("gc_ran", F.lit(bool(gc_ran)))
        .orderBy("o_orderkey")
    )


@query(
    "mirror_shallow_clone",
    """
    SELECT p_partkey, p_name, p_size,
           (SELECT COUNT(*) FROM part WHERE p_partkey <= 800)
               AS src_rows
    FROM part WHERE p_partkey <= 800 AND p_size >= 20
    ORDER BY p_partkey
    """,
    doc="SHALLOW CLONE (round 8, delta_sink.shallow_clone): the "
    "clone's first commit references the source files by absolute "
    "path (zero copy), then a copy-on-write DELETE on the CLONE "
    "rewrites into the clone's own directory.  The result is the "
    "clone's survivors plus src_rows = the source's row count read "
    "AFTER the clone-side delete — hash-equality proves the clone "
    "diverged while the source stayed byte-identical",
)
def mirror_shallow_clone(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_clone", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    dst_path = os.path.join(workdir, "clone")
    part = (
        load_table(spark, "part", sf_dir)
        .select("p_partkey", "p_name", "p_size")
        .filter("p_partkey <= 800")
    )
    DeltaSink(spark, src_path).append(part.repartition(2))
    clone = DeltaSink.shallow_clone(spark, src_path, dst_path)
    clone.delete("p_size < 20")
    src_rows = DL.read_snapshot(spark, src_path).count()
    return (
        DL.read_snapshot(spark, dst_path)
        .withColumn("src_rows", F.lit(int(src_rows)).cast("bigint"))
        .orderBy("p_partkey")
    )


@query(
    "mirror_convert",
    """
    SELECT s_suppkey, s_name,
           CAST(s_nationkey AS BIGINT) AS s_nationkey
    FROM supplier WHERE s_nationkey <= 10
    ORDER BY s_suppkey
    """,
    doc="CONVERT TO DELTA (round 8, delta_sink.convert): a plain "
    "hive-partitioned parquet directory (written by Spark's own "
    "partitionBy) gains a Delta log in place — no file moves, every "
    "existing parquet listed with footer stats, k=v dirs becoming "
    "partition columns.  The partition-predicate read after "
    "conversion proves both the partition mapping and that pruning "
    "works from commit 0",
)
def mirror_convert(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_conv", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src = os.path.join(workdir, "plain")
    (
        load_table(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_name", "s_nationkey")
        .write.partitionBy("s_nationkey")
        .parquet(src)
    )
    DeltaSink.convert(spark, src)
    return (
        DL.read_snapshot(spark, src, predicate="s_nationkey <= 10")
        .select(
            "s_suppkey",
            "s_name",
            F.col("s_nationkey").cast("bigint").alias("s_nationkey"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "mirror_v2_checkpoint",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer WHERE c_custkey <= 900
    ORDER BY c_custkey
    """,
    doc="V2 checkpoints end-to-end (round 8, delta_sink._write_"
    "checkpoint_v2): a sink created with checkpoint_format='v2' "
    "writes the manifest+sidecar layout (v2Checkpoint reader+writer "
    "feature), and the vacuum that follows truncates every pre-"
    "checkpoint commit JSON — so this read has NO choice but to "
    "resolve the manifest, follow the sidecar references, and replay "
    "the JSON tail on top.  Hash-equality against the full slice "
    "proves the v2 path end to end",
)
def mirror_v2_checkpoint(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_v2ck", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    cust = (
        load_table(spark, "customer", sf_dir)
        .select("c_custkey", "c_name", "c_nationkey")
        .filter("c_custkey <= 900")
    )
    sink = DeltaSink(
        spark, path, checkpoint_interval=2, checkpoint_format="v2"
    )
    sink.append(cust.filter("c_custkey <= 300"))
    sink.append(cust.filter("c_custkey > 300 AND c_custkey <= 600"))
    sink.append(cust.filter("c_custkey > 600"))
    sink.vacuum()
    return DL.read_snapshot(spark, path).orderBy("c_custkey")


@query(
    "mirror_coordinated_read",
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
    doc="Coordinated-commits PARTIAL READ (round 8, delta_log.check_"
    "protocol_supported): the table's protocol declares "
    "catalogManaged (reader v3), and the coordinator's _delta_log/"
    "_commits directory holds a staged file for an ALREADY-"
    "backfilled version — a published duplicate per PROTOCOL.md's "
    "backfill rules.  The filesystem read serves the backfilled "
    "prefix exactly; only a visibly-unpublished tail refuses (pinned "
    "separately in test_r8_coordinated)",
)
def mirror_coordinated_read(spark, sf_dir):
    import json as _json

    from ..sources import delta_log as DL

    workdir = _workdir("mirror_coord", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    nat = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sink = DeltaSink(spark, path)
    sink.append(nat.filter("n_nationkey < 12"))
    sink.append(nat.filter("n_nationkey >= 12"))
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "%020d.json" % 2), "w") as f:
        f.write(
            _json.dumps(
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
        )
    staged = os.path.join(log, "_commits")
    os.makedirs(staged, exist_ok=True)
    with open(
        os.path.join(staged, "%020d.%s.json" % (2, "deadbeef-0042")), "w"
    ) as f:
        f.write("{}\n")
    return DL.read_snapshot(spark, path).orderBy("n_nationkey")


@query(
    "mirror_coordinated_tail",
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
    doc="Coordinated-commits TAIL READ (round 9, sources/coordinator "
    "+ delta_log._coordinated_tail): the table's metaData names the "
    "'filesystem' commit coordinator and its newest commit exists "
    "ONLY as a staged _delta_log/_commits/<v>.<uuid>.json — no plain "
    "backfilled spelling.  The registered coordinator client serves "
    "the ratified tail, list_commit_versions/_commit_file splice it "
    "in, and the snapshot includes the staged commit's rows.  An "
    "UNKNOWN coordinator keeps the round-8 fail-closed staleness "
    "refusal (pinned in test_r9_coordinated_tail)",
)
def mirror_coordinated_tail(spark, sf_dir):
    import json as _json
    import uuid as _uuid

    from ..sources import delta_log as DL

    workdir = _workdir("mirror_ctail", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    nat = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sink = DeltaSink(spark, path)
    sink.append(nat.filter("n_nationkey < 12"))                     # v0
    meta = DL.latest_metadata(spark, path)
    conf = dict(meta.get("configuration") or {})
    conf["delta.coordinatedCommits.commitCoordinator-preview"] = "filesystem"
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "%020d.json" % 1), "w") as f:       # v1
        f.write(
            _json.dumps(
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
            + _json.dumps({"metaData": {**meta, "configuration": conf}})
            + "\n"
        )
    # the tail: a REAL data commit staged by the coordinator, never
    # backfilled — authored via an aux table, parquet copied in
    aux = DeltaSink(spark, os.path.join(workdir, "aux"))
    aux.append(nat.filter("n_nationkey >= 12").coalesce(1))
    staged_dir = os.path.join(log, "_commits")
    os.makedirs(staged_dir, exist_ok=True)
    lines = []
    for a in DL._read_commit(aux.path, 0):
        if "add" in a:
            shutil.copy(
                os.path.join(aux.path, a["add"]["path"]),
                os.path.join(path, a["add"]["path"]),
            )
            lines.append(_json.dumps({"add": a["add"]}))
    with open(
        os.path.join(staged_dir, "%020d.%s.json" % (2, _uuid.uuid4())), "w"
    ) as f:
        f.write("\n".join(lines) + "\n")
    return DL.read_snapshot(spark, path).orderBy("n_nationkey")


@query(
    "mirror_coordinated_write",
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_regionkey <> 2 ORDER BY n_nationkey
    """,
    doc="Coordinated-commits WRITE path (round 9, DeltaSink "
    "coordinated_commits= + StagedCommitCoordinator): commits after "
    "the plain v0 bootstrap land as staged _delta_log/_commits/"
    "<v>.<uuid>.json files ratified by a TrackingCommitCoordinator — "
    "arbitration without filesystem conditional-create (the raw-S3 "
    "shape).  The snapshot reads THROUGH the registered client "
    "(append + row-level delete both live only in the staged tail), "
    "then backfill_commits publishes and the result must not change",
)
def mirror_coordinated_write(spark, sf_dir):
    from ..sources import coordinator as COORD
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_cwrite", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    name = f"mlkq-tracker-{os.path.basename(workdir)}"
    tracker = COORD.TrackingCommitCoordinator()
    COORD.register_commit_coordinator(name, tracker)
    try:
        nat = load_table(spark, "nation", sf_dir).select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        sink = DeltaSink(spark, path, coordinated_commits=name)
        sink.append(nat.filter("n_nationkey < 12"))        # v0 plain
        sink.append(nat.filter("n_nationkey >= 12"))       # v1 staged
        sink.delete("n_regionkey = 2")                     # v2 staged
        staged_rows = DL.read_snapshot(spark, path).count()
        sink.backfill_commits()
        out = DL.read_snapshot(spark, path)
        if out.count() != staged_rows:
            raise AssertionError(
                "backfill changed the snapshot row count"
            )
        return out.orderBy("n_nationkey")
    finally:
        COORD.unregister_commit_coordinator(name)


@query(
    "mirror_collated_read",
    """
    SELECT r_regionkey, r_name, 'ICU.UNICODE_CI' AS r_name_collation
    FROM region ORDER BY r_regionkey
    """,
    doc="Collations read-through (round 8, delta_log.collations_of): "
    "a collation-aware writer stamped r_name with __COLLATIONS "
    "metadata and the collations-preview reader feature.  Parquet "
    "string BYTES are collation-agnostic, so values read normally; "
    "the declared collation surfaces through the schema (returned "
    "here as a column) and collation-sensitive file skipping is "
    "disabled (plan-pinned in test_r8_collations)",
)
def mirror_collated_read(spark, sf_dir):
    import json as _json

    from ..sources import delta_log as DL

    workdir = _workdir("mirror_coll", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    reg = load_table(spark, "region", sf_dir).select(
        "r_regionkey", "r_name"
    )
    sink = DeltaSink(spark, path)
    sink.append(reg)
    meta = DL.latest_metadata(spark, path)
    schema = _json.loads(meta["schemaString"])
    for fld in schema["fields"]:
        if fld["name"] == "r_name":
            fld.setdefault("metadata", {})["__COLLATIONS"] = {
                "r_name": "ICU.UNICODE_CI"
            }
    head = DL.list_commit_versions(path)[-1]
    with open(
        os.path.join(path, "_delta_log", "%020d.json" % (head + 1)), "w"
    ) as fh:
        fh.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["collations-preview"],
                        "writerFeatures": ["collations-preview"],
                    }
                }
            )
            + "\n"
        )
        fh.write(
            _json.dumps(
                {"metaData": {**meta, "schemaString": _json.dumps(schema)}}
            )
            + "\n"
        )
    coll = DL.collations_of(DL.latest_metadata(spark, path))
    return (
        DL.read_snapshot(spark, path)
        .withColumn(
            "r_name_collation", F.lit(coll.get("r_name", "UTF8_BINARY"))
        )
        .orderBy("r_regionkey")
    )


@query(
    "mirror_column_defaults",
    """
    SELECT s_suppkey, s_name,
           CASE WHEN s_suppkey <= 30 THEN 'legacy' ELSE 'active' END
               AS status
    FROM supplier WHERE s_suppkey <= 60
    ORDER BY s_suppkey
    """,
    doc="Column DEFAULT values (round 8, delta_sink.set_column_"
    "default; PROTOCOL.md Default Columns / allowColumnDefaults "
    "writer feature): the first append supplies status='legacy' "
    "explicitly, SET DEFAULT 'active' lands CURRENT_DEFAULT field "
    "metadata, and the second append OMITS the column entirely — "
    "the writer fills it per row.  Existing rows keep their values "
    "(defaults affect future writes only); the oracle recomputes "
    "the split by key range",
)
def mirror_column_defaults(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_defaults", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    sup = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name"
    )
    sink = DeltaSink(spark, path)
    sink.append(
        sup.filter("s_suppkey <= 30").withColumn(
            "status", F.lit("legacy")
        )
    )
    sink.set_column_default("status", "'active'")
    sink.append(sup.filter("s_suppkey > 30 AND s_suppkey <= 60"))
    return DL.read_snapshot(spark, path).orderBy("s_suppkey")


@query(
    "mirror_drop_column",
    """
    SELECT s_suppkey, s_name,
           CAST(NULL AS DOUBLE) AS s_acctbal
    FROM supplier WHERE s_suppkey <= 40
    ORDER BY s_suppkey
    """,
    doc="ALTER TABLE DROP COLUMN via column mapping (round 8, "
    "delta_sink.evolve_drop): metadata-only drop of s_acctbal (data "
    "files keep their bytes), then a RE-ADD of the same name via "
    "evolve_add — the new field's col-<uuid> physical name "
    "guarantees the dropped bytes never resurrect, so every row "
    "reads NULL.  The oracle is the slice with a NULL column: "
    "hash-equality proves both the logical drop and the "
    "no-resurrection contract",
)
def mirror_drop_column(spark, sf_dir):
    import json as _json

    from ..sources import delta_log as DL

    workdir = _workdir("mirror_dropc", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    sup = (
        load_table(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_name", F.col("s_acctbal").cast("double"))
        .filter("s_suppkey <= 40")
    )
    sink = DeltaSink(spark, path)
    sink.append(sup)
    sink.evolve_drop(["s_acctbal"])
    meta = DL.latest_metadata(spark, path)
    schema = _json.loads(meta["schemaString"])
    schema["fields"].append(
        {
            "name": "s_acctbal",
            "type": "double",
            "nullable": True,
            "metadata": {},
        }
    )
    sink.evolve_add(_json.dumps(schema))
    return DL.read_snapshot(spark, path).orderBy("s_suppkey")


@query(
    "mirror_vacuum_retention",
    """
    SELECT o_orderkey, o_orderstatus, TRUE AS retained,
           CAST(COUNT(*) OVER () AS BIGINT) AS survivors
    FROM orders WHERE o_orderkey <= 1500 AND o_orderstatus <> 'F'
    ORDER BY o_orderkey
    """,
    doc="VACUUM RETAIN N HOURS (round 8, delta_sink.vacuum "
    "retention_hours): after a copy-on-write delete strands the "
    "original files, vacuum with a 168 h window deletes NO data "
    "(retained pins data_files == 0: every tombstone is in-window), "
    "so time travel to the checkpointed pre-delete version still "
    "reads the full slice — asserted inside the fixture (a mismatch "
    "raises, failing the gate).  Tombstone-free commit JSONs below "
    "the checkpoint still truncate (log retention is a separate "
    "knob, exactly like Delta's metadata cleanup)",
)
def mirror_vacuum_retention(spark, sf_dir):
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_vret", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    ords = (
        load_table(spark, "orders", sf_dir)
        .select("o_orderkey", "o_orderstatus")
        .filter("o_orderkey <= 1500")
    )
    n_before = ords.count()
    sink = DeltaSink(spark, path, checkpoint_interval=2)
    sink.append(ords.filter("o_orderkey <= 700").repartition(2))
    sink.append(ords.filter("o_orderkey > 700").repartition(2))
    sink.delete("o_orderstatus = 'F'")
    stats = sink.vacuum(retention_hours=168)
    retained = stats["data_files"] == 0
    n_v1 = DL.read_snapshot(spark, path, upto=1).count()
    if n_v1 != n_before:
        raise RuntimeError(
            f"time travel within the retention window broke: "
            f"v1 has {n_v1} rows, expected {n_before}"
        )
    cur = DL.read_snapshot(spark, path)
    return (
        cur.withColumn("retained", F.lit(bool(retained)))
        .withColumn("survivors", F.lit(int(cur.count())).cast("bigint"))
        .orderBy("o_orderkey")
    )


@query(
    "mirror_dv_stream_follow",
    """
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
    FROM supplier
    WHERE NOT (s_suppkey % 7 = 3) AND NOT (s_suppkey % 5 = 0)
    ORDER BY s_suppkey
    """,
    doc="Round-10 top ask: STREAMING through mid-stream deletion "
    "vectors.  A supplier-sliced Delta source takes two delete_dv "
    "commits (the second CHANGES the first file bitmaps); the "
    "mlk_delta streaming source in readChangeFeed mode synthesizes "
    "the bitmap DELTA as row-level delete rows "
    "(streaming/delta_source.py _commit_entries, shared semantics "
    "with delta_log.classify_mor_commit/prior_dv_descs), a real "
    "AvailableNow "
    "stream drains into a memory sink, and the query reconstructs "
    "the NET state from the change rows — which must hash-match the "
    "logical survivors.  Reference analogue surpassed: the "
    "reference's log tailer (DeltaTableGateway.cs:71-159) predates "
    "deletion vectors entirely",
)
def mirror_dv_stream_follow(spark, sf_dir):
    from ..streaming.delta_source import register_source

    workdir = _workdir("mirror_dvsf", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    sup = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"), "s_name"
    )
    sink = DeltaSink(spark, path)
    sink.append(sup.repartition(2))                     # v0: 2 files
    sink.delete_dv("s_suppkey % 7 = 3")                 # v1: DVs born
    sink.delete_dv("s_suppkey % 5 = 0")                 # v2: bitmaps CHANGE
    register_source(spark)
    qname = f"mlk_dvsf_{uuid.uuid4().hex[:12]}"
    q = (
        spark.readStream.format("mlk_delta")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .start()
    )
    q.awaitTermination()  # availableNow self-terminates; no timeout
    # that could silently hash a partially-drained sink
    # net-state reconstruction from the streamed change rows: a row
    # survives iff its inserts outnumber its deletes
    return (
        spark.table(qname)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("_alive")
        )
        .filter("_alive > 0")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "mirror_stream_replicate",
    """
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
    FROM supplier
    WHERE NOT (s_suppkey % 4 = 1) AND NOT (s_suppkey % 9 = 5)
    ORDER BY s_suppkey
    """,
    doc="Round-11 top ask: continuous ROW-LEVEL replication.  A "
    "supplier-sliced Delta source takes delete_dv, update_dv, RESTORE "
    "(undoing the update), and a further delete_dv; StreamReplica "
    "(pipeline/stream_replica.py) consumes the readChangeFeed stream "
    "with changeRowIds positional identity and maintains a live "
    "replica via foreachBatch MERGE — net-last change per (file, "
    "row-index), upserts + whenMatchedDelete in ONE atomic commit "
    "carrying the epoch txn marker.  The replica must hash-match the "
    "logical survivors.  Reference analogue surpassed: the batch "
    "pipeline's remove handling (BlobLoadingOrchestration.cs:117-138) "
    "now has a streaming twin WITH deletes; the reference has neither "
    "row-level change capture nor streaming replication",
)
def mirror_stream_replicate(spark, sf_dir):
    from ..pipeline.stream_replica import StreamReplica

    workdir = _workdir("mirror_repl", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    sup = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"), "s_name"
    )
    sink = DeltaSink(spark, src_path)
    sink.append(sup.repartition(2))                        # v0: 2 files
    sink.delete_dv("s_suppkey % 4 = 1")                    # v1: MOR delete
    sink.update_dv(
        "s_suppkey % 6 = 2", {"s_name": "concat(s_name, '_upd')"}
    )                                                      # v2: MOR update
    sink.restore(1)                                        # v3: undo v2
    sink.delete_dv("s_suppkey % 9 = 5")                    # v4
    rep = StreamReplica(
        spark,
        src_path,
        os.path.join(workdir, "replica"),
        os.path.join(workdir, "ckpt"),
    )
    rep.run_until_idle()
    return (
        rep.replica_df()
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "mirror_stream_replicate_cdf",
    """
    WITH base AS (
      SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
      FROM supplier
    ),
    merged AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 6 = 2 THEN s_name || '_m'
                  ELSE s_name END AS s_name
      FROM base
      WHERE NOT (s_suppkey % 9 = 4)
      UNION ALL
      SELECT CAST(1000000007 AS BIGINT), 'new_supplier'
    )
    SELECT s_suppkey, s_name FROM merged
    WHERE NOT (s_suppkey % 7 = 3)
    ORDER BY s_suppkey
    """,
    doc="Round-12 top ask: replicating a CDF-ENABLED source.  The "
    "source table sets delta.enableChangeDataFeed, so its MERGE "
    "writes _change_data files carrying all four change types "
    "(update_preimage / update_postimage / insert / delete) as row "
    "VALUES — no positional identity exists, and changeRowIds "
    "refuses such commits loudly.  StreamReplica(key_cols=) "
    "(pipeline/stream_replica.py) instead merges on the business "
    "key: postimage/insert upsert, preimage/delete delete, netted "
    "per key per batch; a CoW delete commit follows through the "
    "same feed.  The replica must hash-match the logical final "
    "state.  Reference analogue: the batch remove handling "
    "(BlobLoadingOrchestration.cs:117-138) has no CDF restriction; "
    "now neither does the streaming twin",
)
def mirror_stream_replicate_cdf(spark, sf_dir):
    from ..pipeline.stream_replica import StreamReplica

    workdir = _workdir("mirror_replcdf", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    src_path = os.path.join(workdir, "src")
    sup = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"), "s_name"
    )
    sink = DeltaSink(spark, src_path)
    sink.append(sup.repartition(2))                          # v0: 2 files
    sink.set_properties(
        {"delta.enableChangeDataFeed": "true"}
    )                                                        # v1: CDF on
    # v2: ONE MERGE commit staging all four cdc change types.  The
    # upsert keys (s_suppkey % 6 = 2 → ≡2 mod 3) and delete keys
    # (s_suppkey % 9 = 4 → ≡1 mod 3) are disjoint by construction
    # (merge's upsert∩delete contract).
    ups = sup.filter("s_suppkey % 6 = 2").withColumn(
        "s_name", F.concat(F.col("s_name"), F.lit("_m"))
    )
    new_row = spark.sql(
        "SELECT CAST(1000000007 AS BIGINT) AS s_suppkey, "
        "'new_supplier' AS s_name"
    )
    sink.merge(
        ups.unionByName(new_row),
        key_cols=["s_suppkey"],
        delete_keys=sup.filter("s_suppkey % 9 = 4").select("s_suppkey"),
    )
    sink.delete("s_suppkey % 7 = 3")                         # v3: CoW cdc
    rep = StreamReplica(
        spark,
        src_path,
        os.path.join(workdir, "replica"),
        os.path.join(workdir, "ckpt"),
        key_cols=["s_suppkey"],
    )
    rep.run_until_idle()
    return (
        rep.replica_df()
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "mirror_catalog_managed_read",
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
    doc="catalogManaged READ through the coordinator-client seam "
    "(round 10): the table's protocol advertises the catalogManaged "
    "reader feature but its metaData carries NO coordinator name — "
    "the managing catalog is out-of-band, exactly the spec's shape.  "
    "The application binds the path to a registered client "
    "(coordinator.register_catalog_table) and the newest commit, "
    "which exists ONLY as a staged _staged_commits/<v>.<uuid>.json "
    "ratified by the catalog, splices into the snapshot.  An UNBOUND "
    "table keeps the fail-closed staleness refusal (pinned in "
    "test_r10_catalog_managed).  Reference analogue surpassed: "
    "TransactionLogEntry.cs:341-342 throws on any unrecognized log "
    "shape",
)
def mirror_catalog_managed_read(spark, sf_dir):
    import json as _json
    import uuid as _uuid

    from ..sources import coordinator as COORD
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_catmg", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    nat = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sink = DeltaSink(spark, path)
    sink.append(nat.filter("n_nationkey < 12"))                     # v0
    meta = DL.latest_metadata(spark, path)
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "%020d.json" % 1), "w") as f:       # v1
        f.write(
            _json.dumps(
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
            + _json.dumps({"metaData": meta})
            + "\n"
        )
    # the catalog-owned tail: a REAL data commit staged, never
    # backfilled — only the catalog knows it is ratified
    aux = DeltaSink(spark, os.path.join(workdir, "aux"))
    aux.append(nat.filter("n_nationkey >= 12").coalesce(1))
    staged_dir = os.path.join(log, "_staged_commits")
    os.makedirs(staged_dir, exist_ok=True)
    lines = []
    for a in DL._read_commit(aux.path, 0):
        if "add" in a:
            shutil.copy(
                os.path.join(aux.path, a["add"]["path"]),
                os.path.join(path, a["add"]["path"]),
            )
            lines.append(_json.dumps({"add": a["add"]}))
    rel = "_staged_commits/%020d.%s.json" % (2, _uuid.uuid4())
    with open(os.path.join(log, *rel.split("/")), "w") as f:
        f.write("\n".join(lines) + "\n")
    cat_name = f"mlkq-catalog-{os.path.basename(workdir)}"
    catalog = COORD.TrackingCommitCoordinator()
    catalog.ratify(path, 2, rel)
    COORD.register_commit_coordinator(cat_name, catalog)
    COORD.register_catalog_table(path, cat_name)
    try:
        out = DL.read_snapshot(spark, path)
        n = out.count()  # materialize THROUGH the binding
        if n != nat.count():
            raise AssertionError(
                f"catalog-managed read returned {n} rows"
            )
    finally:
        COORD.unregister_catalog_table(path)
        COORD.unregister_commit_coordinator(cat_name)
    return out.orderBy("n_nationkey")


@query(
    "mirror_collated_sort",
    """
    WITH t AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 2 = 0 THEN lower(n_name)
                  ELSE n_name END AS nm
      FROM nation
    )
    SELECT nm,
           CAST(ROW_NUMBER() OVER (ORDER BY lower(nm), nm) AS BIGINT) AS rk,
           (lower(nm) = 'argentina') AS eq_ci
    FROM t ORDER BY rk
    """,
    doc="Collation-HONORING comparators (round-10 VERDICT ask #5, "
    "extending the r8 read-through): the table declares "
    "SPARK.UTF8_LCASE on its name column via __COLLATIONS; "
    "StructType.fromJson parses that into Spark 4's NATIVE collated "
    "string type, and read_snapshot scans with that schema — sorts, "
    "window orderings, and equality comparisons then run under the "
    "DECLARED collation inside Catalyst, no lower() rewrites in the "
    "query.  The fixture mixes case so binary and collated orders "
    "DIFFER (uppercase sorts before lowercase in binary); the rank "
    "column hash-pins the collated order and eq_ci pins "
    "case-insensitive equality against an uppercase-stored value.  "
    "ICU-independent oracle: UTF8_LCASE == lower()+binary for ASCII",
)
def mirror_collated_sort(spark, sf_dir):
    import json as _json

    from pyspark.sql import Window

    from ..sources import delta_log as DL

    workdir = _workdir("mirror_collsort", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    nat = load_table(spark, "nation", sf_dir).select(
        "n_nationkey",
        F.when(
            F.col("n_nationkey") % 2 == 0, F.lower("n_name")
        ).otherwise(F.col("n_name")).alias("nm"),
    )
    sink = DeltaSink(spark, path)
    sink.append(nat)
    meta = DL.latest_metadata(spark, path)
    schema = _json.loads(meta["schemaString"])
    for fld in schema["fields"]:
        if fld["name"] == "nm":
            fld.setdefault("metadata", {})["__COLLATIONS"] = {
                "nm": "SPARK.UTF8_LCASE"
            }
    head = DL.list_commit_versions(path)[-1]
    with open(
        os.path.join(path, "_delta_log", "%020d.json" % (head + 1)), "w"
    ) as fh:
        fh.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["collations-preview"],
                        "writerFeatures": ["collations-preview"],
                    }
                }
            )
            + "\n"
            + _json.dumps(
                {"metaData": {**meta, "schemaString": _json.dumps(schema)}}
            )
            + "\n"
        )
    df = DL.read_snapshot(spark, path)
    # nm reads as a COLLATED string: orderBy/= compare under UTF8_LCASE
    w = Window.orderBy(
        F.col("nm"), F.collate(F.col("nm"), "UTF8_BINARY")
    )
    return (
        df.select(
            "nm",
            F.row_number().over(w).cast("bigint").alias("rk"),
            (F.col("nm") == F.lit("argentina")).alias("eq_ci"),
        )
        .select(
            F.col("nm").cast("string").alias("nm"), "rk", "eq_ci"
        )
        .orderBy("rk")
    )


@query(
    "mirror_collated_skip",
    """
    WITH t AS (
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             CASE WHEN c_custkey <= 50 THEN upper(c_name)
                  ELSE lower(c_name) END AS nm
      FROM customer WHERE c_custkey <= 100
    )
    SELECT c_custkey, nm FROM t
    WHERE lower(nm) = 'customer#000000007'
    ORDER BY c_custkey
    """,
    doc="Collation-AWARE file skipping (round-11 VERDICT ask #2).  Two "
    "case-clustered files (keys<=50 uppercased, rest lowercased) under "
    "a declared SPARK.UTF8_LCASE column: an equality predicate in a "
    "different case must still MATCH (collation honored) while the "
    "metadata pruner drops the other file via the case-variant hull "
    "test (sources/skipping.py _Conjunct._eq_keep — binary min/max "
    "intersected with the two per-first-char-case variant intervals; "
    "round 8 disabled pruning on collated columns wholesale, which "
    "full-scans at 100 TB).  The query RAISES if pruning fails, so the "
    "oracle match certifies both correctness and the prune.  ICU "
    "collations stay non-prunable (test_r11_collation_skipping)",
)
def mirror_collated_skip(spark, sf_dir):
    import json as _json

    from ..sources import delta_log as DL
    from ..sources.skipping import prune_files
    from pyspark.sql.types import StructType as _St

    workdir = _workdir("mirror_collskip", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"), "c_name"
    ).filter("c_custkey <= 100")
    sink = DeltaSink(spark, path)
    sink.append(
        cust.filter("c_custkey <= 50")
        .withColumn("nm", F.upper("c_name"))
        .drop("c_name")
        .coalesce(1)
    )
    sink.append(
        cust.filter("c_custkey > 50")
        .withColumn("nm", F.lower("c_name"))
        .drop("c_name")
        .coalesce(1)
    )
    meta = DL.latest_metadata(spark, path)
    schema = _json.loads(meta["schemaString"])
    for fld in schema["fields"]:
        if fld["name"] == "nm":
            fld.setdefault("metadata", {})["__COLLATIONS"] = {
                "nm": "SPARK.UTF8_LCASE"
            }
    head = DL.list_commit_versions(path)[-1]
    with open(
        os.path.join(path, "_delta_log", "%020d.json" % (head + 1)), "w"
    ) as fh:
        fh.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["collations-preview"],
                        "writerFeatures": ["collations-preview"],
                    }
                }
            )
            + "\n"
            + _json.dumps(
                {"metaData": {**meta, "schemaString": _json.dumps(schema)}}
            )
            + "\n"
        )
    pred = "nm = 'customer#000000007'"
    # metadata-layer certificate: the pruner must drop the lowercase
    # file (its case-variant hulls are disjoint from the literal's)
    meta2 = DL.latest_metadata(spark, path)
    files = DL.snapshot_files(spark, path)
    kept = prune_files(
        files,
        pred,
        _St.fromJson(_json.loads(meta2["schemaString"])),
        collations=DL.collations_of(meta2),
    )
    if not (len(files) == 2 and len(kept) == 1):
        raise RuntimeError(
            f"collated pruning regressed: kept {len(kept)} of "
            f"{len(files)} files"
        )
    return (
        DL.read_snapshot(spark, path, predicate=pred)
        .select(
            "c_custkey", F.col("nm").cast("string").alias("nm")
        )
        .orderBy("c_custkey")
    )


@query(
    "mirror_catalog_managed_write",
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_regionkey <> 2 ORDER BY n_nationkey
    """,
    doc="catalogManaged WRITE path (round 10, DeltaSink "
    "catalog_managed=True): the managing catalog comes from the "
    "path binding (coordinator.register_catalog_table) — the metaData "
    "carries NO coordinator name, exactly the spec's out-of-band "
    "shape; the v0 bootstrap advertises the catalogManaged "
    "reader+writer feature so unbound filesystem readers fail "
    "closed.  Append + row-level delete land only in the "
    "catalog-ratified staged tail, the snapshot reads THROUGH the "
    "binding, then backfill_commits publishes and the result must "
    "not change.  Completes the round-10 read side "
    "(mirror_catalog_managed_read)",
)
def mirror_catalog_managed_write(spark, sf_dir):
    from ..sources import coordinator as COORD
    from ..sources import delta_log as DL

    workdir = _workdir("mirror_cmwrite", sf_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    path = os.path.join(workdir, "t")
    name = f"mlkq-catalog-w-{os.path.basename(workdir)}"
    COORD.register_commit_coordinator(name, COORD.TrackingCommitCoordinator())
    COORD.register_catalog_table(path, name)
    try:
        nat = load_table(spark, "nation", sf_dir).select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        sink = DeltaSink(spark, path, catalog_managed=True)
        sink.append(nat.filter("n_nationkey < 12"))        # v0 plain
        sink.append(nat.filter("n_nationkey >= 12"))       # v1 staged
        sink.delete("n_regionkey = 2")                     # v2 staged
        staged_rows = DL.read_snapshot(spark, path).count()
        sink.backfill_commits()
        out = DL.read_snapshot(spark, path)
        if out.count() != staged_rows:
            raise AssertionError(
                "backfill changed the snapshot row count"
            )
        return out.orderBy("n_nationkey")
    finally:
        COORD.unregister_catalog_table(path)
        COORD.unregister_commit_coordinator(name)
