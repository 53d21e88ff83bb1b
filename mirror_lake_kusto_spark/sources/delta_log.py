"""Delta transaction-log reader in pure PySpark (SURVEY §2.A rows A1-A5).

Re-expresses the reference's hand-rolled log machinery Spark-first:

- A1 JSON commit scan   (TransactionLogEntry.cs:123-172)  ->
  ``spark.read.schema(...).json`` over ``_delta_log/*.json`` with the
  commit txId regex-extracted from the file name (A5,
  DeltaTableGateway.cs:247-262).
- A2 checkpoint scan    (TransactionLogEntry.cs:365-398)  ->
  ``spark.read.parquet`` — Spark decodes the nested add/remove structs
  natively (the reference spends ~190 LoC reassembling repetition
  levels by hand; Catalyst's vectorized reader does it for free).
- A3 ``_last_checkpoint`` pointer (DeltaTableGateway.cs:20-26,264-283).
- O1 checkpoint-based log pruning (DeltaTableGateway.cs:71-122): read
  the checkpoint plus only trailing JSON commits.
- C1 add/remove cancellation within a segment
  (Storage/TransactionLog.cs:84-98): two ``left_anti`` joins.
- Log replay to a snapshot: per-path argmax(txId) keeps the last action
  for every file; files whose last action is an add are active — the
  DataFrame twin of snapshot diffing (TransactionLog.cs:116-164).

Everything here is metadata-scale (file listings, not data); the
actions DataFrame distributes fine when a 100 TB table's checkpoint has
millions of add entries.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_FORMAT = StructType(
    [
        StructField("provider", StringType()),
        StructField("options", MapType(StringType(), StringType())),
    ]
)
METADATA_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("format", _FORMAT),
        StructField("schemaString", StringType()),
        StructField("partitionColumns", ArrayType(StringType())),
        StructField("configuration", MapType(StringType(), StringType())),
        StructField("createdTime", LongType()),
    ]
)
ADD_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("partitionValues", MapType(StringType(), StringType())),
        StructField("size", LongType()),
        StructField("modificationTime", LongType()),
        StructField("dataChange", BooleanType()),
        StructField("stats", StringType()),
    ]
)
REMOVE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("deletionTimestamp", LongType()),
        StructField("dataChange", BooleanType()),
        StructField("partitionValues", MapType(StringType(), StringType())),
    ]
)
PROTOCOL_SCHEMA = StructType(
    [
        StructField("minReaderVersion", LongType()),
        StructField("minWriterVersion", LongType()),
    ]
)
TXN_SCHEMA = StructType(
    [
        StructField("appId", StringType()),
        StructField("version", LongType()),
        StructField("lastUpdated", LongType()),
    ]
)
ACTIONS_SCHEMA = StructType(
    [
        StructField("metaData", METADATA_SCHEMA),
        StructField("add", ADD_SCHEMA),
        StructField("remove", REMOVE_SCHEMA),
        StructField("protocol", PROTOCOL_SCHEMA),
        StructField("txn", TXN_SCHEMA),
    ]
)

_TX_RE = r"(\d{20})\.(?:json|checkpoint\.parquet)$"


def log_dir(table_path: str) -> str:
    return os.path.join(table_path, "_delta_log")


def list_commit_versions(table_path: str) -> list[int]:
    """A4/A5: enumerate JSON commit txIds from blob names."""
    d = log_dir(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.endswith(".json") and len(name) == 25 and name[:20].isdigit():
            out.append(int(name[:20]))
    return sorted(out)


def read_last_checkpoint(table_path: str) -> int | None:
    """A3: the ``_last_checkpoint`` JSON pointer -> checkpoint txId."""
    p = os.path.join(log_dir(table_path), "_last_checkpoint")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return int(json.load(f)["version"])


def read_actions(
    spark: SparkSession,
    table_path: str,
    after: int = -1,
    upto: int | None = None,
    use_checkpoint: bool = True,
) -> DataFrame:
    """All log actions with their commit ``tx_id``, pruned via the
    checkpoint when one covers the requested range (O1)."""
    versions = [v for v in list_commit_versions(table_path) if v > after]
    if upto is not None:
        versions = [v for v in versions if v <= upto]
    ckpt_version = read_last_checkpoint(table_path) if use_checkpoint else None
    srcs: list[DataFrame] = []
    d = log_dir(table_path)
    if (
        ckpt_version is not None
        and after < 0
        and (upto is None or ckpt_version <= upto)
    ):
        ckpt_path = os.path.join(d, f"{ckpt_version:020d}.checkpoint.parquet")
        ckpt = spark.read.parquet(ckpt_path)
        for col in ("metaData", "add", "remove", "protocol", "txn"):
            if col not in ckpt.columns:
                ckpt = ckpt.withColumn(col, F.lit(None).cast(ACTIONS_SCHEMA[col].dataType))
        srcs.append(
            ckpt.select("metaData", "add", "remove", "protocol", "txn").withColumn(
                "tx_id", F.lit(ckpt_version)
            )
        )
        versions = [v for v in versions if v > ckpt_version]
    if versions:
        paths = [os.path.join(d, f"{v:020d}.json") for v in versions]
        srcs.append(
            spark.read.schema(ACTIONS_SCHEMA)
            .json(paths)
            .withColumn(
                "tx_id",
                F.regexp_extract(F.input_file_name(), _TX_RE, 1).cast("long"),
            )
        )
    if not srcs:
        return spark.createDataFrame(
            [], StructType([*ACTIONS_SCHEMA.fields, StructField("tx_id", LongType())])
        )
    out = srcs[0]
    for s in srcs[1:]:
        out = out.unionByName(s)
    return out


def latest_metadata(
    spark: SparkSession, table_path: str, upto: int | None = None
) -> dict[str, Any] | None:
    """Latest metaData action ≤ upto (schema + partition columns) — F3's
    'latest schema at txId' (TableStatus.cs:99-106)."""
    acts = read_actions(spark, table_path, upto=upto)
    rows = (
        acts.filter(F.col("metaData").isNotNull())
        .orderBy(F.desc("tx_id"))
        .limit(1)
        .collect()
    )
    return rows[0]["metaData"].asDict(recursive=True) if rows else None


def file_actions(
    spark: SparkSession,
    table_path: str,
    after: int = -1,
    upto: int | None = None,
    use_checkpoint: bool = True,
) -> DataFrame:
    """Normalized add/remove stream: one row per action with
    ``(tx_id, path, is_add, partitionValues, size, numRecords,
    dataChange, modificationTime)``; numRecords parsed from add.stats
    (H7, TransactionLogEntry.cs:345-361)."""
    acts = read_actions(spark, table_path, after, upto, use_checkpoint)
    adds = acts.filter(F.col("add").isNotNull()).select(
        "tx_id",
        F.col("add.path").alias("path"),
        F.lit(True).alias("is_add"),
        F.col("add.partitionValues").alias("partitionValues"),
        F.col("add.size").alias("size"),
        F.get_json_object("add.stats", "$.numRecords").cast("long").alias("numRecords"),
        F.col("add.dataChange").alias("dataChange"),
        F.col("add.modificationTime").alias("modificationTime"),
    )
    removes = acts.filter(F.col("remove").isNotNull()).select(
        "tx_id",
        F.col("remove.path").alias("path"),
        F.lit(False).alias("is_add"),
        F.col("remove.partitionValues").alias("partitionValues"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("long").alias("numRecords"),
        F.col("remove.dataChange").alias("dataChange"),
        F.col("remove.deletionTimestamp").alias("modificationTime"),
    )
    return adds.unionByName(removes)


def coalesced_segment(
    spark: SparkSession, table_path: str, after: int, upto: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """C1: merge commits (after, upto] into one batch; paths both added
    AND removed inside the span cancel (compaction/OPTIMIZE churn never
    reaches the sink — O2).  Returns (adds, removes) DataFrames."""
    seg = file_actions(spark, table_path, after=after, upto=upto, use_checkpoint=False)
    adds = seg.filter("is_add")
    removes = seg.filter("NOT is_add")
    live_adds = adds.join(removes.select("path"), "path", "left_anti")
    live_removes = removes.join(adds.select("path"), "path", "left_anti")
    return live_adds, live_removes


def snapshot_files(
    spark: SparkSession, table_path: str, upto: int | None = None
) -> list[dict[str, Any]]:
    """Log replay: active files at version ``upto`` (default: latest).
    Per-path argmax(tx_id) — the D3 arg_max pattern applied to the log
    itself."""
    fa = file_actions(spark, table_path, upto=upto)
    latest = (
        fa.groupBy("path")
        .agg(
            F.max_by(
                F.struct("is_add", "partitionValues", "size", "numRecords"),
                F.struct("tx_id", F.col("is_add").cast("int")),
            ).alias("last")
        )
        .filter(F.col("last.is_add"))
        .select(
            "path",
            F.col("last.partitionValues").alias("partitionValues"),
            F.col("last.size").alias("size"),
            F.col("last.numRecords").alias("numRecords"),
        )
    )
    return [r.asDict(recursive=True) for r in latest.collect()]


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    upto: int | None = None,
    partition_predicate: str | None = None,
) -> DataFrame:
    """Current table contents.  Files are read grouped by partition
    tuple with the partition values injected as typed literal columns —
    the reference's ConstValue ingestion mapping (A7/O6,
    BlobStagingOrchestration.cs:291-308): partition columns are never
    stored in the data files.

    ``partition_predicate`` (SQL over partition columns only) prunes
    whole partition groups BEFORE any data file is opened — classic
    partition pruning, evaluated once per distinct tuple on a
    metadata-sized DataFrame."""
    files = snapshot_files(spark, table_path, upto=upto)
    meta = latest_metadata(spark, table_path, upto=upto)
    if partition_predicate is not None and files and meta is not None:
        files = _prune_partitions(spark, files, meta, partition_predicate)
    if not files or meta is None:
        return spark.createDataFrame(
            [],
            StructType.fromJson(json.loads(meta["schemaString"]))
            if meta
            else StructType([]),
        )
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    type_of = {f.name: f.dataType for f in schema.fields}

    groups: dict[tuple, list[str]] = {}
    for f in files:
        key = tuple(sorted((f["partitionValues"] or {}).items()))
        groups.setdefault(key, []).append(
            os.path.join(table_path, f["path"])
        )
    parts: list[DataFrame] = []
    for key, paths in groups.items():
        df = spark.read.parquet(*paths)
        for col_name, raw in key:
            df = df.withColumn(
                col_name, F.lit(raw).cast(type_of.get(col_name, StringType()))
            )
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _prune_partitions(
    spark: SparkSession,
    files: list[dict[str, Any]],
    meta: dict[str, Any],
    predicate: str,
) -> list[dict[str, Any]]:
    """Keep only the files whose partition tuple satisfies ``predicate``
    (evaluated typed, one row per distinct tuple — never touches data)."""
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    if not part_cols:
        return files
    type_of = {f.name: f.dataType for f in schema.fields}
    tuples = sorted({tuple((f["partitionValues"] or {}).get(c) for c in part_cols) for f in files})
    # raw strings ride along untyped so the kept-set keys match the
    # add-action partitionValues exactly (no cast-then-format drift)
    raw_cols = [f"_raw_{i}" for i in range(len(part_cols))]
    df = spark.createDataFrame(
        [list(t) * 2 for t in tuples],
        ", ".join(f"{c} string" for c in [*part_cols, *raw_cols]),
    )
    for c in part_cols:
        df = df.withColumn(c, F.col(c).cast(type_of.get(c, StringType())))
    kept = {
        tuple(r[rc] for rc in raw_cols) for r in df.filter(predicate).collect()
    }
    return [
        f
        for f in files
        if tuple((f["partitionValues"] or {}).get(c) for c in part_cols) in kept
    ]


def partition_subdir(part_values: dict[str, str]) -> str:
    """Hive-style ``k=v/..`` relative dir for a partition tuple."""
    return "/".join(f"{k}={v}" for k, v in sorted(part_values.items()))


def typed_partition_cols(spark: SparkSession, table_path: str) -> dict[str, Any]:
    """partition column name -> Spark DataType, from the table schema."""
    meta = latest_metadata(spark, table_path)
    if meta is None:
        return {}
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = set(meta.get("partitionColumns") or [])
    return {f.name: f.dataType for f in schema.fields if f.name in part_cols}


def reconciled_actions(spark: SparkSession, table_path: str) -> DataFrame:
    """Checkpoint content: active adds + latest metaData + protocol,
    in the standard checkpoint column layout."""
    meta = latest_metadata(spark, table_path)
    files = snapshot_files(spark, table_path)
    blank = {"metaData": None, "add": None, "remove": None, "protocol": None, "txn": None}
    acts: list[dict] = [{**blank, "metaData": meta}]
    acts.append({**blank, "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
    # carry forward the latest txn version per appId (Delta checkpoints
    # retain txn actions so idempotent-writer recovery survives log
    # truncation)
    txns = (
        read_actions(spark, table_path)
        .filter(F.col("txn").isNotNull())
        .groupBy("txn.appId")
        .agg(F.max("txn.version").alias("version"))
        .collect()
    )
    for t in txns:
        acts.append(
            {**blank, "txn": {"appId": t["appId"], "version": t["version"], "lastUpdated": 0}}
        )
    for f in files:
        acts.append(
            {
                **blank,
                "add": {
                    "path": f["path"],
                    "partitionValues": f["partitionValues"] or {},
                    "size": f["size"],
                    "modificationTime": 0,
                    "dataChange": False,
                    "stats": json.dumps({"numRecords": f["numRecords"]})
                    if f["numRecords"] is not None
                    else None,
                },
            }
        )
    return spark.createDataFrame(acts, ACTIONS_SCHEMA)


def last_txn_version(spark: SparkSession, table_path: str, app_id: str) -> int | None:
    """Latest committed ``txn`` version for an idempotent writer —
    exactly-once recovery reads this instead of trusting its own state
    (I3; the Delta analogue of the reference's restart re-detection,
    DeltaTableOrchestration.cs:76-81)."""
    row = (
        read_actions(spark, table_path)
        .filter(F.col("txn.appId") == app_id)
        .agg(F.max("txn.version").alias("v"))
        .first()
    )
    return row["v"] if row else None
