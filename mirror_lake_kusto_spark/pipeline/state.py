"""TransactionItem state store (SURVEY §1.2 state schema, A8/A9/A11/A12,
D3/D4, O10).

The reference persists mirroring state as an append-only CSV blob of
``TransactionItem`` rows — last-writer-wins per item key — compacted by
rewriting the whole file (Storage/GlobalTableStatus.cs:19,112-180,
CheckpointGateway.cs:46,87-104, TransactionItem.cs:24).  Faithful
Spark shape:

- each flush appends one CSV file ``ix_<seq>_<uuid>.csv`` to the state
  dir (the append-blob block analogue; ``seq`` gives the total write
  order the reference gets from block order);
- the current view is ``arg_max(seq) by item key`` — the same D3/D4
  dedup the reference runs both client-side (GroupBy…Last) and
  server-side (KQL ``arg_max(MirrorTimestamp, *)``,
  DatabaseGateway.cs:93) — computed as a Spark window so it scales to
  millions of items without driver memory (the reference's in-memory
  item list is its scaling ceiling; SURVEY §7.4);
- ``compact()`` rewrites one CSV + deletes the old files
  (GlobalTableStatus.cs:210-222's temp-blob + atomic-rename dance).

Item columns mirror TransactionItem.cs:24; the ``dynamic`` (JSON-in-
cell) columns stay JSON strings, parsed with ``from_json`` on demand
(H6).
"""

from __future__ import annotations

import csv
import os
import uuid
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

COLUMNS = [
    "table_name",
    "start_tx_id",
    "end_tx_id",
    "action",  # Schema | StagingTable | Add | Remove
    "state",  # Initial | Analyzed | Skipped | Staged | Done
    "mirror_timestamp",
    "delta_timestamp",
    "blob_path",
    "partition_values",  # JSON
    "size",
    "record_count",
    "partition_columns",  # JSON
    "schema",  # JSON
    "internal_state",  # JSON
]
_CSV_SCHEMA = (
    "table_name STRING, start_tx_id LONG, end_tx_id LONG, action STRING, "
    "state STRING, mirror_timestamp STRING, delta_timestamp STRING, "
    "blob_path STRING, partition_values STRING, size LONG, "
    "record_count LONG, partition_columns STRING, schema STRING, "
    "internal_state STRING"
)
# item identity (GetItemKey analogue, GlobalTableStatus.cs:72-74)
KEY = ["table_name", "start_tx_id", "end_tx_id", "action", "blob_path"]

COMPLETE_STATES = ("Done", "Skipped")


class StateStore:
    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # -- writes -------------------------------------------------------------

    def _next_seq(self) -> int:
        seqs = [int(n[3:13]) for n in os.listdir(self.dir) if n.startswith("ix_")]
        return (max(seqs) + 1) if seqs else 0

    def persist(self, items: list[dict[str, Any]]) -> None:
        """Append one CSV of item rows (state transitions are new rows
        for the same key — never in-place updates; A11)."""
        if not items:
            return
        seq = self._next_seq()
        path = os.path.join(self.dir, f"ix_{seq:010d}_{uuid.uuid4().hex}.csv")
        with open(path, "x", newline="") as f:
            w = csv.DictWriter(f, fieldnames=COLUMNS)
            w.writeheader()
            for it in items:
                w.writerow({c: it.get(c) for c in COLUMNS})

    def compact(self) -> None:
        """Rewrite the LWW view as a single file, drop history (A12)."""
        rows = [r.asDict() for r in self.status_df().collect()]
        old = [n for n in os.listdir(self.dir) if n.startswith("ix_")]
        tmp = os.path.join(self.dir, f"_tmp_{uuid.uuid4().hex}.csv")
        with open(tmp, "x", newline="") as f:
            w = csv.DictWriter(f, fieldnames=COLUMNS)
            w.writeheader()
            for r in rows:
                w.writerow({c: r.get(c) for c in COLUMNS})
        final = os.path.join(self.dir, f"ix_{0:010d}_{uuid.uuid4().hex}.csv")
        os.rename(tmp, final)
        for n in old:
            os.remove(os.path.join(self.dir, n))

    # -- reads --------------------------------------------------------------

    def _raw_df(self) -> DataFrame:
        files = [n for n in os.listdir(self.dir) if n.startswith("ix_")]
        if not files:
            return self.spark.createDataFrame([], _CSV_SCHEMA + ", _seq LONG")
        df = self.spark.read.csv(
            [os.path.join(self.dir, n) for n in files],
            header=True,
            schema=_CSV_SCHEMA,
            escape='"',  # python csv doubles quotes (RFC 4180); match it
        )
        return df.withColumn(
            "_seq",
            F.regexp_extract(F.input_file_name(), r"ix_(\d{10})_", 1).cast("long"),
        )

    def status_df(self) -> DataFrame:
        """Last-writer-wins current state: the MLK_DeltaStatus view (K7)
        = arg_max(_seq) per item key + deterministic order (D3 + F1,
        DatabaseGateway.cs:85-104)."""
        w = Window.partitionBy(*KEY).orderBy(F.desc("_seq"))
        return (
            self._raw_df()
            .withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn", "_seq")
            .orderBy("table_name", "start_tx_id", "action", "blob_path")
        )

    def high_water(self, table_name: str) -> int:
        """Highest end_tx_id with every item of its batch complete —
        the resume point (TableStatus.cs:50-77)."""
        st = self.status_df().filter(F.col("table_name") == table_name)
        per_batch = st.groupBy("end_tx_id").agg(
            F.max(F.when(~F.col("state").isin(*COMPLETE_STATES), 1).otherwise(0)).alias(
                "incomplete"
            )
        )
        row = (
            per_batch.filter("incomplete = 0")
            .agg(F.max("end_tx_id").alias("hwm"))
            .first()
        )
        return row["hwm"] if row and row["hwm"] is not None else -1

    def incomplete_batch(self, table_name: str) -> list[dict[str, Any]] | None:
        """Items of the earliest batch still in flight, if any (restart
        recovery, DeltaTableOrchestration.cs:76-81,181-200)."""
        st = self.status_df().filter(F.col("table_name") == table_name)
        batches = (
            st.groupBy("start_tx_id", "end_tx_id")
            .agg(
                F.max(
                    F.when(~F.col("state").isin(*COMPLETE_STATES), 1).otherwise(0)
                ).alias("incomplete")
            )
            .filter("incomplete = 1")
            .orderBy("start_tx_id")
            .limit(1)
            .collect()
        )
        if not batches:
            return None
        b = batches[0]
        items = st.filter(
            (F.col("start_tx_id") == b["start_tx_id"])
            & (F.col("end_tx_id") == b["end_tx_id"])
        ).collect()
        return [r.asDict() for r in items]
