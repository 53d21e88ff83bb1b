"""Delta-backed TransactionItem state store — the 100 TB state path.

The CSV store (state.py) is reference-faithful: an append-only blob
plus an in-memory LWW map (GlobalTableStatus.cs:66-74).  That driver
map is O(total mirrored files) — SURVEY §7.4 named it the reference's
scaling ceiling and prescribed keeping state in a Delta table instead.
This class does exactly that, dogfooding this repo's own Delta writer:

- ``persist`` appends item rows (with a monotonically increasing
  ``_seq``) to a Delta table — atomic commit, periodic parquet
  checkpoint, optimistic-concurrency protected;
- the current view is ``arg_max(_seq) per item key`` computed BY SPARK
  (the same D3/D4 shape as ``status_df``), never a driver map;
- steering reads collect only bounded results: ``high_water`` one row,
  ``incomplete_batch`` one batch's items (≤ the pipeline's
  max_items_per_batch after chunking), ``adds_df``/``removes_df``
  stay DataFrames end-to-end for the snapshot diff and remove
  matching;
- ``compact`` = OPTIMIZE + VACUUM on the state table itself.

Trade-off: each steering read is a small Spark job instead of a dict
lookup — latency per batch goes up by ~a second locally, and the
driver's item footprint drops from O(total files) to O(one batch).
Pick ``state_backend="delta"`` when the mirrored table's file count is
large; the CSV store remains the low-latency default.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.delta_sink import DeltaSink
from .state import COLUMNS, COMPLETE_STATES, KEY

_SCHEMA = (
    "table_name STRING, start_tx_id LONG, end_tx_id LONG, action STRING, "
    "state STRING, mirror_timestamp STRING, delta_timestamp STRING, "
    "blob_path STRING, partition_values STRING, size LONG, "
    "record_count LONG, partition_columns STRING, schema STRING, "
    "internal_state STRING, _seq LONG"
)


class DeltaStateStore:
    """Same surface as ``StateStore``, state rows in a Delta table."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        self.sink = DeltaSink(spark, state_dir, checkpoint_interval=16)

    # -- writes -------------------------------------------------------------

    def persist(self, items: list[dict[str, Any]]) -> None:
        if not items:
            return
        seq = self.sink._next_version()  # total write order = commit order
        rows = [
            tuple([it.get(c) for c in COLUMNS] + [seq]) for it in items
        ]
        self.sink.append(self.spark.createDataFrame(rows, _SCHEMA))

    def compact(self) -> None:
        """OPTIMIZE + VACUUM the state table (A12's atomic-compaction
        analogue; history beyond the current snapshot is dropped)."""
        self.sink.optimize()
        self.sink.vacuum()

    # -- current view (Spark-side LWW) --------------------------------------

    def status_df(self) -> DataFrame:
        """arg_max(_seq) per item key (K7 view, D3/D4)."""
        raw = self.sink.to_df()
        if "_seq" not in raw.columns:  # empty table
            return self.spark.createDataFrame([], _SCHEMA).drop("_seq")
        w = Window.partitionBy(*KEY).orderBy(F.desc("_seq"))
        return (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn", "_seq")
        )

    def current_items(
        self, table_name: str | None = None, action: str | None = None
    ) -> list[dict[str, Any]]:
        """LWW current state as driver rows — USE ONLY for bounded
        subsets (one batch, Schema items, reporting); the DataFrame
        methods below are the scale path."""
        df = self.status_df()
        if table_name is not None:
            df = df.filter(F.col("table_name") == table_name)
        if action is not None:
            df = df.filter(F.col("action") == action)
        rows = [r.asDict() for r in df.collect()]
        rows.sort(
            key=lambda r: (
                r["table_name"] or "",
                r["start_tx_id"] or 0,
                r["action"] or "",
                r["blob_path"] or "",
            )
        )
        return rows

    def adds_df(self, table_name: str) -> DataFrame:
        """Current Add items (LWW) as a DataFrame — feeds the snapshot
        diff and remove matching without driver materialization."""
        return self.status_df().filter(
            (F.col("table_name") == table_name) & (F.col("action") == "Add")
        )

    def removes_df(self, table_name: str) -> DataFrame:
        return self.status_df().filter(
            (F.col("table_name") == table_name) & (F.col("action") == "Remove")
        )

    # -- steering reads (bounded collects) ----------------------------------

    def high_water(self, table_name: str) -> int:
        """Highest end_tx_id whose batch is fully complete; ONE row
        collects."""
        row = (
            self.status_df()
            .filter(F.col("table_name") == table_name)
            .groupBy("end_tx_id")
            .agg(
                F.max(
                    (~F.col("state").isin(*COMPLETE_STATES)).cast("int")
                ).alias("open")
            )
            .filter("open = 0")
            .agg(F.max("end_tx_id").alias("hwm"))
            .first()
        )
        return row["hwm"] if row and row["hwm"] is not None else -1

    def incomplete_batch(self, table_name: str) -> list[dict[str, Any]] | None:
        """Items of the earliest batch still in flight — the collect is
        bounded by the pipeline's per-batch item cap."""
        status = self.status_df().filter(F.col("table_name") == table_name)
        earliest = (
            status.filter(~F.col("state").isin(*COMPLETE_STATES))
            .agg(
                F.min(F.struct("start_tx_id", "end_tx_id")).alias("b")
            )
            .first()
        )
        if earliest is None or earliest["b"] is None:
            return None
        start, end = earliest["b"]["start_tx_id"], earliest["b"]["end_tx_id"]
        rows = [
            r.asDict()
            for r in status.filter(
                (F.col("start_tx_id") == start) & (F.col("end_tx_id") == end)
            ).collect()
        ]
        rows.sort(key=lambda r: (r["action"] or "", r["blob_path"] or ""))
        return rows
