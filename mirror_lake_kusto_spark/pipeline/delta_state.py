"""Delta-backed TransactionItem state store — the 100 TB state path.

The CSV store (state.py) is reference-faithful: an append-only blob
plus an in-memory LWW map (GlobalTableStatus.cs:66-74).  That driver
map is O(total mirrored files) — SURVEY §7.4 named it the reference's
scaling ceiling and prescribed keeping state in a Delta table instead.
This class does exactly that, dogfooding this repo's own Delta writer:

- ``persist`` appends item rows (with a monotonically increasing
  ``_seq``) to a Delta table — atomic commit, periodic parquet
  checkpoint, optimistic-concurrency protected;
- the current view is ``arg_max(_seq) per item key``; ``status_df``
  always computes it BY SPARK (the same D3/D4 shape), and past the
  driver threshold all steering runs through that view too;
- steering reads collect only bounded results: ``high_water`` one row,
  ``incomplete_batch`` one batch's items (≤ the pipeline's
  max_items_per_batch after chunking), ``adds_df``/``removes_df``
  stay DataFrames end-to-end for the snapshot diff and remove
  matching;
- ``compact`` = OPTIMIZE + VACUUM on the state table itself.

Steering assumes a SINGLE writer per state dir (the same assumption
the reference's in-memory GlobalTableStatus map makes,
GlobalTableStatus.cs:66-74): the driver LWW map is write-through for
this process's persists and is not refreshed on foreign commits —
concurrent mirrors of one table must share a pipeline instance.

Latency: steering follows the same driver-fast-path / distributed-
fallback split the log reader uses — while the state's parquet
footprint is under ``DRIVER_STATE_MAX_BYTES`` the LWW map is held on
the driver (hydrated via pyarrow, write-through on persist: dict-lookup
steering, zero Spark jobs), and past the threshold every steering read
becomes a bounded Spark job over the cached Spark-side LWW view.  Both
paths are tested equivalent.  This is the DEFAULT backend (the
100×-scale posture SURVEY §7.4 prescribes); pass
``state_backend="csv"`` for the reference-faithful CSV store.  A state
dir written by the CSV backend migrates in place on open.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.parquet as papq
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..sources.delta_sink import DeltaSink
from ..sources.skipping import file_stats_json
from .state import COLUMNS, COMPLETE_STATES, KEY

_INT_COLS = ("start_tx_id", "end_tx_id", "size", "record_count", "_seq")
_ALL_COLS = COLUMNS + ["_seq"]
_STRUCT = StructType(
    [
        StructField(c, LongType() if c in _INT_COLS else StringType(), True)
        for c in _ALL_COLS
    ]
)
_SCHEMA = ", ".join(
    f"{c} {'LONG' if c in _INT_COLS else 'STRING'}" for c in _ALL_COLS
)
_ARROW = pa.schema(
    [
        (c, pa.int64() if c in _INT_COLS else pa.string())
        for c in _ALL_COLS
    ]
)


class DeltaStateStore:
    """Same surface as ``StateStore``, state rows in a Delta table."""

    # Driver LWW map allowed while the state table's parquet footprint
    # is below this (~160k items); past it, steering reads run as
    # bounded Spark jobs over the cached status view.
    DRIVER_STATE_MAX_BYTES = 32 << 20

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        self.sink = DeltaSink(spark, state_dir, checkpoint_interval=16)
        self._status_cache: DataFrame | None = None
        self._lww: dict[tuple, dict[str, Any]] | None = None
        self._lww_hydrated = False
        self._migrate_csv_state()

    # -- driver LWW fast path -------------------------------------------------

    def steering_is_driver_side(self) -> bool:
        """True while the state fits the driver threshold — callers can
        then prefer dict-lookup steering over Spark-job probes."""
        return self._lww_map() is not None

    def _lww_map(self) -> dict[tuple, dict[str, Any]] | None:
        """The driver-held LWW item map, or ``None`` when the state
        exceeds ``DRIVER_STATE_MAX_BYTES`` (steering then goes through
        the distributed view).  Hydrated lazily from the snapshot's
        parquet files via pyarrow; kept write-through by ``persist``."""
        if not self._lww_hydrated:
            self._lww_hydrated = True
            self._lww = self._hydrate()
        return self._lww

    def _hydrate(self) -> dict[tuple, dict[str, Any]] | None:
        from ..sources.delta_log import snapshot_files

        try:
            files = snapshot_files(self.spark, self.dir)
        except Exception:  # no commits yet
            files = []
        if sum(f.get("size") or 0 for f in files) > self.DRIVER_STATE_MAX_BYTES:
            return None
        from ..sources import fs as _fsmod

        rows: list[dict[str, Any]] = []
        for f in files:
            p = _fsmod.join(self.dir, f["path"])
            with _fsmod.get_fs(p).open_input(p) as h:
                rows.extend(papq.read_table(h).to_pylist())
        rows.sort(key=lambda r: r["_seq"] if r["_seq"] is not None else -1)
        cache: dict[tuple, dict[str, Any]] = {}
        for r in rows:
            it = {c: r.get(c) for c in COLUMNS}
            cache[tuple(it.get(k) for k in KEY)] = it
        return cache

    @staticmethod
    def _norm_item(it: dict[str, Any]) -> dict[str, Any]:
        """Normalize exactly as the parquet round trip would, so the
        write-through map matches a rehydration bit-for-bit."""
        out: dict[str, Any] = {}
        for c in COLUMNS:
            v = it.get(c)
            if v is None:
                out[c] = None
            elif c in _INT_COLS:
                out[c] = int(v)
            else:
                out[c] = str(v)
        return out

    def _migrate_csv_state(self) -> None:
        """In-place CSV→Delta state migration: a mirror previously run
        with ``state_backend="csv"`` upgrades transparently when opened
        with the (now default) Delta backend.  The legacy store's LWW
        current view is persisted as one Delta commit — compaction
        semantics, history is not carried — then the CSV files are
        removed.  Crash-safe: if the process dies between persist and
        remove, re-running re-persists the same items, and LWW by a
        later ``_seq`` yields the identical current view."""
        from ..sources import fs as _fsmod

        fs = _fsmod.get_fs(self.dir)
        csvs = [n for n in fs.listdir(self.dir) if n.startswith("ix_")]
        if not csvs:
            return
        from .state import StateStore

        legacy = StateStore(self.spark, self.dir)
        self.persist(legacy.current_items())
        for n in csvs:
            fs.remove(_fsmod.join(self.dir, n))

    # -- writes -------------------------------------------------------------

    def persist(self, items: list[dict[str, Any]]) -> None:
        """Append item rows as ONE driver-written parquet file + one
        Delta commit — zero Spark jobs.  ``items`` is already a bounded
        driver list (≤ the pipeline's max_items_per_batch after
        chunking), so writing it with pyarrow costs nothing extra in
        driver footprint, and steering latency per batch stays
        milliseconds instead of a cluster job per state flush."""
        if not items:
            return
        seq = self.sink._next_version()  # total write order = commit order

        def _cell(it, c):
            v = seq if c == "_seq" else it.get(c)
            if v is None:
                return None
            return int(v) if c in _INT_COLS else str(v)

        table = pa.table(
            {c: [_cell(it, c) for it in items] for c in _ALL_COLS},
            schema=_ARROW,
        )
        from ..sources import fs as _fsmod

        fs = _fsmod.get_fs(self.dir)
        name = f"part-{uuid.uuid4().hex}.snappy.parquet"
        dst = _fsmod.join(self.dir, name)
        if _fsmod.scheme_of(self.dir):
            import io as _io

            buf = _io.BytesIO()
            papq.write_table(table, buf, compression="snappy")
            fs.write_bytes(dst, buf.getvalue())
        else:
            papq.write_table(table, dst, compression="snappy")
        meta = _fsmod.parquet_metadata(dst)
        self.sink._pending_schema = _STRUCT.json()
        self.sink._commit(
            [
                {
                    "add": {
                        "path": name,
                        "partitionValues": {},
                        "size": fs.getsize(dst),
                        "modificationTime": int(time.time() * 1000),
                        "dataChange": True,
                        "stats": file_stats_json(meta),
                    }
                }
            ],
            operation="WRITE",
        )
        self._invalidate()
        if self._lww_hydrated and self._lww is not None:
            for it in items:
                norm = self._norm_item(it)
                self._lww[tuple(norm.get(k) for k in KEY)] = norm
            # rough growth check: past the threshold, drop to the
            # distributed steering path (≈200 B/item at rest)
            if len(self._lww) * 200 > self.DRIVER_STATE_MAX_BYTES:
                self._lww = None

    def _invalidate(self) -> None:
        if self._status_cache is not None:
            try:
                self._status_cache.unpersist()
            except Exception:
                pass
            self._status_cache = None

    def compact(self) -> None:
        """OPTIMIZE + VACUUM the state table (A12's atomic-compaction
        analogue; history beyond the current snapshot is dropped)."""
        self.sink.optimize()
        self.sink.vacuum()
        self._invalidate()

    # -- current view (Spark-side LWW) --------------------------------------

    def status_df(self) -> DataFrame:
        """arg_max(_seq) per item key (K7 view, D3/D4).  Cached per
        state generation: a sync round steers off this view many times
        (high-water, incomplete batch, adds/removes) — the log replay +
        window runs once, consumers scan the cached result, and any
        ``persist``/``compact`` invalidates."""
        if self._status_cache is not None:
            return self._status_cache
        raw = self.sink.to_df()
        if "_seq" not in raw.columns:  # empty table
            return self.spark.createDataFrame([], _SCHEMA).drop("_seq")
        w = Window.partitionBy(*KEY).orderBy(F.desc("_seq"))
        self._status_cache = (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn", "_seq")
            .cache()
        )
        return self._status_cache

    def current_items(
        self, table_name: str | None = None, action: str | None = None
    ) -> list[dict[str, Any]]:
        """LWW current state as driver rows — USE ONLY for bounded
        subsets (one batch, Schema items, reporting); the DataFrame
        methods below are the scale path."""
        m = self._lww_map()
        if m is not None:
            rows = [
                dict(it)
                for it in m.values()
                if (table_name is None or it["table_name"] == table_name)
                and (action is None or it["action"] == action)
            ]
        else:
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

    def _items_df(self, table_name: str, action: str) -> DataFrame:
        m = self._lww_map()
        if m is not None:
            rows = [
                tuple(it.get(c) for c in COLUMNS)
                for it in m.values()
                if it["table_name"] == table_name and it["action"] == action
            ]
            return self.spark.createDataFrame(
                rows, StructType(_STRUCT.fields[:-1])  # minus _seq
            )
        return self.status_df().filter(
            (F.col("table_name") == table_name) & (F.col("action") == action)
        )

    def adds_df(self, table_name: str) -> DataFrame:
        """Current Add items (LWW) as a DataFrame — feeds the snapshot
        diff and remove matching without driver materialization (past
        the driver threshold)."""
        return self._items_df(table_name, "Add")

    def removes_df(self, table_name: str) -> DataFrame:
        return self._items_df(table_name, "Remove")

    # -- steering reads (dict lookups under the threshold; bounded
    # collects past it) ------------------------------------------------------

    def high_water(self, table_name: str) -> int:
        """Highest end_tx_id whose batch is fully complete."""
        m = self._lww_map()
        if m is not None:
            incomplete: dict[int, bool] = {}
            for it in m.values():
                if it["table_name"] != table_name:
                    continue
                b = it["end_tx_id"]
                incomplete[b] = incomplete.get(b, False) or (
                    it["state"] not in COMPLETE_STATES
                )
            done = [b for b, inc in incomplete.items() if not inc]
            return max(done) if done else -1
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
        """Items of the earliest batch still in flight — bounded by the
        pipeline's per-batch item cap."""
        m = self._lww_map()
        if m is not None:
            pending: dict[tuple[int, int], bool] = {}
            for it in m.values():
                if it["table_name"] != table_name:
                    continue
                b = (it["start_tx_id"], it["end_tx_id"])
                pending[b] = pending.get(b, False) or (
                    it["state"] not in COMPLETE_STATES
                )
            open_batches = sorted(b for b, inc in pending.items() if inc)
            if not open_batches:
                return None
            start, end = open_batches[0]
            rows = [
                dict(it)
                for it in m.values()
                if it["table_name"] == table_name
                and it["start_tx_id"] == start
                and it["end_tx_id"] == end
            ]
        else:
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
