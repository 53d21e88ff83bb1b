"""Multi-table mirror fan-out (SURVEY §3.1).

The reference runs one DeltaTableOrchestration per (db, table) as
independent async tasks joined with Task.WhenAll
(Orchestrations/MirrorOrchestration.cs:64-81,127-132).  Spark twin: one
MirrorPipeline per table, driven from a thread pool — Spark's scheduler
interleaves the per-table jobs across executors (FAIR-friendly), and
each table keeps its own state dir exactly as each reference table
keeps its own checkpoint span.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import SparkSession

from .orchestrate import MirrorPipeline

_LOG = logging.getLogger(__name__)


class MirrorOrchestration:
    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, dict[str, Any]],
        root_dir: str,
        max_parallel: int = 8,
    ):
        """``tables``: name -> kwargs with at least ``source_path``;
        optional target_path/state_dir default under ``root_dir``
        (+ any MirrorPipeline option: go_back_days, creation_time_expr…).
        """
        self.pipelines: dict[str, MirrorPipeline] = {}
        for name, cfg in tables.items():
            cfg = dict(cfg)
            src = cfg.pop("source_path")
            self.pipelines[name] = MirrorPipeline(
                spark,
                src,
                cfg.pop("target_path", os.path.join(root_dir, name, "table")),
                cfg.pop("state_dir", os.path.join(root_dir, name, "state")),
                table_name=name,
                **cfg,
            )
        self.max_parallel = max_parallel
        #: table -> exception from the most recent run_until_idle cycle
        self.last_errors: dict[str, BaseException] = {}

    def run_until_idle(
        self, raise_on_error: bool = False
    ) -> dict[str, list[dict[str, Any]]]:
        """Drain every table's pending commits in parallel; returns
        per-table batch summaries (Task.WhenAll shape).

        Per-table failure isolation (MirrorOrchestration.cs:127-132
        runs tables as independent tasks): one table's schema error or
        unsupported-feature throw must not halt its siblings — the
        failed table's exception is recorded in ``self.last_errors``
        (and logged), the healthy tables complete their drains, and the
        next cycle retries the failed table from its own durable state.
        ``raise_on_error=True`` restores fail-fast for callers that
        want a hard stop after the cycle completes."""
        width = min(self.max_parallel, max(len(self.pipelines), 1))
        results: dict[str, list[dict[str, Any]]] = {}
        errors: dict[str, BaseException] = {}
        with ThreadPoolExecutor(max_workers=width) as ex:
            futures = {
                name: ex.submit(p.run_until_idle)
                for name, p in self.pipelines.items()
            }
            for name, f in futures.items():
                try:
                    results[name] = f.result()
                except Exception as exc:  # noqa: BLE001 - isolated per table
                    errors[name] = exc
                    results[name] = []
                    _LOG.warning(
                        "mirror table %s failed this cycle (siblings "
                        "unaffected): %s",
                        name,
                        exc,
                    )
        self.last_errors = errors
        if errors and raise_on_error:
            raise RuntimeError(
                f"{len(errors)} mirror table(s) failed: "
                f"{sorted(errors)}"
            ) from next(iter(errors.values()))
        return results

    def run_continuous(
        self, poll_seconds: float = 5.0, max_polls: int | None = None
    ) -> int:
        """Service loop: drain all tables, sleep while idle, repeat —
        the reference's continuous mode across its whole orchestration
        set (MirrorOrchestration.cs:127-132 + the per-table probe
        delay).  ``max_polls`` counts IDLE polls (the same semantics as
        ``MirrorPipeline.run_continuous`` and the CLI's
        ``--max-polls``): a drain that found work does not consume a
        poll, so the loop always finishes catching up before it stops.
        Returns the number of idle polls."""
        import time as _time

        polls = 0
        while max_polls is None or polls < max_polls:
            results = self.run_until_idle()
            if not any(results.values()):  # every table up-to-date
                polls += 1
                if max_polls is not None and polls >= max_polls:
                    break
                _time.sleep(poll_seconds)
        return polls

    def mirror_df(self, table: str):
        return self.pipelines[table].mirror_df()

    # -- K8: `.show tables` / `.show capacity` twins ------------------------

    def table_exists(self, table: str) -> bool:
        """Existence probe — the reference's ``.show tables | where
        TableName == '...' | count`` (DeltaTableOrchestration.cs:233-235)."""
        return table in self.pipelines

    def show_tables(self):
        """One row per mirrored table with its sync posture, from state
        metadata only (no data scan) — the ``.show tables`` twin.

        Columns: table_name, source_path, target_path, high_water_tx,
        n_adds, n_removes, n_pending, live_files, live_bytes,
        live_records."""
        rows = []
        for name, p in sorted(self.pipelines.items()):
            adds = p.state.current_items(name, "Add")
            removes = p.state.current_items(name, "Remove")
            removed = {r["blob_path"] for r in removes}
            live = [
                a
                for a in adds
                if a["state"] != "Skipped" and a["blob_path"] not in removed
            ]
            pending = sum(
                1
                for it in p.state.current_items(name)
                if it["state"] not in ("Done", "Skipped")
            )
            rows.append(
                (
                    name,
                    p.source,
                    p.sink.path,
                    p.state.high_water(name),
                    len(adds),
                    len(removes),
                    pending,
                    len(live),
                    sum(a["size"] or 0 for a in live),
                    sum(a["record_count"] or 0 for a in live),
                )
            )
        spark = next(iter(self.pipelines.values())).spark
        return spark.createDataFrame(
            rows,
            "table_name string, source_path string, target_path string, "
            "high_water_tx long, n_adds long, n_removes long, "
            "n_pending long, live_files long, live_bytes long, "
            "live_records long",
        )

    def capacity(self) -> dict[str, int]:
        """Ingestion-slot view — the reference sizes its pipeline width
        as min(ingestion slots, items) from ``.show capacity``
        (BlobStagingOrchestration.cs:326-338); the Spark analogue of an
        ingestion slot is a scheduler core."""
        spark = next(iter(self.pipelines.values())).spark
        slots = spark.sparkContext.defaultParallelism
        return {
            "ingestion_slots": slots,
            "tables": len(self.pipelines),
            "width": min(self.max_parallel, max(len(self.pipelines), 1)),
        }
