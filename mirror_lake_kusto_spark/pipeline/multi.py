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

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import SparkSession

from .orchestrate import MirrorPipeline


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

    def run_until_idle(self) -> dict[str, list[dict[str, Any]]]:
        """Drain every table's pending commits in parallel; returns
        per-table batch summaries (Task.WhenAll shape)."""
        with ThreadPoolExecutor(max_workers=self.max_parallel) as ex:
            futures = {
                name: ex.submit(p.run_until_idle)
                for name, p in self.pipelines.items()
            }
            return {name: f.result() for name, f in futures.items()}

    def mirror_df(self, table: str):
        return self.pipelines[table].mirror_df()
