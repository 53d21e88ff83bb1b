"""Commit-assembly floor probe (r12 VERDICT item 5).

Times DeltaSink.append() of a fixed 200k-row frame pre-partitioned
into N output files, for N in {8, 64, 256, 1024}.  The write job is
identical across N (same rows, same shuffle); what varies is the
commit-assembly tail `_stage_adds` pays per file: a parquet footer
read + a rename, all driver-side.  Serial, that tail is O(N) blocking
round trips; the r13 thread pool overlaps them.

Also times a second append of 32 files into a PARTITIONED table
(8 partition dirs) to cover the partitioned walk shape.

Usage: python tools/probe_commit_floor.py [runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from mirror_lake_kusto_spark.session import build_session
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

ROOT = "/tmp/mlk_commit_floor"


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = build_session(app_name="probe-commit-floor")
    spark.sparkContext.setLogLevel("ERROR")

    for n_files in (8, 64, 256, 1024):
        df = (
            spark.range(200_000)
            .repartition(n_files)
            .select(
                F.col("id"),
                (F.col("id") % 97).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
        )
        best = float("inf")
        for _ in range(runs):
            path = f"{ROOT}_{n_files}"
            shutil.rmtree(path, ignore_errors=True)
            sink = DeltaSink(spark, path)
            t0 = time.time()
            sink.append(df)
            best = min(best, time.time() - t0)
            shutil.rmtree(path, ignore_errors=True)
        print(f"append {n_files:5d} files: {best:.2f}s", flush=True)

    # partitioned-table shape: 8 partition dirs x 32 files
    df = (
        spark.range(200_000)
        .repartition(32)
        .select(
            F.col("id"),
            (F.col("id") % 8).cast("string").alias("p"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
    )
    best = float("inf")
    for _ in range(runs):
        path = f"{ROOT}_part"
        shutil.rmtree(path, ignore_errors=True)
        sink = DeltaSink(spark, path, partition_by=["p"])
        t0 = time.time()
        sink.append(df)
        best = min(best, time.time() - t0)
        shutil.rmtree(path, ignore_errors=True)
    print(f"append partitioned (8 dirs x 32): {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
