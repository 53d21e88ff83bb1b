"""Planning-time probe for read_snapshot vs partition-tuple count.

Authors a synthetic Delta table with N partition tuples (one tiny file
per tuple, written through DeltaSink so the log is authentic), then
measures, for the CURRENT read_snapshot code:

- DataFrame construction + formatted-explain time (driver planning)
- number of parquet Scan nodes in the physical plan
- full count() wall time (execution incl. scheduling)

Usage: python tools/probe_snapshot_tuples.py [n_tuples ...]
(default: 25 250 1000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirror_lake_kusto_spark.session import build_session


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [25, 250, 1000]
    spark = build_session(app_name="probe-snapshot-tuples")
    spark.sparkContext.setLogLevel("ERROR")
    from mirror_lake_kusto_spark.sources import delta_log as DL
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    for n in ns:
        path = f"/tmp/mlk_tuple_probe_{n}"
        if not os.path.exists(os.path.join(path, "_delta_log")):
            shutil.rmtree(path, ignore_errors=True)
            df = spark.range(n * 4).selectExpr(
                "id", f"cast(id % {n} as string) as pk"
            )
            sink = DeltaSink(spark, path, partition_by=["pk"])
            # one commit, n partition dirs -> n tuples
            sink.append(df.repartition(max(n // 50, 1)))
        t0 = time.time()
        out = DL.read_snapshot(spark, path)
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        t_plan = time.time() - t0
        n_scans = plan.count("Scan parquet")
        t0 = time.time()
        cnt = out.count()
        t_exec = time.time() - t0
        print(
            f"tuples={n:5d}  plan={t_plan:6.2f}s  "
            f"scan_nodes={n_scans // 2:4d}  count({cnt})={t_exec:6.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
