"""Stage-level profile of one registry query via the Spark UI REST API.

Runs the query bench-style (noop sink, warm session) with the UI on,
then dumps every completed stage's wall span, task count, executor run
time, shuffle bytes and max/median task time — the attribution layer
tools/profile_query.py (driver cProfile) cannot see.

Usage: python tools/profile_stages.py <name> [sf_dir] [cpus] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirror_lake_kusto_spark.queries import all_queries
from mirror_lake_kusto_spark.session import build_session


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mlk_sf1_full"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = build_session(
        app_name=f"stages-{name}",
        cpus=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"
    registry = all_queries()
    registry["q6_forecast_revenue"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    best = float("inf")
    for i in range(runs):
        if i == runs - 1:
            app = json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications")
            )[0]["id"]
            pre = {
                (s["stageId"], s["attemptId"])
                for s in json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app}/stages"
                    )
                )
            }
        t0 = time.time()
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
        if i < runs - 1:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    print(f"{name}: best wall {best:.2f}s (last run profiled)\n")
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    rows = []
    for s in stages:
        key = (s["stageId"], s["attemptId"])
        if key in pre:
            continue
        wall = None
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t1 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            t2 = datetime.strptime(s["completionTime"], fmt)
            wall = (t2 - t1).total_seconds()
        med = mx = None
        if s["numCompleteTasks"] > 0 and s["executorRunTime"] > 200:
            try:
                dist = json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app}/stages/"
                        f"{s['stageId']}/{s['attemptId']}/taskSummary"
                        "?quantiles=0.5,1.0"
                    )
                )
                med, mx = dist["executorRunTime"]
            except Exception:
                pass
        rows.append(
            (
                wall or 0,
                f"stage {s['stageId']:4d} [{s['name'][:48]:48s}] "
                f"wall={wall if wall is not None else -1:6.2f}s "
                f"tasks={s['numCompleteTasks']:4d} "
                f"runSum={s['executorRunTime'] / 1000:7.2f}s "
                f"shufR={s['shuffleReadBytes'] >> 20:5d}M "
                f"shufW={s['shuffleWriteBytes'] >> 20:5d}M"
                + (
                    f" med={med / 1000:5.2f}s max={mx / 1000:5.2f}s"
                    if med is not None
                    else ""
                ),
            )
        )
    for _, line in sorted(rows, reverse=True):
        print(line)


if __name__ == "__main__":
    main()
