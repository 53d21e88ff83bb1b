"""Scale A/B for the KQL activity-plugin persists (r12 VERDICT item 3).

r12 persisted the shared distinct-(id, bin) frames of
activity_metrics / new_activity_metrics (4 resp. 2 consumers each),
trading a locally-measurable cost (~+0.1-0.5 s at sf0.1 bench state)
for 10x fewer input scans "at real event volume" — an argument, not a
measurement.  This probe measures it: the same queries on the 10x
events corpus (tools/bench_sf1.py build), persisted (shipped code) vs
unpersisted (DataFrame.persist monkeypatched to a no-op for the run).

Usage: python tools/probe_activity_persist.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from mirror_lake_kusto_spark.queries import all_queries
from mirror_lake_kusto_spark.session import build_session

QUERIES = [
    "kql_activity_metrics",
    "kql_new_activity_metrics",
    "kql_activity_engagement",
]


def _jif():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _steal(a, b) -> float:
    d = [y - x for x, y in zip(a, b)]
    return d[7] / (sum(d) or 1) * 100 if len(d) > 7 else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mlk_sf1_full"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = build_session(app_name="probe-activity-persist")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    registry["q6_forecast_revenue"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    real_persist = DataFrame.persist

    def run_one(name: str, persist_on: bool) -> tuple[float, float]:
        if not persist_on:
            DataFrame.persist = lambda self, *a, **kw: self
        try:
            best, worst_steal = float("inf"), 0.0
            for _ in range(runs):
                j0 = _jif()
                t0 = time.time()
                registry[name].fn(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.time() - t0)
                worst_steal = max(worst_steal, _steal(j0, _jif()))
                spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            return best, worst_steal
        finally:
            DataFrame.persist = real_persist

    for name in QUERIES:
        on, s_on = run_one(name, True)
        off, s_off = run_one(name, False)
        verdict = "persist WINS" if on < off else "persist LOSES"
        print(
            f"{name}: persisted={on:.2f}s (steal<={s_on:.1f}%)  "
            f"unpersisted={off:.2f}s (steal<={s_off:.1f}%)  {verdict}",
            flush=True,
        )


if __name__ == "__main__":
    main()
