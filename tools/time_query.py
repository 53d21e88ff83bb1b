"""Time individual registry queries, noop-sunk, min-of-N with per-run
steal annotation.  The single-query analogue of bench_sf1.py for
decomposition A/Bs.

Usage: python tools/time_query.py <sf_dir> <runs> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jif():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _steal(a, b) -> float:
    d = [y - x for x, y in zip(a, b)]
    return d[7] / (sum(d) or 1) * 100 if len(d) > 7 else 0.0


def main() -> None:
    sf_dir, runs = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    from mirror_lake_kusto_spark.queries import all_queries
    from mirror_lake_kusto_spark.session import build_session

    spark = build_session(app_name="time-query")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    # warmups: codegen + Arrow worker pool
    registry["q6_forecast_revenue"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in names:
        shots = []
        for _ in range(runs):
            j0 = _jif()
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            shots.append((dt, _steal(j0, _jif())))
            spark.catalog.clearCache()
        fmt = " ".join(f"{d:.2f}({s:.1f}%)" for d, s in shots)
        print(
            f"RESULT {name}: min {min(d for d, _ in shots):.2f}s"
            f"  shots: {fmt}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
