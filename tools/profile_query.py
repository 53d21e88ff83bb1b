"""Profile one registry query: wall time + cProfile cumulative hotspots.

Runs the query exactly as bench.py does (noop sink, warm session,
repeat runs) and prints the top cumulative-time functions, filtered to
this repo plus the py4j/Spark API boundary, so driver-side phases
(fixture authoring, log walking, commit, collect) are attributable.

Usage: python tools/profile_query.py <name> [runs] [sf_dir]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirror_lake_kusto_spark.queries import all_queries
from mirror_lake_kusto_spark.session import build_session


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = build_session(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    q = registry[name]

    # warmup as bench.py does
    registry["q6_forecast_revenue"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    walls = []
    for i in range(runs):
        prof = cProfile.Profile()
        t0 = time.time()
        prof.enable()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        prof.disable()
        walls.append(time.time() - t0)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        if i == runs - 1:  # report the LAST (warmest) run
            s = io.StringIO()
            st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
            st.print_stats(
                r"mirror_lake_kusto_spark|readwriter|dataframe\.py|"
                r"session\.py|java_gateway.*__call__",
                60,
            )
            text = s.getvalue()
    print(f"\n=== {name}: walls {['%.2f' % w for w in walls]} ===")
    print(text)


if __name__ == "__main__":
    main()
