"""Time-series queries: Kusto ``make-series`` + series functions over
the events stream table, oracle-checked against DuckDB window/list SQL.

The reference's ecosystem charts everything through ``make-series``
(Kusto docs; the C# reference emits KQL text for all reads, e.g.
Kusto/DatabaseGateway.cs:85-95) — these entries prove the engine's
regular-grid semantics: [start, stop) range, epoch-anchored-at-start
slots, default fill for empty slots, per-group aligned arrays.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from ..operators.timeseries import make_series, series_moving_avg
from ..sources.tables import load_table
from .base import query

_START = datetime.datetime(2024, 1, 1)
_STOP = datetime.datetime(2024, 1, 15)
_STEP = datetime.timedelta(hours=6)

_ORACLE_GRID = """
    WITH ev AS (
      SELECT event_type,
             CAST(to_timestamp(
               FLOOR((epoch(CAST(ts AS TIMESTAMP))
                      - epoch(TIMESTAMP '2024-01-01')) / 21600) * 21600
               + epoch(TIMESTAMP '2024-01-01')) AS TIMESTAMP) AS slot,
             value
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
    ),
    agg AS (
      SELECT event_type, slot, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(value) AS total
      FROM ev GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT event_type FROM ev),
    slots AS (
      SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-14 18:00:00',
                                    INTERVAL 6 HOUR)) AS slot
    ),
    grid AS (
      SELECT k.event_type, s.slot,
             COALESCE(a.n, 0) AS n,
             COALESCE(a.total, 0) AS total
      FROM keys k CROSS JOIN slots s
      LEFT JOIN agg a ON a.event_type = k.event_type AND a.slot = s.slot
    )
"""


@query(
    "ts_make_series",
    _ORACLE_GRID
    + """
    SELECT event_type,
           list(slot ORDER BY slot) AS ts_axis,
           list(n ORDER BY slot) AS n,
           list(ROUND(total, 2) ORDER BY slot) AS total
    FROM grid GROUP BY event_type ORDER BY event_type
    """,
    doc="Kusto make-series: per-event-type count+sum onto a regular "
    "6h grid over [2024-01-01, 2024-01-15), zero-filled empty slots, "
    "aligned arrays (operators/timeseries.py)",
)
def ts_make_series(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    out = make_series(
        ev,
        "ts",
        {"n": F.count("*"), "total": F.sum("value")},
        _START,
        _STOP,
        _STEP,
        by=["event_type"],
        defaults={"n": 0, "total": 0},
    )
    return out.select(
        "event_type",
        "ts_axis",
        "n",
        F.transform("total", lambda x: F.round(x, 2)).alias("total"),
    ).orderBy("event_type")


@query(
    "ts_series_moving_avg",
    _ORACLE_GRID
    + """
    , cents AS (
      SELECT event_type, slot,
             CAST(ROUND(total * 100, 0) AS BIGINT) AS c
      FROM grid
    ),
    ma AS (
      SELECT event_type, slot,
             CAST(SUM(c) OVER w AS DOUBLE) / COUNT(c) OVER w AS avg_c
      FROM cents
      WINDOW w AS (PARTITION BY event_type ORDER BY slot
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           list(ROUND(avg_c, 0) / 100 ORDER BY slot) AS ma
    FROM ma GROUP BY event_type ORDER BY event_type
    """,
    doc="series moving average (trailing window 4) over the "
    "make-series grid -- JVM higher-order array expression, no "
    "re-shuffle after the series is built.  Averaged in integer cents "
    "so the windowed sums are order-exact in both engines (float "
    "window accumulation order differs between Spark and DuckDB); "
    "oracle is the equivalent window-frame AVG",
)
def ts_series_moving_avg(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    out = make_series(
        ev, "ts", {"total": F.sum("value")}, _START, _STOP, _STEP,
        by=["event_type"], defaults={"total": 0},
    )
    cents = F.transform(
        F.col("total"), lambda x: F.round(x * 100, 0).cast("bigint")
    )
    return out.select(
        "event_type",
        F.transform(
            series_moving_avg(cents, 4), lambda x: F.round(x, 0) / 100
        ).alias("ma"),
    ).orderBy("event_type")
