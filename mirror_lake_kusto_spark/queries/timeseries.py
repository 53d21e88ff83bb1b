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


def _json_ts(col):
    """Serialize an array<timestamp> column to a canonical JSON string.

    Kusto's make-series emits dynamic (JSON) arrays; JSON strings are
    the faithful public rendering AND keep the driver harness (which
    canonicalizes rows via pandas sort, unhashable on list cells) able
    to sort the result.  Timestamps are formatted explicitly so both
    engines render identical element strings.
    """
    return F.to_json(
        F.transform(col, lambda x: F.date_format(x, "yyyy-MM-dd HH:mm:ss"))
    )


def _json_fixed(col, decimals):
    """array<double> -> JSON string with %.Nf-formatted elements.

    Elements are pre-rounded to `decimals` places by the caller, so
    fixed-point formatting renders identically in Spark (Java
    Formatter) and DuckDB (printf) — the binary double sits within an
    ulp of the decimal value and both formatters agree away from exact
    .5 ties.  NULL elements stay JSON null.
    """
    fmt = f"%.{decimals}f"
    return F.to_json(
        F.transform(
            col,
            lambda x: F.when(x.isNotNull(), F.format_string(fmt, x)),
        )
    )


@query(
    "ts_make_series",
    _ORACLE_GRID
    + """
    SELECT event_type,
           to_json(list(strftime(slot, '%Y-%m-%d %H:%M:%S')
                        ORDER BY slot)) AS ts_axis,
           to_json(list(n ORDER BY slot)) AS n,
           to_json(list(printf('%.2f', ROUND(total, 2))
                        ORDER BY slot)) AS total
    FROM grid GROUP BY event_type ORDER BY event_type
    """,
    doc="Kusto make-series: per-event-type count+sum onto a regular "
    "6h grid over [2024-01-01, 2024-01-15), zero-filled empty slots, "
    "aligned arrays (operators/timeseries.py).  Arrays serialized to "
    "JSON strings (Kusto dynamic rendering; driver-harness-sortable)",
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
        _json_ts("ts_axis").alias("ts_axis"),
        F.to_json("n").alias("n"),
        _json_fixed(
            F.transform("total", lambda x: F.round(x, 2)), 2
        ).alias("total"),
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
           to_json(list(printf('%.2f', ROUND(avg_c, 0) / 100)
                        ORDER BY slot)) AS ma
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
        _json_fixed(
            F.transform(
                series_moving_avg(cents, 4), lambda x: F.round(x, 0) / 100
            ),
            2,
        ).alias("ma"),
    ).orderBy("event_type")


@query(
    "ts_series_fill",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(to_timestamp(
               FLOOR((epoch(CAST(ts AS TIMESTAMP))
                      - epoch(TIMESTAMP '2024-01-01')) / 900) * 900
               + epoch(TIMESTAMP '2024-01-01')) AS TIMESTAMP) AS slot,
             value
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
    ),
    agg AS (
      SELECT event_type, slot, SUM(value) AS total
      FROM ev GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT event_type FROM ev),
    slots AS (
      SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-14 23:45:00',
                                    INTERVAL 15 MINUTE)) AS slot
    ),
    cents AS (
      SELECT k.event_type, s.slot,
             CAST(ROUND(a.total * 100, 0) AS BIGINT) AS c
      FROM keys k CROSS JOIN slots s
      LEFT JOIN agg a ON a.event_type = k.event_type AND a.slot = s.slot
    ),
    filled AS (
      SELECT event_type, slot, c,
             last_value(c IGNORE NULLS) OVER wp AS prev_c,
             last_value(CASE WHEN c IS NOT NULL THEN slot END IGNORE NULLS)
                 OVER wp AS prev_slot,
             first_value(c IGNORE NULLS) OVER wn AS next_c,
             first_value(CASE WHEN c IS NOT NULL THEN slot END IGNORE NULLS)
                 OVER wn AS next_slot
      FROM cents
      WINDOW wp AS (PARTITION BY event_type ORDER BY slot
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY slot
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    lin AS (
      SELECT event_type, slot,
             ROUND(prev_c / 100.0, 4) AS ff,
             ROUND(next_c / 100.0, 4) AS fb,
             -- FLOOR-scaling, not ROUND: interpolation lands on exact
             -- .5 rounding ties, where Spark (decimal half-up) and
             -- DuckDB (binary) disagree; FLOOR of the same IEEE double
             -- is engine-independent
             FLOOR((CASE
               WHEN c IS NOT NULL THEN c * 1.0
               WHEN prev_c IS NULL THEN next_c * 1.0
               WHEN next_c IS NULL THEN prev_c * 1.0
               -- index-based fraction (identical integer operands to
               -- the engine's numpy (i - pi) / (ni - pi), so the
               -- IEEE division result is bit-identical; epoch-seconds
               -- ratios differ in the last ulp and flip ROUND at
               -- .00005 boundaries)
               ELSE prev_c + (next_c - prev_c)
                    * (((epoch(slot) - epoch(prev_slot)) / 900)
                       / ((epoch(next_slot) - epoch(prev_slot)) / 900))
             END / 100.0) * 10000) / 10000 AS li
      FROM filled
    ),
    qs AS (
      SELECT event_type,
             list_sort(list(c) FILTER (c IS NOT NULL)) AS nn
      FROM cents GROUP BY 1
    ),
    scored AS (
      SELECT c.event_type, c.slot,
             CASE
               WHEN c.c IS NULL OR iqr = 0 THEN 0.0
               ELSE FLOOR(((c.c - med) * 1.0 / iqr) * 1000000) / 1000000
             END AS sc
      FROM cents c JOIN (
        SELECT event_type,
               nn[greatest(CAST(ceil(len(nn) * 0.5) AS INT), 1)] AS med,
               nn[greatest(CAST(ceil(len(nn) * 0.75) AS INT), 1)]
                 - nn[greatest(CAST(ceil(len(nn) * 0.25) AS INT), 1)] AS iqr
        FROM qs
      ) q ON q.event_type = c.event_type
    )
    SELECT l.event_type,
           to_json(list(printf('%.4f', l.ff) ORDER BY l.slot))
               AS fill_forward,
           to_json(list(printf('%.4f', l.fb) ORDER BY l.slot))
               AS fill_backward,
           to_json(list(printf('%.4f', l.li) ORDER BY l.slot))
               AS fill_linear,
           to_json(list(printf('%.6f', s.sc) ORDER BY l.slot))
               AS outlier_score
    FROM lin l JOIN scored s
      ON s.event_type = l.event_type AND s.slot = l.slot
    GROUP BY l.event_type ORDER BY l.event_type
    """,
    doc="Kusto series_fill_forward / series_fill_backward / "
    "series_fill_linear / "
    "series_outliers over a 15-min make-series grid with ~half the "
    "slots empty: forward fill carries the last value, linear fill "
    "interpolates interior gaps (edges take the nearest value), "
    "outlier score = Tukey (x - median)/IQR by nearest-rank quartiles. "
    "All JVM array expressions after the grid agg; computed in integer "
    "cents so both engines' arithmetic is bit-identical",
)
def ts_series_fill(spark, sf_dir):
    from ..operators.timeseries import (
        series_fill_backward,
        series_fill_forward,
        series_fill_linear,
        series_outliers,
    )

    ev = load_table(spark, "events", sf_dir)
    out = make_series(
        ev, "ts", {"total": F.sum("value")},
        _START, _STOP, datetime.timedelta(minutes=15),
        by=["event_type"],
    )
    cents = F.transform(
        F.col("total"),
        lambda x: F.when(
            x.isNotNull(), F.round(x * 100, 0).cast("bigint")
        ),
    )
    return out.select(
        "event_type",
        _json_fixed(
            F.transform(
                series_fill_forward(cents), lambda x: F.round(x / 100, 4)
            ),
            4,
        ).alias("fill_forward"),
        _json_fixed(
            F.transform(
                series_fill_backward(cents), lambda x: F.round(x / 100, 4)
            ),
            4,
        ).alias("fill_backward"),
        _json_fixed(
            F.transform(
                series_fill_linear(cents),
                lambda x: F.floor(x / 100 * 10000) / 10000,
            ),
            4,
        ).alias("fill_linear"),
        _json_fixed(
            F.transform(
                series_outliers(cents),
                lambda x: F.floor(x * 1000000) / 1000000,
            ),
            6,
        ).alias("outlier_score"),
    ).orderBy("event_type")


_DECOMP_BASE = """
    WITH d AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             COUNT(*) AS n
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-31'
      GROUP BY 1, 2
    ), idxed AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', day) AS INT) AS idx,
             CAST(n AS DOUBLE) AS v
      FROM d
    ), ph AS (
      SELECT *, median(v) OVER (PARTITION BY event_type, idx % 7) AS pm
      FROM idxed
    ), se AS (
      SELECT *, ROUND(pm - avg(pm) OVER (PARTITION BY event_type), 4)
                  AS seasonal
      FROM ph
    ), tr AS (
      SELECT *, ROUND(avg(v - seasonal) OVER (PARTITION BY event_type), 4)
                  AS trend
      FROM se
    ), dec AS (
      SELECT event_type, idx, CAST(v AS BIGINT) AS n, seasonal, trend,
             ROUND(seasonal + trend, 4) AS baseline,
             ROUND(v - ROUND(seasonal + trend, 4), 4) AS residual
      FROM tr
    )
"""


def _daily_counts(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-31").cast("timestamp"))
        )
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("date")
            ).alias("idx"),
        )
        .agg(F.count("*").alias("n"))
        .withColumn("v", F.col("n").cast("double"))
    )


@query(
    "ts_series_decompose",
    _DECOMP_BASE + "SELECT * FROM dec",
    doc="Kusto series_decompose profile over daily per-event-type "
    "counts (period 7, trend='avg' — Kusto's default): seasonal = "
    "zero-centered per-phase median, trend = mean of the deseasoned "
    "series, baseline/residual derived — pure window aggregates, one "
    "shuffle by key.  Integer daily counts keep every intermediate "
    "double exactly representable, so both engines' windows agree "
    "bit-for-bit before rounding",
)
def ts_series_decompose(spark, sf_dir):
    from ..operators.timeseries import series_decompose

    base = _daily_counts(spark, sf_dir)
    return series_decompose(
        base, ["event_type"], "idx", "v", period=7, trend="avg"
    ).select(
        "event_type", "idx", "n", "seasonal", "trend", "baseline", "residual"
    )


@query(
    "ts_series_anomalies",
    _DECOMP_BASE
    + """
    , fen AS (
      SELECT *,
             quantile_cont(residual, 0.25) OVER (PARTITION BY event_type)
               AS q1,
             quantile_cont(residual, 0.75) OVER (PARTITION BY event_type)
               AS q3
      FROM dec
    )
    SELECT event_type, idx, n, baseline, residual,
           CASE WHEN residual > q3 + 1.5 * (q3 - q1) THEN 1
                WHEN residual < q1 - 1.5 * (q3 - q1) THEN -1
                ELSE 0 END AS ad_flag,
           ROUND(CASE
             WHEN residual > q3 + 1.5 * (q3 - q1)
               THEN residual - (q3 + 1.5 * (q3 - q1))
             WHEN residual < q1 - 1.5 * (q3 - q1)
               THEN (q1 - 1.5 * (q3 - q1)) - residual
             ELSE 0.0 END, 4) AS ad_score
    FROM fen
    """,
    doc="Kusto series_decompose_anomalies profile: decompose (period "
    "7, trend='avg'), then Tukey fences (k=1.5, exact interpolated "
    "quartiles — the same fence series_outliers uses) on the per-key "
    "residuals; ad_flag +1/-1/0 and ad_score = distance beyond the "
    "fence.  Window aggregates only",
)
def ts_series_anomalies(spark, sf_dir):
    from ..operators.timeseries import series_anomalies

    base = _daily_counts(spark, sf_dir)
    return series_anomalies(
        base, ["event_type"], "idx", "v", period=7, k=1.5, trend="avg"
    ).select(
        "event_type", "idx", "n", "baseline", "residual",
        "ad_flag", "ad_score",
    )


@query(
    "ts_series_fit_line",
    _ORACLE_GRID
    + """
    , idx AS (
      SELECT event_type, total,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY slot) - 1 AS DOUBLE)
               AS x
      FROM grid
    )
    SELECT event_type,
           ROUND(regr_slope(total, x), 4) AS slope,
           ROUND(regr_intercept(total, x), 4) AS intercept
    FROM idx GROUP BY event_type ORDER BY event_type
    """,
    doc="Kusto series_fit_line: least-squares trend over the regular "
    "make-series grid (slope+intercept per key, x = slot index).  The "
    "fit is a decomposable aggregate (regr_slope/regr_intercept) — "
    "partial-aggregated map-side, one shuffle of per-key moments, "
    "never a per-key collect",
)
def ts_series_fit_line(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    grid = make_series(
        ev,
        "ts",
        {"total": F.sum("value")},
        _START,
        _STOP,
        _STEP,
        by=["event_type"],
        defaults={"total": 0},
    )
    pts = grid.select(
        "event_type", F.posexplode("total").alias("x", "y")
    )
    return (
        pts.groupBy("event_type")
        .agg(
            F.round(
                F.expr("regr_slope(y, CAST(x AS DOUBLE))"), 4
            ).alias("slope"),
            F.round(
                F.expr("regr_intercept(y, CAST(x AS DOUBLE))"), 4
            ).alias("intercept"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_series_fit_2lines",
    _ORACLE_GRID
    + """
    , pts AS (
      SELECT event_type, total AS y,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY slot) - 1 AS DOUBLE)
               AS x
      FROM grid
    ), cand AS (
      SELECT p.event_type, p.x, p.y, s.s,
             CAST(p.x < s.s AS INT) AS is_left
      FROM pts p CROSS JOIN (
        SELECT CAST(unnest(range(2, 55)) AS DOUBLE) AS s) s
    ), side AS (
      SELECT event_type, s, is_left,
             regr_syy(y, x) - regr_sxy(y, x) * regr_sxy(y, x)
               / regr_sxx(y, x) AS rss,
             regr_slope(y, x) AS slope,
             regr_intercept(y, x) AS icpt
      FROM cand GROUP BY event_type, s, is_left
    ), tot AS (
      SELECT event_type, s, ROUND(SUM(rss), 4) AS total_rss
      FROM side GROUP BY event_type, s
    ), best AS (
      SELECT event_type, s, total_rss FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY total_rss, s) AS rn
        FROM tot) WHERE rn = 1
    )
    SELECT b.event_type, CAST(b.s AS BIGINT) AS split_idx,
           b.total_rss,
           ROUND(MAX(CASE WHEN is_left = 1 THEN slope END), 4)
             AS slope_left,
           ROUND(MAX(CASE WHEN is_left = 1 THEN icpt END), 4)
             AS icpt_left,
           ROUND(MAX(CASE WHEN is_left = 0 THEN slope END), 4)
             AS slope_right,
           ROUND(MAX(CASE WHEN is_left = 0 THEN icpt END), 4)
             AS icpt_right
    FROM best b JOIN side USING (event_type, s)
    GROUP BY b.event_type, b.s, b.total_rss
    ORDER BY b.event_type
    """,
    doc="Kusto series_fit_2lines: best two-segment least-squares fit "
    "over the regular grid — every candidate changepoint scored via "
    "the decomposable regr_* moments (rss = syy - sxy^2/sxx), argmin "
    "per key, both segments' params emitted.  Candidates x points is "
    "a broadcast expansion of the GRID (slots x splits, ~3k rows per "
    "key), never of the raw events — at 100 TB the heavy reduction "
    "to the grid happens first and the changepoint search cost is "
    "independent of input size",
)
def ts_series_fit_2lines(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    grid = make_series(
        ev,
        "ts",
        {"total": F.sum("value")},
        _START,
        _STOP,
        _STEP,
        by=["event_type"],
        defaults={"total": 0},
    )
    pts = grid.select(
        "event_type", F.posexplode("total").alias("xi", "y")
    ).select("event_type", F.col("xi").cast("double").alias("x"), "y")
    n_slots = int((_STOP - _START) / _STEP)  # 56
    splits = spark.range(2, n_slots - 1).select(
        F.col("id").cast("double").alias("s")
    )
    cand = pts.crossJoin(F.broadcast(splits)).withColumn(
        "is_left", (F.col("x") < F.col("s")).cast("int")
    )
    side = cand.groupBy("event_type", "s", "is_left").agg(
        (
            F.expr("regr_syy(y, x)")
            - F.expr("regr_sxy(y, x)") * F.expr("regr_sxy(y, x)")
            / F.expr("regr_sxx(y, x)")
        ).alias("rss"),
        F.expr("regr_slope(y, x)").alias("slope"),
        F.expr("regr_intercept(y, x)").alias("icpt"),
    )
    tot = side.groupBy("event_type", "s").agg(
        F.round(F.sum("rss"), 4).alias("total_rss")
    )
    w = Window.partitionBy("event_type").orderBy("total_rss", "s")
    best = (
        tot.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    joined = best.join(side, ["event_type", "s"])
    return (
        joined.groupBy("event_type", "s", "total_rss")
        .agg(
            F.round(
                F.max(F.when(F.col("is_left") == 1, F.col("slope"))), 4
            ).alias("slope_left"),
            F.round(
                F.max(F.when(F.col("is_left") == 1, F.col("icpt"))), 4
            ).alias("icpt_left"),
            F.round(
                F.max(F.when(F.col("is_left") == 0, F.col("slope"))), 4
            ).alias("slope_right"),
            F.round(
                F.max(F.when(F.col("is_left") == 0, F.col("icpt"))), 4
            ).alias("icpt_right"),
        )
        .select(
            "event_type",
            F.col("s").cast("long").alias("split_idx"),
            "total_rss",
            "slope_left",
            "icpt_left",
            "slope_right",
            "icpt_right",
        )
        .orderBy("event_type")
    )


@query(
    "ts_series_fir",
    """
    WITH base AS (
      SELECT event_type,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)
                   - TIMESTAMP '2024-01-01') / 86400) AS BIGINT) AS idx,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-31'
      GROUP BY event_type, idx
    ), fir AS (
      SELECT event_type, idx,
             1.0 * v
             + 2.0 * COALESCE(LAG(v, 1) OVER w, 0)
             + 3.0 * COALESCE(LAG(v, 2) OVER w, 0)
             + 4.0 * COALESCE(LAG(v, 3) OVER w, 0) AS f
      FROM base
      WINDOW w AS (PARTITION BY event_type ORDER BY idx)
    )
    SELECT event_type,
           to_json(list(printf('%.1f', f) ORDER BY idx)) AS fir
    FROM fir GROUP BY event_type ORDER BY event_type
    """,
    doc="Kusto series_fir: weighted trailing filter [1,2,3,4] over "
    "daily per-event-type counts, zero-padded at the series start — "
    "one JVM transform/aggregate expression over the assembled array, "
    "no re-shuffle; integer counts keep every product/sum exactly "
    "representable so both engines agree bit-for-bit",
)
def ts_series_fir(spark, sf_dir):
    from ..operators.timeseries import series_fir

    base = _daily_counts(spark, sf_dir)
    series = (
        base.groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("idx", "v"))
            ).alias("pairs")
        )
        .select(
            "event_type",
            F.transform(F.col("pairs"), lambda p: p["v"]).alias("vs"),
        )
    )
    return series.select(
        "event_type",
        _json_fixed(series_fir("vs", [1.0, 2.0, 3.0, 4.0]), 1).alias("fir"),
    ).orderBy("event_type")


@query(
    "ts_series_pearson_corr",
    """
    WITH base AS (
      SELECT event_type,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)
                   - TIMESTAMP '2024-01-01') / 86400) AS BIGINT) AS idx,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS u
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-31'
      GROUP BY event_type, idx
    )
    SELECT event_type, ROUND(corr(n, u), 6) AS r
    FROM base GROUP BY event_type ORDER BY event_type
    """,
    doc="Kusto series_pearson_correlation between two per-key series "
    "(daily event count vs daily distinct users) — five running sums "
    "in one JVM array expression, no explode/shuffle after the series "
    "assembles; rounded to 6 dp (Spark computes the closed form, "
    "DuckDB corr() uses a streaming estimator; they agree well past "
    "6 dp on integer-valued series)",
)
def ts_series_pearson_corr(spark, sf_dir):
    from ..operators.timeseries import series_pearson_correlation

    ev = load_table(spark, "events", sf_dir)
    base = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-31").cast("timestamp"))
        )
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("date")
            ).alias("idx"),
        )
        .agg(
            F.count("*").cast("double").alias("n"),
            F.countDistinct("user_id").cast("double").alias("u"),
        )
    )
    series = (
        base.groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("idx", "n", "u"))
            ).alias("pairs")
        )
        .select(
            "event_type",
            F.transform(F.col("pairs"), lambda p: p["n"]).alias("ns"),
            F.transform(F.col("pairs"), lambda p: p["u"]).alias("us"),
        )
    )
    return series.select(
        "event_type",
        F.round(series_pearson_correlation("ns", "us"), 6).alias("r"),
    ).orderBy("event_type")


@query(
    "ts_series_periods",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR((epoch(CAST(ts AS TIMESTAMP))
                   - epoch(TIMESTAMP '2024-01-01')) / 21600) AS BIGINT)
               AS slot
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
    ),
    keys AS (SELECT DISTINCT event_type FROM ev),
    slots AS (SELECT UNNEST(range(0, 56)) AS slot),
    grid AS (
      SELECT k.event_type, s.slot,
             CAST(COALESCE(c.n, 0) AS DOUBLE) AS x
      FROM keys k CROSS JOIN slots s
      LEFT JOIN (SELECT event_type, slot, COUNT(*) AS n
                 FROM ev GROUP BY 1, 2) c
        ON c.event_type = k.event_type AND c.slot = s.slot
    ),
    stats AS (
      SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS s
      FROM grid GROUP BY 1
    ),
    cent AS (
      SELECT g.event_type, g.slot, g.x * st.n - st.s AS c
      FROM grid g JOIN stats st USING (event_type)
    ),
    den AS (SELECT event_type, SUM(c * c) AS den FROM cent GROUP BY 1),
    lags AS (SELECT UNNEST(range(2, 15)) AS lag),
    num AS (
      SELECT a.event_type, l.lag, SUM(a.c * b.c) AS num
      FROM cent a
      CROSS JOIN lags l
      JOIN cent b ON b.event_type = a.event_type
                 AND b.slot = a.slot + l.lag
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT n.event_type, n.lag,
             CASE WHEN d.den <= 0 THEN 0.0
                  ELSE FLOOR(n.num / d.den * 1000000) / 1000000
             END AS score
      FROM num n JOIN den d USING (event_type)
    ),
    ranked AS (
      SELECT event_type, lag, score,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY score DESC, lag) AS rk
      FROM scored
    )
    SELECT event_type, CAST(lag AS DOUBLE) AS period, score
    FROM ranked WHERE rk <= 3
    ORDER BY event_type, period
    """,
    doc="Kusto series_periods_detect (documented autocorrelation "
    "profile): 6-hour count series per event_type, normalized "
    "autocorrelation r(L) over the n-scaled integer series (every "
    "fold term stays an exact integer < 2^53 so both engines sum "
    "identical doubles in any order), FLOOR-scaled scores, top-3 "
    "lags by (score desc, lag asc).  The oracle reproduces the "
    "identical math via a slot self-join — the Spark side is one "
    "pure-JVM array expression per series, no explode of the "
    "candidate lag space",
)
def ts_series_periods(spark, sf_dir):
    from ..functions.kql_parse import translate_expr

    ev = load_table(spark, "events", sf_dir)
    ms = make_series(
        ev, "ts", {"n": F.count(F.lit(1))},
        _START, _STOP, _STEP,
        by=["event_type"], defaults={"n": 0},
    )
    pd_expr = F.expr(translate_expr("series_periods_detect(n, 2, 14, 3)"))
    z = ms.select(
        "event_type",
        F.explode(
            F.arrays_zip(
                pd_expr["periods"].alias("period"),
                pd_expr["scores"].alias("score"),
            )
        ).alias("z"),
    )
    return z.select(
        "event_type",
        F.col("z.period").alias("period"),
        F.col("z.score").alias("score"),
    ).orderBy("event_type", "period")


@query(
    "ts_series_seasonal",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR((epoch(CAST(ts AS TIMESTAMP))
                   - epoch(TIMESTAMP '2024-01-01')) / 21600) AS BIGINT)
               AS slot
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
    ),
    keys AS (SELECT DISTINCT event_type FROM ev),
    slots AS (SELECT UNNEST(range(0, 56)) AS slot),
    grid AS (
      SELECT k.event_type, s.slot,
             CAST(COALESCE(c.n, 0) AS DOUBLE) AS x
      FROM keys k CROSS JOIN slots s
      LEFT JOIN (SELECT event_type, slot, COUNT(*) AS n
                 FROM ev GROUP BY 1, 2) c
        ON c.event_type = k.event_type AND c.slot = s.slot
    ),
    med AS (
      SELECT event_type, slot % 4 AS ph, MEDIAN(x) AS m
      FROM grid GROUP BY 1, 2
    )
    SELECT g.event_type, CAST(g.slot AS INT) AS idx,
           CAST(m.m AS DOUBLE) AS seasonal
    FROM grid g JOIN med m
      ON m.event_type = g.event_type AND m.ph = g.slot % 4
    ORDER BY 1, 2
    """,
    doc="Kusto series_seasonal (per-phase median profile, period 4 = "
    "daily cycle at 6-hour bins): medians of integer counts land on "
    "exact .0/.5 doubles, so no rounding is needed on either engine. "
    "Spark side is the pure-JVM array lambda (sort-filter-median per "
    "phase, computed once per series via 1-element transform "
    "bindings), exploded back to rows only for the oracle compare",
)
def ts_series_seasonal(spark, sf_dir):
    from ..functions.kql_parse import translate_expr

    ev = load_table(spark, "events", sf_dir)
    ms = make_series(
        ev, "ts", {"n": F.count(F.lit(1))},
        _START, _STOP, _STEP,
        by=["event_type"], defaults={"n": 0},
    )
    ss = F.expr(translate_expr("series_seasonal(n, 4)"))
    z = ms.select("event_type", F.posexplode(ss).alias("idx", "seasonal"))
    return z.select(
        "event_type",
        F.col("idx").cast("int").alias("idx"),
        F.col("seasonal").cast("double").alias("seasonal"),
    ).orderBy("event_type", "idx")


@query(
    "ts_series_forecast",
    _DECOMP_BASE
    + """
    , prof AS (
      SELECT DISTINCT event_type, idx % 7 AS ph, seasonal FROM dec
    ),
    fit AS (
      SELECT event_type, MAX(idx) AS mx, MIN(trend) AS trend
      FROM dec GROUP BY 1
    ),
    fut AS (
      SELECT f.event_type, UNNEST(range(f.mx + 1, f.mx + 15)) AS idx,
             f.trend
      FROM fit f
    )
    SELECT u.event_type, CAST(u.idx AS INT) AS idx,
           ROUND(p.seasonal + u.trend, 4) AS forecast
    FROM fut u JOIN prof p
      ON p.event_type = u.event_type AND p.ph = u.idx % 7
    ORDER BY 1, 2
    """,
    doc="Kusto series_decompose_forecast profile (trend='avg'): fit "
    "the decompose model on 30 observed daily counts, extrapolate 14 "
    "future days per event_type — forecast = per-phase seasonal "
    "median + constant trend.  Model fit is one groupBy per "
    "component; the future axis is a sequence explode joined to the "
    "(key, phase) profile — never rescans the data",
)
def ts_series_forecast(spark, sf_dir):
    from ..operators.timeseries import series_decompose_forecast

    base = _daily_counts(spark, sf_dir)
    out = series_decompose_forecast(
        base, ["event_type"], "idx", "v", period=7, horizon=14,
        trend="avg",
    )
    return out.select(
        "event_type", F.col("idx").cast("int").alias("idx"), "forecast"
    ).orderBy("event_type", "idx")


@query(
    "kql_series_decompose",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01',
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS INT) AS idx
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-31'
    ),
    keys AS (SELECT DISTINCT event_type FROM ev),
    slots AS (SELECT CAST(UNNEST(range(0, 30)) AS INT) AS idx),
    grid AS (
      SELECT k.event_type, s.idx, CAST(COALESCE(c.n, 0) AS DOUBLE) AS v
      FROM keys k CROSS JOIN slots s
      LEFT JOIN (SELECT event_type, idx, COUNT(*) AS n
                 FROM ev GROUP BY 1, 2) c
        ON c.event_type = k.event_type AND c.idx = s.idx
    ),
    ph AS (
      SELECT *, median(v) OVER (PARTITION BY event_type, idx % 7) AS pm
      FROM grid
    ),
    se AS (
      SELECT *, ROUND(pm - avg(pm) OVER (PARTITION BY event_type), 4)
                  AS seasonal
      FROM ph
    ),
    tr AS (
      SELECT *, ROUND(avg(v - seasonal) OVER (PARTITION BY event_type), 4)
                  AS trend
      FROM se
    )
    SELECT event_type, idx, seasonal, trend,
           ROUND(seasonal + trend, 4) AS baseline,
           ROUND(v - ROUND(seasonal + trend, 4), 4) AS residual
    FROM tr ORDER BY event_type, idx
    """,
    doc="KQL array-level series_decompose (the make-series | extend "
    "d = series_decompose(n, 7, 'avg') chain): the Arrow kernel "
    "reproduces the row-level operator's math EXACTLY (sequential "
    "left-to-right means matching Spark's window accumulation; "
    "pytest pins kernel == operator), exploded back to rows only for "
    "the oracle compare over a zero-filled daily grid",
)
def kql_series_decompose(spark, sf_dir):
    from ..functions.kql_parse import (
        ensure_series_functions,
        translate_expr,
    )

    ensure_series_functions(spark)

    ev = load_table(spark, "events", sf_dir)
    ms = make_series(
        ev, "ts", {"n": F.count(F.lit(1))},
        _START, datetime.datetime(2024, 1, 31),
        datetime.timedelta(days=1),
        by=["event_type"], defaults={"n": 0},
    )
    d = F.expr(translate_expr("series_decompose(n, 7, 'avg')"))
    z = ms.select(
        "event_type",
        F.posexplode(
            F.arrays_zip(
                d["seasonal"].alias("seasonal"),
                d["trend"].alias("trend"),
                d["baseline"].alias("baseline"),
                d["residual"].alias("residual"),
            )
        ).alias("idx", "z"),
    )
    return z.select(
        "event_type",
        F.col("idx").cast("int").alias("idx"),
        F.col("z.seasonal").alias("seasonal"),
        F.col("z.trend").alias("trend"),
        F.col("z.baseline").alias("baseline"),
        F.col("z.residual").alias("residual"),
    ).orderBy("event_type", "idx")
