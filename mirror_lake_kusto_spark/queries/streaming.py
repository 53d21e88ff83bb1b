"""Event-time window queries (SURVEY §2.I) + as-of join, batch-mode.

These run the *same* logical plans the streaming module produces
(streaming/windows.py takes batch or streaming DataFrames identically);
here they execute as batch over the ``events`` fixture so the DuckDB
oracle can check them.  tests/test_streaming.py runs the true streaming
twins (file source, AvailableNow) and asserts stream ≡ batch.

Oracle timestamps: ``CAST(ts AS TIMESTAMP)`` truncates DuckDB's
TIMESTAMP_NS to µs = Spark's TimestampType; window arithmetic uses
explicit epoch math so both engines share the 1970-01-01-aligned grid.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators.temporal import asof_join
from ..sources.tables import load_table
from ..streaming import windows as W
from .base import query

# ---------------------------------------------------------------------------
# windowed aggregation
# ---------------------------------------------------------------------------


@query(
    "s1_tumbling_window",
    """
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
    SELECT event_type,
           TIMESTAMP '1970-01-01' + (floor(epoch(ts))::BIGINT // 3600) * 3600
               * INTERVAL 1 SECOND AS window_start,
           TIMESTAMP '1970-01-01' + ((floor(epoch(ts))::BIGINT // 3600) * 3600 + 3600)
               * INTERVAL 1 SECOND AS window_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM e GROUP BY 1, 2, 3
    """,
    doc="1-hour tumbling event-time window by event_type (I4); same "
    "plan runs streaming with watermark state eviction",
)
def s1_tumbling_window(spark, sf_dir):
    return W.tumbling_agg(load_table(spark, "events", sf_dir), "ts", "1 hour")


@query(
    "s2_sliding_window",
    """
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
    x AS (
      SELECT event_type, value,
             TIMESTAMP '1970-01-01' + ((floor(epoch(ts))::BIGINT // 1800) * 1800
                 - k.k * 1800) * INTERVAL 1 SECOND AS window_start
      FROM e CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
    )
    SELECT event_type, window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM x GROUP BY 1, 2
    """,
    doc="1-hour window sliding every 30 min: each event expands into "
    "duration/slide windows map-side (explode, not self-join) — linear "
    "cost, scale-stable",
)
def s2_sliding_window(spark, sf_dir):
    return W.sliding_agg(load_table(spark, "events", sf_dir), "ts", "1 hour", "30 minutes")


@query(
    "s3_session_window",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    l AS (
      SELECT *, CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                   (PARTITION BY user_id ORDER BY ts)) <= 1800
               THEN 0 ELSE 1 END AS brk
      FROM e
    ),
    s AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM l
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    doc="per-user session windows, 30-min inactivity gap; oracle is the "
    "gaps-and-islands formulation — session_end = last event + gap "
    "(Spark session_window semantics)",
)
def s3_session_window(spark, sf_dir):
    return W.session_agg(load_table(spark, "events", sf_dir), "ts", "30 minutes")


@query(
    "s4_stateful_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="watermarked stateful dedup (dropDuplicatesWithinWatermark on "
    "streams, bounded state); batch twin over exactly the key columns "
    "is DISTINCT — deterministic for the oracle",
)
def s4_stateful_dedup(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    return W.stateful_dedup(ev, keys=("user_id", "event_type"), ts_col="ts").select(
        "user_id", "event_type"
    )


@query(
    "s6_dedup_with_counts",
    """
    SELECT user_id, event_type,
           MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id, event_type
    """,
    doc="custom stateful operator (applyInPandasWithState on streams, "
    "EventTimeTimeout): per-key first-seen ts + duplicate count — what "
    "dropDuplicatesWithinWatermark cannot express; batch twin is a "
    "plain aggregate, stream ≡ batch asserted in tests",
)
def s6_dedup_with_counts(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    return W.dedup_with_counts(ev, keys=("user_id", "event_type"), ts_col="ts")


# ---------------------------------------------------------------------------
# temporal join
# ---------------------------------------------------------------------------


@query(
    "s5_asof_join",
    """
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
               WHERE event_type = 'error'),
    c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
          WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, e.ts,
           c.ts AS ts_right, c.value AS value_right
    FROM e ASOF LEFT JOIN c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc="backward as-of join: each error event gets the user's latest "
    "click at-or-before it; union + ordered-window carry-forward — one "
    "shuffle, no range nested-loop (operators/temporal.py)",
)
def s5_asof_join(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    return asof_join(errors, clicks, on=["user_id"], right_cols=["ts", "value"])


@query(
    "s7_interval_join",
    """
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                      event_type FROM events),
    c AS (SELECT user_id, ts AS cts, event_id AS click_id
          FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS pts, event_id AS purchase_id
          FROM e WHERE event_type = 'purchase')
    SELECT c.user_id, click_id, purchase_id,
           CAST(epoch_ms(pts) - epoch_ms(cts) AS BIGINT) AS ms_to_purchase
    FROM c JOIN p ON c.user_id = p.user_id
               AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
    """,
    doc="stream-stream interval join (I4 beyond-ref): each click pairs "
    "with that user's purchases within the following hour — the "
    "funnel/attribution shape; time bound in the join condition so "
    "streaming state evicts by watermark",
)
def s7_interval_join(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = W.interval_join(clicks, purchases, "user_id", "ts", upper="1 hour")
    return out.select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        (F.unix_millis("r_ts") - F.unix_millis("l_ts")).alias("ms_to_purchase"),
    )


@query(
    "s8_funnel_dropout",
    """
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                      event_type FROM events),
    c AS (SELECT user_id, ts AS cts, event_id AS click_id
          FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS pts FROM e WHERE event_type = 'purchase')
    SELECT c.user_id, click_id, cts AS ts
    FROM c
    WHERE NOT EXISTS (
      SELECT 1 FROM p WHERE p.user_id = c.user_id
        AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
    )
    """,
    doc="funnel dropout (I4 beyond-ref): clicks with NO purchase by the "
    "same user within the following hour -- the left-outer interval "
    "join filtered to null matches; in streaming mode the null-match "
    "emits once the watermark proves no purchase can still arrive",
)
def s8_funnel_dropout(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = W.interval_join(
        clicks, purchases, "user_id", "ts", upper="1 hour", how="left_outer"
    )
    return out.filter(F.col("r_event_id").isNull()).select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_event_id").alias("click_id"),
        F.col("l_ts").alias("ts"),
    )
