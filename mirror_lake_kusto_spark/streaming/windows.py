"""Event-time windowed aggregation + stateful dedup (SURVEY §2.I).

The reference has *no* event-time surface — its only stream is the
strictly-ordered Delta commit log polled every 5 s (reference
Orchestrations/DeltaTableOrchestration.cs:16,50-83, I1/I4).  The engine
adds the standard late-data toolkit over the ``events`` fixture:
tumbling / sliding / session windows and watermarked dedup.

Every function here takes *any* DataFrame — batch or streaming — and
returns the same logical plan for both.  That is the Spark-first design:
the batch run is the DuckDB-oracle-checkable twin of the streaming run,
and tests assert stream(AvailableNow) ≡ batch on identical input.

Scale notes (100 TB posture):
- A windowed groupBy shuffles once on (window, *keys); with watermarks
  the streaming state store evicts closed windows, so state is bounded
  by (active windows × key cardinality), not history length.
- ``session_window`` merges per-key on the shuffle; skewed users are the
  hazard — AQE skew-join handles the batch twin, and for streams the
  gap parameter bounds session growth.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _std_aggs() -> list[Column]:
    return [
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ]


def _windowed(
    df: DataFrame,
    window_col: Column,
    window_name: str,
    out_prefix: str,
    keys: Sequence[str],
    aggs: Sequence[Column] | None,
) -> DataFrame:
    out = df.groupBy(window_col, *keys).agg(*(aggs or _std_aggs()))
    agg_cols = [c for c in out.columns if c not in (window_name, *keys)]
    return out.select(
        *keys,
        F.col(f"{window_name}.start").alias(f"{out_prefix}_start"),
        F.col(f"{window_name}.end").alias(f"{out_prefix}_end"),
        *agg_cols,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time buckets (I4).

    One shuffle on (window, keys); partial aggregation runs map-side
    before the exchange, so per-window traffic is O(distinct keys).
    """
    return _windowed(df, F.window(F.col(ts_col), duration), "window", "window", keys, aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: Sequence[str] = ("event_type",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows.

    Spark expands the event into its covering windows *before* the
    shuffle (an explode, not a self-join), so cost scales linearly with
    the overlap factor — the plan survives 100× data unchanged.
    """
    return _windowed(
        df, F.window(F.col(ts_col), duration, slide), "window", "window", keys, aggs
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: Sequence[str] = ("user_id",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Dynamic-width sessions: a session closes after ``gap`` of
    inactivity; ``session_end`` = last event + gap (Spark semantics).

    Batch twin of the DuckDB gaps-and-islands formulation (lag + running
    sum of gap-breaks) — asserted equivalent in the oracle gate.
    """
    return _windowed(
        df, F.session_window(F.col(ts_col), gap), "session_window", "session", keys, aggs
    )


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound (I4): streaming state for windows older than
    max(event time) - delay is finalized and evicted.  No-op on batch
    DataFrames (watermarks only affect streaming plans) — the same
    pipeline code serves both modes.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def stateful_dedup(
    df: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon.

    Streaming: ``dropDuplicatesWithinWatermark`` — state holds one entry
    per key seen in the last ``delay``, evicted by watermark (bounded
    state; a plain ``dropDuplicates`` on a stream would grow forever).
    Batch: plain ``dropDuplicates`` (the whole input IS the horizon).
    This is the streaming generalization of the reference's
    last-writer-wins checkpoint dedup (Storage/GlobalTableStatus.cs:72-74).
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def dedup_with_counts(
    df: DataFrame,
    keys: Sequence[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator (J2 beyond-reference surface): per-key
    first-seen timestamp AND the number of occurrences inside the
    watermark horizon — the thing ``dropDuplicatesWithinWatermark``
    cannot express (it discards the duplicate count).

    Streaming: ``applyInPandasWithState`` with EventTimeTimeout.  State
    per key = (first_us, last_us, n); each micro-batch folds its Arrow
    batches into the state; the summary row is emitted when the
    watermark passes last-event + delay, then the state is freed —
    bounded by live-key cardinality, not history.
    Batch twin: ``groupBy(keys).agg(min(ts), count(*))`` — asserted
    equal in tests/test_streaming.py.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    if not df.isStreaming:
        return df.groupBy(*keys).agg(
            F.min(ts_col).alias("first_ts"), F.count("*").alias("n_events")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            *[df.schema[k] for k in keys],
            StructField("first_ts", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("first_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    delay_ms = int(pd.Timedelta(delay).total_seconds() * 1000)

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            first_us, _last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    **{k: [v] for k, v in zip(keys, key)},
                    "first_ts": [pd.to_datetime(first_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        first_us = last_us = None
        n = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            ts = pd.to_datetime(pdf[ts_col])
            lo = ts.min().value // 1000
            hi = ts.max().value // 1000
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        if n == 0:
            return
        if state.exists:
            f0, l0, n0 = state.get
            first_us, last_us, n = min(f0, first_us), max(l0, last_us), n0 + n
        state.update((first_us, last_us, n))
        # fire once the watermark passes this key's horizon (must be set
        # strictly ahead of the current watermark)
        state.setTimeoutTimestamp(
            max(last_us // 1000 + delay_ms, state.getCurrentWatermarkMs() + 1)
        )

    return (
        df.withWatermark(ts_col, delay)
        .groupBy(*keys)
        .applyInPandasWithState(
            fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    upper: str = "1 hour",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval join: pair each left row with
    every right row of the same key whose timestamp falls in
    ``[left.ts, left.ts + upper]`` — the funnel/attribution join
    (click -> purchase within an hour).

    All columns come back prefixed ``l_``/``r_``.  The time bound lives
    IN the join condition, which is what lets Structured Streaming
    evict state: with a watermark on both sides, left rows older than
    watermark+upper and right rows older than watermark are dropped
    from the join state (Spark's stream-stream inner-join contract).
    Batch mode runs the identical plan with no state at all.

    ``how="left_outer"`` emits the null-match row for a left row once
    the watermark proves no in-interval right row can still arrive —
    the funnel-dropout query (clicks with NO purchase within an hour).
    Streaming outer joins REQUIRE a watermark; batch runs it stateless.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"interval_join supports inner/left_outer: {how!r}")
    if how == "left_outer" and watermark is None and left.isStreaming:
        raise ValueError("streaming left_outer interval_join needs a watermark")
    lsel = left.select([F.col(c).alias("l_" + c) for c in left.columns])
    rsel = right.select([F.col(c).alias("r_" + c) for c in right.columns])
    if watermark is not None and left.isStreaming:
        lsel = lsel.withWatermark("l_" + ts_col, watermark)
        rsel = rsel.withWatermark("r_" + ts_col, watermark)
    cond = (
        (F.col("l_" + key_col) == F.col("r_" + key_col))
        & (F.col("r_" + ts_col) >= F.col("l_" + ts_col))
        & (
            F.col("r_" + ts_col)
            <= F.col("l_" + ts_col) + F.expr(f"INTERVAL {upper}")
        )
    )
    return lsel.join(rsel, cond, how)
