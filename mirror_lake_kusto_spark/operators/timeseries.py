"""Kusto ``make-series`` and series functions, Spark-first.

``make-series`` is Kusto's flagship time-series operator: per group,
aggregate onto a REGULAR time grid (fixed step, explicit [start, stop)
range) and return the whole series as aligned arrays, filling empty
slots with a default.  The reference's ecosystem leans on it for every
time-chart; an engine claiming dialect parity needs it as a first-class
operator (SURVEY §2.I/§2.D adjacents).

Scale posture: the heavy input is reduced FIRST by a (keys, slot)
groupBy — partial aggregation map-side, one shuffle keyed by
(group, slot) — and only then joined against the key×grid frame, whose
size is |groups| × n_slots (independent of input row count).  The grid
join co-partitions on the same composite key, and the final per-group
collect_list gathers n_slots elements per group — bounded by the
requested grid, never by the data.  No driver-side loops, no Python
UDFs: the grid is ``sequence``+``explode``, array assembly is
``array_sort(collect_list(struct(...)))`` + ``transform``, all
whole-stage-codegen expressions.

Series post-processing (``series_moving_avg``, ``series_stats``) runs
as JVM higher-order functions over the arrays — no shuffle at all.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["make_series", "series_moving_avg", "series_stats"]


def _us(ts: datetime.datetime) -> int:
    return int(ts.timestamp() * 1_000_000)


def make_series(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, Column],
    start: datetime.datetime,
    stop: datetime.datetime,
    step: datetime.timedelta,
    by: list[str] | None = None,
    defaults: dict[str, float | int] | None = None,
    axis_col: str = "ts_axis",
) -> DataFrame:
    """Aggregate ``df`` onto the regular grid ``[start, stop)`` with
    ``step`` spacing, per ``by`` group, returning one row per group:
    ``by..., axis_col: array<timestamp>, <agg>: array<...>`` with
    missing slots filled from ``defaults`` (null when unspecified —
    Kusto's make-series default).

    Groups are the distinct ``by`` tuples present in the FILTERED input
    (Kusto semantics: make-series only emits series for groups with at
    least one row in range).
    """
    by = list(by or [])
    defaults = defaults or {}
    start_us, stop_us = _us(start), _us(stop)
    step_us = int(step.total_seconds() * 1_000_000)
    if step_us <= 0 or stop_us <= start_us:
        raise ValueError("make_series needs stop > start and step > 0")
    n_slots = -(-(stop_us - start_us) // step_us)  # ceil

    in_range = df.filter(
        (F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(stop))
    )
    slot = F.timestamp_micros(
        (
            F.floor((F.unix_micros(F.col(ts_col)) - start_us) / step_us)
            .cast("bigint")
            * step_us
            + start_us
        )
    ).alias("__slot")
    agg = in_range.groupBy(*by, slot).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )

    # |groups| x n_slots grid; sequence is JVM-side, no driver loop
    grid = (
        (in_range.select(*by).distinct() if by else df.sparkSession.range(1).select())
        .withColumn(
            "__slot",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_slots - 1)),
                    lambda i: F.timestamp_micros(
                        i.cast("bigint") * step_us + start_us
                    ),
                )
            ),
        )
    )
    filled = grid.join(agg, [*by, "__slot"], "left").select(
        *by,
        "__slot",
        *[
            (
                F.coalesce(F.col(name), F.lit(defaults[name])).alias(name)
                if defaults.get(name) is not None
                else F.col(name).alias(name)
            )
            for name in aggs
        ],
    )
    packed = F.array_sort(
        F.collect_list(F.struct(F.col("__slot"), *[F.col(n) for n in aggs]))
    ).alias("__series")
    rows = filled.groupBy(*by).agg(packed) if by else filled.agg(packed)

    def _field(name):
        # NB: must stay a UNARY lambda — a second (default) parameter
        # would make pyspark treat it as an (element, index) lambda
        return lambda s: s[name]

    return rows.select(
        *by,
        F.transform("__series", _field("__slot")).alias(axis_col),
        *[F.transform("__series", _field(name)).alias(name) for name in aggs],
    )


def series_moving_avg(arr: Column | str, window: int) -> Column:
    """Trailing moving average over a series array (JVM higher-order
    expression, no shuffle): out[i] = avg(arr[max(0, i-window+1) .. i])."""
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(
        a,
        lambda x, i: F.aggregate(
            F.slice(
                a,
                F.greatest(i - window + 2, F.lit(1)),
                F.least(i + 1, F.lit(window)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double"),
        )
        / F.least(i + 1, F.lit(window)),
    )


def series_stats(arr: Column | str) -> Column:
    """min/max/sum/avg of a series array as a struct — all array
    expressions, computed without exploding."""
    a = F.col(arr) if isinstance(arr, str) else arr
    total = F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double"))
    return F.struct(
        F.array_min(a).alias("min"),
        F.array_max(a).alias("max"),
        total.alias("sum"),
        (total / F.size(a)).alias("avg"),
    )
