"""Temporal joins the reference lacks (SURVEY §2.C: "Not present …
range/as-of/interval" — the query layer exposes them anyway).

As-of join is implemented as a union + ordered-window carry-forward, not
a join: tag both sides, union them, and per key take the last right-side
payload at-or-before each left row.  This costs ONE shuffle on the key
(the window's partitionBy) — no range-condition nested-loop, no skewed
sort-merge with an inequality, so the plan is the one you'd want at
100 TB: linear in |L|+|R| per key, whole-stage-codegen window on top.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` sharing the equi-key (backward as-of,
    inclusive — DuckDB ``ASOF LEFT JOIN … ON l.k = r.k AND l.ts >= r.ts``
    semantics).  Unmatched left rows keep NULL right columns.
    """
    right_cols = list(right_cols) or [c for c in right.columns if c not in on]
    payload = F.struct(
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols if c != right_ts],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        payload.alias("_asof_payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    # Right sorts before left at equal ts (side 0 < 1) => ties match.
    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("_asof_match", F.last("_asof_payload", ignorenulls=True).over(w))
        .filter(F.col("_asof_side") == 1)
    )
    out_left = [c for c in left.columns]
    out_right = [f"_asof_match.{f.name}" for f in r.schema["_asof_payload"].dataType.fields]
    return matched.select(*out_left, *out_right)
