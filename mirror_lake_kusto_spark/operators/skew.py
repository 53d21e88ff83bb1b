"""Skew mitigation for joins and aggregations (100 TB posture).

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized shuffle partitions.  Salting is the
explicit, plan-level tool for the cases AQE can't fix — a replicated
build side joined against a hot-key probe side, or a groupBy where one
key dominates.  The reference's analogue is its capacity-bounded
parallel ingest of partition groups (BlobStagingOrchestration.cs:326-338),
which is exactly a hand-rolled anti-skew measure.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys would overload single
    shuffle partitions: the skewed side gets a deterministic per-row
    salt in [0, n_salts), the other side is exploded n_salts times, and
    the join runs on (key..., salt) — each hot key now spreads over
    n_salts reducers.  Cost: |other| x n_salts shuffle volume, the
    classic trade.  Supports inner/left (the replicated side must be
    the non-preserved one)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    on = list(on)
    # deterministic salt: spread rows of the same key by hashing the
    # whole row (monotonic ids would break retry determinism)
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [*on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial-aggregate on
    (key..., salt), then final-aggregate on key.  Only decomposable
    aggregates (sum/count/min/max) are valid — the caller passes the
    PARTIAL expressions and this reapplies the matching merge.

    ``aggs``: output name -> partial aggregate column; merge is chosen
    by the partial's function (sum+count->sum, min->min, max->max).
    """
    on = list(keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*on, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    merges = []
    for name, col in aggs.items():
        fn = col._jc.toString().split("(")[0].lower()
        if fn.startswith("count") or fn.startswith("sum"):
            merges.append(F.sum(name).alias(name))
        elif fn.startswith("min"):
            merges.append(F.min(name).alias(name))
        elif fn.startswith("max"):
            merges.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate for salting: {fn}")
    return partial.groupBy(*on).agg(*merges)
