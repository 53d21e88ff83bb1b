"""Bucketed (hash-clustered) tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders on
the order key) is the shuffle: every row of both inputs crosses the
network once per join.  Bucketing pays that shuffle ONCE at write time
— each side is hash-clustered into the same number of buckets on the
join key (Spark's ``bucketBy``; the reference's analogue is Kusto's
extent-level sharding by ingestion mapping, reference
Orchestrations/DeltaTableOrchestration.cs mapping setup) — and every
subsequent join/aggregation on that key runs with ZERO Exchange nodes:
the scan itself reports the hash-partitioning, Catalyst sees both
sides partitioned identically, and the SortMergeJoin reads bucket i of
each side on the same executor.

The same applies to repeated ``groupBy`` on the bucket key: the
partial/final aggregate collapses into one stage over the bucketed
scan.

Bucketed writes require the session catalog (``saveAsTable``); pass
``location`` to keep table data out of the default warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "colocated_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    location: str | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table.  ``sort_cols`` (defaults
    to the bucket columns) additionally sorts within each bucket so a
    SortMergeJoin skips its per-task Sort as well.

    Both sides of a future co-located join must use the SAME
    ``num_buckets`` — Spark only elides the Exchange when the bucket
    counts match.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if location is not None:
        writer = writer.option("path", location)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key.  Forces the merge
    strategy (a broadcast would hide the co-location) — with matching
    bucket counts the physical plan contains no Exchange on either
    side: the network cost of the join is zero at any scale.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on, how)
