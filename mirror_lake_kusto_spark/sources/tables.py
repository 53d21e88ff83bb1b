"""Loaders for the driver's deterministic parquet fixtures (TESTDATA.md).

Plain ``spark.read.parquet`` — Catalyst handles predicate pushdown and
column pruning, so callers filter/select on the returned DataFrame and
the scan narrows automatically (verify with ``.explain``: PushedFilters
/ ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Timestamps must compare bit-identically with the (UTC-naive) DuckDB
    # oracle regardless of the host session's zone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize ``events.ts`` to a microsecond TimestampType.

    The driver has shipped two generations of the fixture: parquet
    TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    nanos as LongType via spark.sql.legacy.parquet.nanosAsLong, then
    project to µs in the scan) and native µs TIMESTAMP / TIMESTAMP_NTZ
    (cast to session-zone TimestampType; identity under the UTC session
    zone set above).  Both paths stay columnar/distributed.  DuckDB
    reads the same file; oracle SQL casts to TIMESTAMP (µs) so both
    engines see identical values.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    # Left set for the session: the conf must still hold when the scan
    # actually executes (it only affects TIMESTAMP(NANOS) fields).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        # Integer DIV, not `/`: float division loses sub-µs precision at
        # 1e18-scale nanosecond longs.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
