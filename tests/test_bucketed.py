"""Bucketed co-located joins: the write-once-shuffle-never contract.

The assertion that matters for the 100 TB posture is on the PLAN: a
join of two tables bucketed on the join key with equal bucket counts
must contain no Exchange (no shuffle) — the scan's hash-clustering
satisfies the join's distribution requirement.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mirror_lake_kusto_spark.sources.bucketed import colocated_join, write_bucketed
from mirror_lake_kusto_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(
        li, "bkt_lineitem", ["l_orderkey"], 8, location=str(base / "li")
    )
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bkt_orders",
        ["l_orderkey"],
        8,
        location=str(base / "o"),
    )
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def _plan(spark, df):
    from mirror_lake_kusto_spark import plans

    return plans.explain(df)


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, "l_orderkey")
    plan = _plan(spark, joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # zero shuffle: the whole point


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    li = load_table(spark, "lineitem", SF_DIR)
    o = load_table(spark, "orders", SF_DIR)
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert colocated_join(spark, lt, rt, "l_orderkey").count() == expected


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    # aggregation on the bucket key also reuses the clustering
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert "Exchange" not in _plan(spark, agg)
