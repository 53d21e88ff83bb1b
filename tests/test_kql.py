"""KQL facade lowers to the same results as plain DataFrame programs
(and through them, the DuckDB-checked SURVEY §2 semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mirror_lake_kusto_spark.functions.kql import KqlFrame
from mirror_lake_kusto_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_where_project_extend(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    got = (
        KqlFrame(li)
        .where("l_returnflag == 'R'")
        .extend(net="round(l_extendedprice * (1 - l_discount), 4)")
        .project("l_orderkey", "l_linenumber", "net")
        .to_df()
    )
    want = (
        li.filter(F.col("l_returnflag") == "R")
        .withColumn("net", F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
        .select("l_orderkey", "l_linenumber", "net")
    )
    assert _rows(got) == _rows(want)


def test_summarize_by(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    got = (
        KqlFrame(li)
        .summarize(by=["l_returnflag", "l_linestatus"], qty="sum(l_quantity)", n="count(*)")
        .to_df()
    )
    want = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("sum(l_quantity)").alias("qty"), F.count("*").alias("n")
    )
    assert _rows(got) == _rows(want)


def test_summarize_distinct(spark):
    ev = load_table(spark, "events", SF_DIR)
    got = KqlFrame(ev).summarize(by=["user_id", "event_type"]).to_df()
    assert _rows(got) == _rows(ev.select("user_id", "event_type").distinct())


def test_arg_max(spark):
    """arg_max(ts, *) by user_id == the reference's state-view dedup
    (DatabaseGateway.cs:93)."""
    ev = load_table(spark, "events", SF_DIR)
    got = KqlFrame(ev).arg_max("ts", by=["user_id"]).to_df()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"))
    want = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
        .select(*got.columns)
    )
    assert _rows(got) == _rows(want)


def test_arg_max_plan_has_no_window(spark):
    ev = load_table(spark, "events", SF_DIR)
    df = KqlFrame(ev).arg_max("ts", by=["user_id"]).to_df()
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Window" not in plan  # single-shuffle agg, not a ranking sort


def test_top_lowers_to_take_ordered(spark):
    orders = load_table(spark, "orders", SF_DIR)
    kf = KqlFrame(orders).top(5, "o_totalprice")
    plan = spark._jvm.PythonSQLUtils.explainString(
        kf.df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    got = [r["o_orderkey"] for r in kf.collect()]
    want = [
        r["o_orderkey"]
        for r in orders.orderBy(F.desc("o_totalprice")).limit(5).collect()
    ]
    assert got == want


def test_join_kinds_and_union(spark):
    cust = KqlFrame(load_table(spark, "customer", SF_DIR))
    orders = KqlFrame(load_table(spark, "orders", SF_DIR))
    lonely = cust.join(
        orders.project(c_custkey="o_custkey"), on=["c_custkey"], kind="leftanti"
    )
    # facade anti-join == DataFrame left_anti (C1's shape)
    want = cust.df.join(
        orders.df.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    )
    assert lonely.df.count() == want.count()
    # anti + semi partition the customer set
    semi = cust.join(
        orders.project(c_custkey="o_custkey"), on=["c_custkey"], kind="leftsemi"
    )
    assert lonely.df.count() + semi.df.count() == cust.df.count()
    u = cust.union(cust)
    assert u.df.count() == 2 * cust.df.count()


def test_count_and_take(spark):
    r = KqlFrame(load_table(spark, "region", SF_DIR))
    assert r.count().collect()[0]["count_"] == 5
    assert len(r.take(3).collect()) == 3


def test_distinct_mv_expand_has(spark):
    li = KqlFrame(load_table(spark, "lineitem", SF_DIR))
    # distinct on a column subset
    flags = li.distinct("l_returnflag").collect()
    assert sorted(r["l_returnflag"] for r in flags) == ["A", "N", "R"]
    # mv-expand: tokens of a synthesized array column; empty arrays keep a row
    f = KqlFrame(
        spark.createDataFrame(
            [(1, ["a", "b"]), (2, [])], "id long, toks array<string>"
        )
    )
    rows = f.mv_expand("toks", alias="tok").collect()
    assert sorted((r["id"], r["tok"]) for r in rows) == [(1, "a"), (1, "b"), (2, None)]
    assert "toks" not in f.mv_expand("toks", alias="tok").df.columns
    # has: whole-term only (B6) — 'ship' must not match 'shipping'
    t = KqlFrame(
        spark.createDataFrame(
            [(1, "fast ship today"), (2, "shipping costs"), (3, "SHIP it")],
            "id long, note string",
        )
    )
    got = sorted(r["id"] for r in t.where_has("note", "ship").collect())
    assert got == [1, 3]
