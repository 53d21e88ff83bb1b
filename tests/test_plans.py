"""Physical-plan assertions: the 100 TB posture is only real if the
plans are right.  These tests pin the properties that matter at scale:
filters reach the parquet scan, projections prune columns, small dims
broadcast, and top-k avoids a global sort."""

from __future__ import annotations

from mirror_lake_kusto_spark.queries import all_queries
from tests.conftest import SF_DIR

REGISTRY = all_queries()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_filter_pushdown(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # shipdate/discount/quantity predicates all pushed to the scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q6_column_pruning(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 referenced columns are read, not all 11
    assert "l_orderkey" not in read_schema
    assert "l_extendedprice" in read_schema


def test_c3_broadcast_join(spark):
    plan = _plan(spark, "c3_inner_join_broadcast")
    assert "BroadcastHashJoin" in plan


def test_q3_broadcasts_dimension(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_f3_topk_no_global_sort(spark):
    plan = _plan(spark, "f3_global_topk")
    assert "TakeOrderedAndProject" in plan


def test_d4_argmax_single_shuffle(spark):
    # groupBy max_by form: one exchange, no window sort
    plan = _plan(spark, "d4_argmax_groupby")
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg exchange (+AQE read)


def test_b1_projection_prunes_scan(spark):
    plan = _plan(spark, "b1_project_rename")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
