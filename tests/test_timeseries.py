"""make-series / series-function tests: regular-grid semantics
(Kusto's make-series contract) computed Spark-first.

Golden values are hand-computed on a four-row fixture; the sf fixtures
are covered by the oracle gate (ts_make_series / ts_series_moving_avg /
kql_make_series in the registry).
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from mirror_lake_kusto_spark.operators.timeseries import (
    make_series,
    series_moving_avg,
    series_stats,
)

T0 = datetime.datetime(2024, 1, 1)
H = datetime.timedelta(hours=1)


@pytest.fixture()
def small(spark):
    return spark.createDataFrame(
        [
            ("a", "2024-01-01 00:30:00", 1.0),
            ("a", "2024-01-01 02:15:00", 2.0),
            ("a", "2024-01-01 02:45:00", 3.0),
            ("b", "2024-01-01 01:10:00", 5.0),
        ],
        "k string, s string, v double",
    ).selectExpr("k", "CAST(s AS TIMESTAMP) AS ts", "v")


def test_grid_fill_and_defaults(spark, small):
    out = {
        r["k"]: r
        for r in make_series(
            small,
            "ts",
            {"n": F.count("*"), "total": F.sum("v")},
            T0,
            T0 + 4 * H,
            H,
            by=["k"],
            defaults={"n": 0},  # total left to null-fill
        ).collect()
    }
    assert [t.hour for t in out["a"]["ts_axis"]] == [0, 1, 2, 3]
    assert out["a"]["n"] == [1, 0, 2, 0]
    assert out["a"]["total"] == [1.0, None, 5.0, None]
    assert out["b"]["n"] == [0, 1, 0, 0]


def test_range_is_half_open_and_groups_from_filtered_input(spark, small):
    # [00:00, 01:00) excludes everything but a's 00:30 row; group b
    # has no in-range rows and must not emit a series (Kusto semantics)
    rows = make_series(
        small, "ts", {"n": F.count("*")}, T0, T0 + H, H, by=["k"]
    ).collect()
    assert len(rows) == 1 and rows[0]["k"] == "a" and rows[0]["n"] == [1]


def test_partial_last_slot_ceil(spark, small):
    # 90-minute span at 1h step -> 2 slots (ceil), second starts 01:00
    rows = make_series(
        small,
        "ts",
        {"n": F.count("*")},
        T0,
        T0 + datetime.timedelta(minutes=90),
        H,
        by=["k"],
        defaults={"n": 0},
    ).collect()
    axes = {r["k"]: [t.minute + 60 * t.hour for t in r["ts_axis"]] for r in rows}
    assert all(a == [0, 60] for a in axes.values())


def test_no_by_single_series(spark, small):
    rows = make_series(
        small, "ts", {"n": F.count("*")}, T0, T0 + 4 * H, H, defaults={"n": 0}
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == [1, 1, 2, 0]


def test_series_moving_avg_golden(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0, 4.0],)], "arr array<double>")
    got = df.select(series_moving_avg("arr", 2).alias("ma")).first()["ma"]
    assert got == [1.0, 1.5, 2.5, 3.5]


def test_series_stats_golden(spark):
    df = spark.createDataFrame([([1.0, 5.0, 3.0],)], "arr array<double>")
    st = df.select(series_stats("arr").alias("s")).first()["s"]
    assert (st["min"], st["max"], st["sum"], st["avg"]) == (1.0, 5.0, 9.0, 3.0)


def test_make_series_plan_no_cartesian_no_udf(spark, small):
    df = make_series(
        small, "ts", {"n": F.count("*")}, T0, T0 + 4 * H, H, by=["k"]
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kql_make_series_matches_operator(spark, small):
    from mirror_lake_kusto_spark.functions.kql_parse import kql

    got = {
        r["k"]: r["n"]
        for r in kql(
            spark,
            "t | make-series n = count() default = 0 on ts "
            "from datetime(2024-01-01) to datetime(2024-01-01 04:00:00) "
            "step 1h by k",
            tables={"t": small},
        ).collect()
    }
    assert got == {"a": [1, 0, 2, 0], "b": [0, 1, 0, 0]}


def test_series_fill_forward_and_linear(spark):
    from mirror_lake_kusto_spark.operators.timeseries import (
        series_fill_forward,
        series_fill_linear,
    )

    df = spark.createDataFrame(
        [([None, 10.0, None, None, 40.0, None],), ([None, None],), (None,)],
        "a array<double>",
    )
    rows = df.select(
        series_fill_forward("a").alias("ff"), series_fill_linear("a").alias("lin")
    ).collect()
    assert rows[0].ff == [None, 10.0, 10.0, 10.0, 40.0, 40.0]
    assert rows[0].lin == [10.0, 10.0, 20.0, 30.0, 40.0, 40.0]
    assert rows[1].ff == [None, None] and rows[1].lin == [None, None]
    assert rows[2].ff is None and rows[2].lin is None


def test_series_outliers_tukey(spark):
    from mirror_lake_kusto_spark.operators.timeseries import series_outliers

    # sorted non-null: [1..8]; med=4 (rank ceil(8*.5)=4), q1=2, q3=6, iqr=4
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0, 4.0, None, 5.0, 6.0, 7.0, 8.0, 100.0],)],
        "a array<double>",
    )
    # recompute med with 9 values 1..8+100: ceil(9*.5)=5 -> 5th = 5;
    # q1 = ceil(9*.25)=3 -> 3; q3 = ceil(9*.75)=7 -> 7; iqr = 4
    sc = df.select(series_outliers("a").alias("s")).collect()[0].s
    assert sc[4] == 0.0  # null element scores 0
    assert sc[-1] == (100.0 - 5.0) / 4.0  # the planted outlier
    assert abs(sc[0] - (1.0 - 5.0) / 4.0) < 1e-12


def test_series_fill_constant_iqr_zero(spark):
    from mirror_lake_kusto_spark.operators.timeseries import series_outliers

    df = spark.createDataFrame([([5.0, 5.0, None, 5.0],)], "a array<double>")
    assert df.select(series_outliers("a").alias("s")).collect()[0].s == [
        0.0, 0.0, 0.0, 0.0
    ]


def test_series_decompose_recovers_planted_seasonality(spark):
    """A pure weekly pattern around a flat level decomposes exactly
    (seasonal = planted profile, trend = level, residual = 0); a
    planted spike is the only +1 anomaly.  (With a trend present the
    phase-median seasonal absorbs within-phase trend bias — the same
    naive-decomposition behavior Kusto's seasonal-first ordering has —
    so exact recovery is asserted on the trendless series.)"""
    from mirror_lake_kusto_spark.operators.timeseries import (
        series_anomalies,
        series_decompose,
    )

    season = [10.0, -5.0, 0.0, 5.0, -10.0, 3.0, -3.0]  # zero-mean, period 7
    rows = [("k", i, 100.0 + season[i % 7]) for i in range(28)]
    df = spark.createDataFrame(rows, "key string, idx int, v double")
    out = {
        r["idx"]: r
        for r in series_decompose(
            df, ["key"], "idx", "v", period=7, trend="avg"
        ).collect()
    }
    for i in range(28):
        assert abs(out[i]["seasonal"] - season[i % 7]) < 1e-6
        assert abs(out[i]["trend"] - 100.0) < 1e-6
        assert abs(out[i]["residual"]) < 1e-6
    # plant a spike: the phase median is robust to one outlier, so the
    # spike lands in the residual and is the only +1 flag
    rows2 = [
        ("k", i, 100.0 + season[i % 7] + (500.0 if i == 13 else 0.0))
        for i in range(28)
    ]
    df2 = spark.createDataFrame(rows2, "key string, idx int, v double")
    an = {
        r["idx"]: r["ad_flag"]
        for r in series_anomalies(
            df2, ["key"], "idx", "v", period=7, trend="avg"
        ).collect()
    }
    assert an[13] == 1
    assert sum(1 for v in an.values() if v == 1) == 1


def test_series_fir_shapes(spark):
    from mirror_lake_kusto_spark.operators.timeseries import series_fir

    df = spark.createDataFrame([([1.0, 2.0, 3.0, 4.0],)], "xs array<double>")
    # causal [1,2]: out[i] = 1*x[i] + 2*x[i-1], zero-padded
    got = df.select(series_fir("xs", [1.0, 2.0]).alias("f")).first()["f"]
    assert got == [1.0, 4.0, 7.0, 10.0]
    # normalize: coefficients sum to 1
    got = df.select(
        series_fir("xs", [1.0, 1.0], normalize=True).alias("f")
    ).first()["f"]
    assert got == [0.5, 1.5, 2.5, 3.5]
    # centered window of 3: out[i] = x[i-1] + x[i] + x[i+1] (shift 1)
    got = df.select(
        series_fir("xs", [1.0, 1.0, 1.0], center=True).alias("f")
    ).first()["f"]
    assert got == [3.0, 6.0, 9.0, 7.0]


def test_series_pearson_correlation(spark):
    import math

    from mirror_lake_kusto_spark.operators.timeseries import (
        series_pearson_correlation,
    )

    df = spark.createDataFrame(
        [
            ([1.0, 2.0, 3.0], [2.0, 4.0, 6.0]),   # perfect +
            ([1.0, 2.0, 3.0], [3.0, 2.0, 1.0]),   # perfect -
            ([1.0, 1.0, 1.0], [1.0, 2.0, 3.0]),   # zero variance -> NULL
        ],
        "xs array<double>, ys array<double>",
    )
    got = [
        r["r"]
        for r in df.select(
            series_pearson_correlation("xs", "ys").alias("r")
        ).collect()
    ]
    assert math.isclose(got[0], 1.0) and math.isclose(got[1], -1.0)
    assert got[2] is None


def test_series_decompose_forecast_linefit_extrapolates(spark):
    import pyspark.sql.functions as F

    from mirror_lake_kusto_spark.operators.timeseries import (
        series_decompose_forecast,
    )

    # planted series: v = 10 + 2*idx + seasonal [0, 5] (period 2)
    rows = [
        ("k", i, float(10 + 2 * i + (0 if i % 2 == 0 else 5)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "key string, idx int, v double")
    out = series_decompose_forecast(
        df, ["key"], "idx", "v", period=2, horizon=4, trend="linefit"
    ).orderBy("idx")
    got = [(r["idx"], r["forecast"]) for r in out.collect()]
    assert [g[0] for g in got] == [20, 21, 22, 23]
    # extrapolation continues the planted line + seasonal swing
    # (the median seasonal profile absorbs ~1 unit of trend drift —
    # inherent to the decompose model, not an extrapolation error)
    for idx, f in got:
        want = 10 + 2 * idx + (0 if idx % 2 == 0 else 5)
        assert abs(f - want) < 2.5, (idx, f, want)
    # two-step differences recover the planted slope exactly
    assert abs((got[2][1] - got[0][1]) / 2 - 2.0) < 0.05
    assert abs((got[3][1] - got[1][1]) / 2 - 2.0) < 0.05

    with pytest.raises(ValueError, match="horizon"):
        series_decompose_forecast(
            df, ["key"], "idx", "v", period=2, horizon=0
        )
