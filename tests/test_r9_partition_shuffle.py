"""Round-9 KQL ``partition hint.strategy=shuffle``: Kusto's shuffle
strategy — no 64-key cap, the subquery lowers onto hash-partitioned
grouped/window rewrites keyed on an internal key copy, never a
per-key loop of filtered scans.
"""

import pytest

from mirror_lake_kusto_spark.functions.kql_parse import KqlParseError, kql


@pytest.fixture
def t(spark):
    return spark.range(1000).selectExpr(
        "id % 200 AS k", "id AS v", "CAST(id % 2 AS INT) AS b"
    )


def test_legacy_still_caps_at_64(spark, t):
    with pytest.raises(KqlParseError, match="64"):
        kql(
            spark, "t | partition by k ( top 2 by v asc )", tables={"t": t}
        ).collect()


def test_shuffle_top_per_key(spark, t):
    r = kql(
        spark,
        "t | partition hint.strategy=shuffle by k ( top 2 by v asc )",
        tables={"t": t},
    )
    rows = sorted((x.k, x.v) for x in r.collect())
    assert rows == sorted((k, v) for k in range(200) for v in (k, k + 200))


def test_shuffle_summarize_gains_key_grouping(spark, t):
    r = kql(
        spark,
        "t | partition hint.strategy=shuffle by k ( summarize s = sum(v) )",
        tables={"t": t},
    )
    assert r.columns == ["s"]  # key not leaked into the output
    assert sorted(x.s for x in r.collect()) == sorted(
        sum(range(k, 1000, 200)) for k in range(200)
    )


def test_shuffle_mixed_rowlocal_and_agg_stages(spark, t):
    r = kql(
        spark,
        """t | partition hint.strategy=shuffle by k (
             where v >= 500 | extend w = v * 2
             | summarize c = count(), m = max(w) by b )""",
        tables={"t": t},
    )
    got = {(x.b, x.c, x.m) for x in r.collect()}
    expect = set()
    for k in range(200):
        vs = [v for v in range(k, 1000, 200) if v >= 500]
        expect.add((k % 2, len(vs), max(vs) * 2))
    assert got == expect


def test_shuffle_count_and_project(spark, t):
    r = kql(
        spark,
        "t | partition hint.strategy=shuffle by k ( count )",
        tables={"t": t},
    )
    assert r.columns == ["Count"]
    assert [x.Count for x in r.collect()] == [5] * 200
    r2 = kql(
        spark,
        """t | partition hint.strategy=shuffle by k (
             top 1 by v desc | project doubled = v * 2 )""",
        tables={"t": t},
    )
    assert sorted(x.doubled for x in r2.collect()) == [
        2 * (k + 800) for k in range(200)
    ]


def test_shuffle_refuses_per_key_loop_shapes(spark, t):
    for stage in ("take 3", "sample 2"):
        with pytest.raises(KqlParseError, match="cannot lower"):
            kql(
                spark,
                f"t | partition hint.strategy=shuffle by k ( {stage} )",
                tables={"t": t},
            ).collect()


def test_shuffle_plan_is_single_window_not_union(spark, t):
    """The legacy strategy unions one filtered scan per key; the
    shuffle strategy must plan ONE window over one scan."""
    df = kql(
        spark,
        "t | partition hint.strategy=shuffle by k ( top 2 by v asc )",
        tables={"t": t},
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("Window") >= 1
    assert "Union" not in plan


def test_shuffle_num_partitions_hint_honored(spark, t):
    df = kql(
        spark,
        """t | partition hint.strategy=shuffle hint.num_partitions=7
               by k ( summarize s = sum(v) )""",
        tables={"t": t},
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "7" in plan  # the explicit repartition width survives
    assert df.count() == 200


def test_shuffle_refuses_search(spark, t):
    """Round-9 review finding: search matches ALL columns, so the
    internal key copy would leak matches the user projected away —
    refuse instead of silently diverging from the legacy strategy."""
    from mirror_lake_kusto_spark.functions.kql_parse import KqlParseError

    with pytest.raises(KqlParseError, match="cannot lower"):
        kql(
            spark,
            """t | partition hint.strategy=shuffle by k (
                 project v | search "7" )""",
            tables={"t": t},
        ).collect()
