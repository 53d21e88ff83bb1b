"""Property-based check of the KQL pipe-language parser: a randomized
pipeline of verbs over a fixed in-memory table must produce EXACTLY the
rows of the equivalent hand-built DataFrame program (the parser is a
lowering, not an interpreter — any divergence is a translation bug).

The model executes verb-by-verb with plain pandas; pipelines are kept
to verbs with order-insensitive row semantics so result comparison is
set-of-rows (sorting columns are always included in the projection).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = [
    (i, ["alpha", "beta", "gamma", "delta"][i % 4], float(i * 7 % 23), i % 5)
    for i in range(40)
]


@pytest.fixture(scope="module")
def kdf(spark):
    return spark.createDataFrame(ROWS, "id long, k string, v double, g long")


def _model() -> pd.DataFrame:
    return pd.DataFrame(ROWS, columns=["id", "k", "v", "g"])


# each step: (kql text, model function pandas->pandas)
_STEPS = [
    ("where v > 5", lambda p: p[p["v"] > 5]),
    ("where id % 2 == 0", lambda p: p[p["id"] % 2 == 0]),
    ("where k has 'beta'", lambda p: p[p["k"] == "beta"]),
    ("where not (g == 3)", lambda p: p[p["g"] != 3]),
    ("extend w = v * 2 + g", lambda p: p.assign(w=p["v"] * 2 + p["g"])),
    ("extend w = iif(v > 10, 1, 0)", lambda p: p.assign(w=(p["v"] > 10).astype("int64"))),
    ("take 100", lambda p: p),  # no-op cap (order-safe)
]

_TERMINALS = [
    (
        "summarize s = sum(v), n = count() by k",
        lambda p: p.groupby("k", as_index=False).agg(
            s=("v", "sum"), n=("v", "size")
        ),
    ),
    (
        "summarize mx = max(v), mn = min(id) by g",
        lambda p: p.groupby("g", as_index=False).agg(
            mx=("v", "max"), mn=("id", "min")
        ),
    ),
    ("distinct k, g", lambda p: p[["k", "g"]].drop_duplicates()),
    ("count", lambda p: pd.DataFrame({"Count": [len(p)]})),
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    steps=st.lists(st.sampled_from(_STEPS), min_size=0, max_size=3),
    terminal=st.sampled_from(_TERMINALS),
)
def test_random_pipeline_matches_pandas_model(spark, kdf, steps, terminal):
    from mirror_lake_kusto_spark.functions.kql_parse import kql

    text = "t"
    model = _model()
    for stext, sfn in steps:
        text += " | " + stext
        model = sfn(model)
    ttext, tfn = terminal
    text += " | " + ttext
    model = tfn(model)

    got = kql(spark, text, tables={"t": kdf}).toPandas()
    assert sorted(got.columns) == sorted(model.columns)
    cols = sorted(model.columns)
    got_rows = sorted(map(tuple, got[cols].itertuples(index=False)))
    want_rows = sorted(map(tuple, model[cols].itertuples(index=False)))
    assert got_rows == want_rows, f"pipeline: {text}"
