"""Physical-plan inspection helpers (round 10) — plan pinning as a
library feature, not a test-file idiom.

The 100 TB posture is only real if the plans are right: filters reach
the parquet scan, projections prune columns, small dimensions
broadcast, expressions stay inside whole-stage codegen.  The test
suite pins those properties per operator (tests/test_plans.py and
friends); user code can assert the same invariants on its own frames
before shipping a pipeline:

    from mirror_lake_kusto_spark import plans
    plan = plans.explain(df)                  # "formatted" plan text
    plans.assert_in_plan(df, "BroadcastHashJoin")
    assert "l_shipdate" in plans.pushed_filters(df)

Pure driver-side plan text — no job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text ``df.explain(mode)`` would print, returned instead
    of printed.  Modes: 'simple', 'extended', 'codegen', 'cost',
    'formatted' (default — the one with PushedFilters/ReadSchema)."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """The ``PushedFilters: [...]`` section(s) of the formatted plan —
    empty string when nothing reached the scan (which is usually the
    finding)."""
    plan = explain(df)
    out = []
    for chunk in plan.split("PushedFilters: [")[1:]:
        out.append(chunk.split("]", 1)[0])
    return ", ".join(filter(None, out))


def read_schema(df: DataFrame) -> str:
    """The ``ReadSchema:`` line(s) of the formatted plan — what the
    scan actually reads; a 2-column projection reading 11 columns is
    a pruning failure."""
    plan = explain(df)
    return "\n".join(
        chunk.splitlines()[0].strip()
        for chunk in plan.split("ReadSchema:")[1:]
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    """Raise AssertionError (with the plan attached) unless every
    needle appears in the formatted plan."""
    plan = explain(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(
            f"expected {missing} in the physical plan:\n{plan}"
        )


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    """Raise AssertionError unless every needle is ABSENT from the
    formatted plan (e.g. assert no CartesianProduct / SortMergeJoin
    where a broadcast was intended)."""
    plan = explain(df)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(
            f"expected {present} NOT in the physical plan:\n{plan}"
        )


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees ('codegen' explain mode:
    the formatted tree numbers them without naming them) — widen the
    spans: every boundary is a codegen break (Python UDF, shuffle,
    unsupported expression)."""
    import re

    m = re.search(
        r"Found (\d+) WholeStageCodegen subtrees", explain(df, "codegen")
    )
    return int(m.group(1)) if m else 0
