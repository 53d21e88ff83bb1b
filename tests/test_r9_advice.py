"""Round-9 ADVICE pin tests: four low-severity defects from the
round-8 review, each pinned so they stay fixed.

1. evolve_drop's CHECK/generated-column reference guard must match
   identifiers the way Spark resolves them — case-insensitively, and
   in backtick-quoted spellings.
2. drop_column_default on a path with no Delta table raises a clear
   ValueError, not a NoneType TypeError.
3. funnel_sequence_completion releases its shared event cache after
   materializing the result (no session-lifetime storage growth).
4. unixtime_nanoseconds_todatetime FLOORS ns->us for pre-epoch
   values (Kusto tick arithmetic), instead of DIV-truncating toward
   zero and landing 1 us late.
"""

import datetime

import pytest

from mirror_lake_kusto_spark.functions.kql_parse import kql
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _mk(spark, tmp_path, name="t"):
    sink = DeltaSink(spark, str(tmp_path / name))
    sink.append(
        spark.createDataFrame(
            [(1, "a", 10.0)], "id long, name string, price double"
        )
    )
    return sink


def test_drop_guard_case_insensitive_constraint(spark, tmp_path):
    sink = _mk(spark, tmp_path, "ci")
    sink.add_constraint("pos_price", "PRICE > 0")  # upper-case spelling
    with pytest.raises(ValueError, match="CHECK constraint"):
        sink.evolve_drop(["price"])


def test_drop_guard_backtick_constraint(spark, tmp_path):
    sink = _mk(spark, tmp_path, "bt")
    sink.add_constraint("pos_price", "`price` > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        sink.evolve_drop(["price"])


def test_drop_guard_case_insensitive_generated(spark, tmp_path):
    sink = _mk(spark, tmp_path, "gen")
    sink.add_generated_column("dbl", "double", "PRICE * 2")
    with pytest.raises(ValueError, match="generated"):
        sink.evolve_drop(["price"])


def test_drop_default_no_table_is_value_error(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "missing"))
    with pytest.raises(ValueError, match="no Delta table"):
        sink.drop_column_default("anything")


def test_funnel_completion_releases_event_cache(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 0, 0, 10), "A"),
            (1, datetime.datetime(2024, 1, 1, 0, 1, 0), "B"),
            (2, datetime.datetime(2024, 1, 1, 0, 0, 20), "A"),
        ],
        "uid long, ts timestamp, st string",
    )
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    out = kql(
        spark,
        """t | evaluate funnel_sequence_completion(
            uid, ts, datetime(2024-01-01), datetime(2024-01-02),
            1h, st, dynamic(['A','B']), dynamic(['10m','10m']))""",
        tables={"t": df},
    )
    assert out.count() >= 1
    # the plugin's internal ev.persist() must not outlive the call;
    # the only surviving persistent RDD from the invocation is the
    # localCheckpoint snapshot (tied to `out`'s lifetime)
    after = spark.sparkContext._jsc.getPersistentRDDs()
    leaked = [
        v.rdd().toString()
        for k, v in after.items()
        if k not in before and not v.rdd().isLocallyCheckpointed()
    ]
    assert leaked == []


def test_unixtime_nanoseconds_pre_epoch_floors(spark):
    r = kql(
        spark,
        """t | project
            neg = unixtime_nanoseconds_todatetime(-1500),
            negx = unixtime_nanoseconds_todatetime(-999),
            pos = unixtime_nanoseconds_todatetime(1500)""",
        tables={"t": spark.createDataFrame([("x",)], "s string")},
    ).collect()[0]
    epoch = datetime.datetime(1970, 1, 1)
    # floor(-1500/1000) = -2 us; truncation would give -1 us
    assert (r.neg - epoch).total_seconds() == pytest.approx(-2e-6)
    assert (r.negx - epoch).total_seconds() == pytest.approx(-1e-6)
    assert (r.pos - epoch).total_seconds() == pytest.approx(1e-6)
