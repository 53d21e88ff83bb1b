"""Structured Streaming twins of the §2.I batch queries.

Strategy (mirrors the reference's one-shot ≡ two-shot idiom, reference
MirrorLakeKustoTest/SimpleTest.cs:46-95): chunk the events fixture into
ordered files, stream them with maxFilesPerTrigger=1 (each file = one
micro-batch), and assert the streaming result equals the batch result
on identical input.  Also: watermarked dedup across micro-batches and
late-data eviction.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from mirror_lake_kusto_spark.sources.tables import load_table
from mirror_lake_kusto_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunked_events(spark, tmp_path_factory):
    """events sf0.001 split into 4 time-ordered parquet files."""
    out = str(tmp_path_factory.mktemp("events_chunks"))
    ev = load_table(spark, "events", SF_DIR)
    bounds = ev.select(
        F.percentile_approx("ts", [0.25, 0.5, 0.75], 10000).alias("q")
    ).first()["q"]
    lo = None
    for i, hi in enumerate([*bounds, None]):
        chunk = ev
        if lo is not None:
            chunk = chunk.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            chunk = chunk.filter(F.col("ts") <= F.lit(hi))
        chunk.coalesce(1).write.parquet(os.path.join(out, f"c{i}"))
        lo = hi
    # one flat dir of part files, mtime-ordered so the file source
    # replays them in event-time order
    flat = str(tmp_path_factory.mktemp("events_flat"))
    n = 0
    for i in range(4):
        d = os.path.join(out, f"c{i}")
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = os.path.join(flat, f"{i:02d}.parquet")
                os.rename(os.path.join(d, f), dst)
                os.utime(dst, (1000 + i, 1000 + i))
                n += 1
    assert n == 4
    return flat


def _run_stream(spark, src_dir, schema, transform, mode, checkpoint_dir):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    if "ts" in stream.columns:
        # pandas-authored files carry no UTC flag -> TIMESTAMP_NTZ, which
        # watermarks reject; session TZ is UTC so the cast is value-exact
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("stream_out")
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("stream_out")


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_tumbling_stream_equals_batch(spark, chunked_events, tmp_path):
    batch_df = spark.read.parquet(chunked_events)
    expected = _sorted_rows(W.tumbling_agg(batch_df, "ts", "1 hour"))
    got = _run_stream(
        spark,
        chunked_events,
        batch_df.schema,
        lambda s: W.tumbling_agg(s, "ts", "1 hour"),
        "complete",
        str(tmp_path / "ckpt_tumble"),
    )
    assert _sorted_rows(got) == expected


def test_session_stream_equals_batch(spark, chunked_events, tmp_path):
    """Append mode + watermark: every session closed by the final
    watermark must match the batch twin exactly; sessions still open at
    stream end are withheld by append semantics."""
    batch_df = spark.read.parquet(chunked_events)
    batch = W.session_agg(batch_df, "ts", "30 minutes")
    got = _run_stream(
        spark,
        chunked_events,
        batch_df.schema,
        lambda s: W.session_agg(W.with_watermark(s, "ts", "10 minutes"), "ts", "30 minutes"),
        "append",
        str(tmp_path / "ckpt_sess"),
    )
    got_rows = set(_sorted_rows(got))
    batch_rows = set(_sorted_rows(batch))
    assert got_rows <= batch_rows
    # everything but the tail sessions must have been emitted
    max_ts = batch_df.agg(F.max("ts")).first()[0]
    import datetime

    horizon = max_ts - datetime.timedelta(minutes=40)  # gap + watermark slack
    closed = {r for r in batch_rows if r[2] < horizon}  # r[2] = session_end
    assert closed <= got_rows


def test_stateful_dedup_across_batches(spark, tmp_path):
    """Duplicate keys arriving in *different* micro-batches collapse to
    one row (dropDuplicatesWithinWatermark state spans batches)."""
    import pandas as pd

    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    for i in range(3):
        pdf = pd.DataFrame(
            {
                # key 7 appears in every file; others unique per file
                "event_id": [7, 100 + i],
                "ts": [t0 + pd.Timedelta(minutes=i), t0 + pd.Timedelta(minutes=i)],
                "value": [1.0, 1.0],
            }
        )
        p = os.path.join(src, f"f{i}.parquet")
        pdf.astype({"ts": "datetime64[us]"}).to_parquet(p)
        os.utime(p, (1000 + i, 1000 + i))
    schema = spark.read.parquet(src).schema
    got = _run_stream(
        spark,
        src,
        schema,
        lambda s: W.stateful_dedup(s, keys=("event_id",), ts_col="ts", delay="1 hour"),
        "append",
        str(tmp_path / "ckpt_dedup"),
    )
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [7, 100, 101, 102]


def test_late_data_dropped(spark, tmp_path):
    """An event older than the advanced watermark never reaches the
    aggregation state (I4: late-data bound)."""
    import pandas as pd

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    files = [
        # batch 0: on-time events in hour 0
        pd.DataFrame({"ts": [t0, t0 + pd.Timedelta(minutes=30)], "value": [1.0, 1.0]}),
        # batch 1: jump to hour 6 -> watermark advances to ~hour 5:50
        pd.DataFrame({"ts": [t0 + pd.Timedelta(hours=6)], "value": [1.0]}),
        # batch 2: filler — the advanced watermark takes effect one batch
        # after it is computed (Spark applies batch N-1's watermark in N)
        pd.DataFrame({"ts": [t0 + pd.Timedelta(hours=6, minutes=5)], "value": [1.0]}),
        # batch 3: a late straggler back in hour 0 — must be dropped
        pd.DataFrame({"ts": [t0 + pd.Timedelta(minutes=45)], "value": [100.0]}),
    ]
    for i, pdf in enumerate(files):
        p = os.path.join(src, f"f{i}.parquet")
        pdf.astype({"ts": "datetime64[us]"}).to_parquet(p)
        os.utime(p, (1000 + i, 1000 + i))
    schema = spark.read.parquet(src).schema
    got = _run_stream(
        spark,
        src,
        schema,
        lambda s: W.tumbling_agg(
            W.with_watermark(s, "ts", "10 minutes"), "ts", "1 hour", keys=()
        ),
        "append",
        str(tmp_path / "ckpt_late"),
    )
    rows = {r["window_start"]: r["sum_value"] for r in got.collect()}
    hour0 = t0.to_pydatetime()
    assert rows.get(hour0) == 2.0  # straggler's 100.0 not included


def test_asof_join_matches_window_impl(spark):
    """asof_join == the obvious-but-quadratic per-row max join."""
    from mirror_lake_kusto_spark.operators.temporal import asof_join

    ev = load_table(spark, "events", SF_DIR)
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    got = asof_join(errors, clicks, on=["user_id"], right_cols=["ts", "value"])

    e, c = errors.alias("e"), clicks.alias("c")
    joined = e.join(c, (F.col("e.user_id") == F.col("c.user_id")) & (F.col("e.ts") >= F.col("c.ts")), "left")
    ref = (
        joined.groupBy("e.event_id", "e.user_id", "e.ts")
        .agg(F.max(F.struct(F.col("c.ts"), F.col("c.value"))).alias("m"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("m.ts").alias("ts_right"),
            F.col("m.value").alias("value_right"),
        )
    )
    assert _sorted_rows(got) == _sorted_rows(ref)


def test_interval_join_stream_equals_batch(spark, chunked_events, tmp_path):
    """Stream-stream interval join (click->purchase within 1h) emits
    exactly the batch result: inner-join matches are complete because
    each micro-batch's right rows only need left state newer than
    watermark-upper, which the eviction contract retains."""
    batch_df = spark.read.parquet(chunked_events).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        return clicks, purchases

    bc, bp = split(batch_df)
    expected = _sorted_rows(W.interval_join(bc, bp, "user_id", "ts", upper="1 hour"))
    assert expected, "fixture must produce at least one click->purchase pair"

    def transform(s):
        sc, sp = split(s)
        return W.interval_join(
            sc, sp, "user_id", "ts", upper="1 hour", watermark="10 minutes"
        )

    got = _run_stream(
        spark,
        chunked_events,
        spark.read.parquet(chunked_events).schema,
        transform,
        "append",
        str(tmp_path / "ckpt_ivj"),
    )
    assert _sorted_rows(got) == expected


def test_dedup_with_counts_custom_stateful(spark, tmp_path):
    """applyInPandasWithState custom operator: per-key first-seen ts AND
    duplicate count, emitted on watermark timeout.  Key 7 spans three
    micro-batches (count 3); the far-future sentinel only advances the
    watermark so every real key's state times out and flushes."""
    import pandas as pd

    src = str(tmp_path / "cnt_src")
    os.makedirs(src)
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    for i in range(3):
        pdf = pd.DataFrame(
            {
                "event_id": [7, 100 + i],
                "ts": [t0 + pd.Timedelta(minutes=i)] * 2,
                "value": [1.0, 1.0],
            }
        )
        p = os.path.join(src, f"f{i}.parquet")
        pdf.astype({"ts": "datetime64[us]"}).to_parquet(p)
        os.utime(p, (1000 + i, 1000 + i))
    sentinel = pd.DataFrame(
        {"event_id": [999], "ts": [t0 + pd.Timedelta(days=30)], "value": [0.0]}
    )
    p = os.path.join(src, "f3.parquet")
    sentinel.astype({"ts": "datetime64[us]"}).to_parquet(p)
    os.utime(p, (1004, 1004))

    schema = spark.read.parquet(src).schema
    got = _run_stream(
        spark,
        src,
        schema,
        lambda s: W.dedup_with_counts(
            s, keys=("event_id",), ts_col="ts", delay="1 hour"
        ),
        "append",
        str(tmp_path / "ckpt_cnt"),
    )
    rows = {r["event_id"]: (r["first_ts"], r["n_events"]) for r in got.collect()}
    assert set(rows) == {7, 100, 101, 102}  # sentinel state never timed out
    assert rows[7] == (t0.to_pydatetime(), 3)
    assert all(n == 1 for k, (_, n) in rows.items() if k != 7)
    # batch twin agrees on the same (non-sentinel) input
    batch = W.dedup_with_counts(
        spark.read.parquet(src).filter("event_id < 999").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ),
        keys=("event_id",),
        ts_col="ts",
    )
    brows = {r["event_id"]: (r["first_ts"], r["n_events"]) for r in batch.collect()}
    assert brows == rows


def test_interval_left_outer_stream_subset_and_horizon(spark, chunked_events, tmp_path):
    """Streaming left-outer interval join: matched rows equal the batch
    inner join; null-match rows are exactly the batch null rows whose
    eviction horizon passed (watermark proves no match can arrive)."""
    batch_df = spark.read.parquet(chunked_events).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        return clicks, purchases

    bc, bp = split(batch_df)
    batch = W.interval_join(
        bc, bp, "user_id", "ts", upper="1 hour", how="left_outer"
    )
    batch_matched = set(_sorted_rows(batch.filter("r_event_id IS NOT NULL")))
    batch_nulls = set(_sorted_rows(batch.filter("r_event_id IS NULL")))

    def transform(s):
        sc, sp = split(s)
        return W.interval_join(
            sc, sp, "user_id", "ts", upper="1 hour",
            watermark="10 minutes", how="left_outer",
        )

    got = _run_stream(
        spark,
        chunked_events,
        spark.read.parquet(chunked_events).schema,
        transform,
        "append",
        str(tmp_path / "ckpt_loj"),
    )
    got_matched = set(_sorted_rows(got.filter("r_event_id IS NOT NULL")))
    got_nulls = set(_sorted_rows(got.filter("r_event_id IS NULL")))
    assert got_matched == batch_matched
    assert got_nulls <= batch_nulls
    # null-match emission happens in the batch AFTER eviction becomes
    # due, so the last chunk's watermark never flushes: anchor the
    # completeness horizon to the third chunk's max (the 0.75 quantile)
    import datetime

    q75 = batch_df.agg(
        F.percentile_approx("ts", 0.75, 10000).alias("q")
    ).first()["q"]
    horizon = q75 - datetime.timedelta(minutes=10) - datetime.timedelta(hours=1)
    overdue = {r for r in batch_nulls if r[1] < horizon}  # r[1] = l_ts
    assert overdue <= got_nulls
    assert got_nulls  # the stream did emit dropouts
