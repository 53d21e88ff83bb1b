"""Round-6: timestamp-based time travel + in-commit timestamps.

- ``read_snapshot(timestamp=...)`` resolves TIMESTAMP AS OF via the
  table's commit clocks (commitInfo.inCommitTimestamp when the writer
  feature is on, else commitInfo.timestamp, else file mtime) with
  Delta's monotonic fix-up;
- ``startingTimestamp`` on the mlk_delta streaming source begins at
  the first commit at-or-after the given clock;
- the sink's ICT mode stamps strictly-monotonic inCommitTimestamps
  from the enablement commit onward.

Reference analogue: go-back date-cutoff semantics walk blob dates the
same way (BlobAnalysisOrchestration.cs:137-159).
"""

import json

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from mirror_lake_kusto_spark.streaming.delta_source import DeltaLogDataSource


def _register(spark):
    spark.dataSource.register(DeltaLogDataSource)


def _write_commit_ts(path, version, ts_ms):
    """Rewrite a commit's commitInfo.timestamp (test clock control)."""
    from mirror_lake_kusto_spark.sources import fs as _fs

    fp = _fs.join(path, "_delta_log", f"{version:020d}.json")
    fs = _fs.get_fs(path)
    lines = []
    for line in fs.read_text(fp).splitlines():
        if not line.strip():
            continue
        act = json.loads(line)
        if "commitInfo" in act:
            act["commitInfo"]["timestamp"] = ts_ms
        lines.append(json.dumps(act))
    fs.write_text(fp, "\n".join(lines) + "\n")


def test_timestamp_as_of_resolves_commit_clocks(spark, tmp_path):
    path = str(tmp_path / "tt")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 3).toDF("id").coalesce(1))    # v0
    sink.append(spark.range(3, 6).toDF("id").coalesce(1))    # v1
    sink.append(spark.range(6, 9).toDF("id").coalesce(1))    # v2
    _write_commit_ts(path, 0, 1_000_000)
    _write_commit_ts(path, 1, 2_000_000)
    _write_commit_ts(path, 2, 3_000_000)

    assert DL.resolve_timestamp(path, 1_000_000) == 0
    assert DL.resolve_timestamp(path, 1_999_999) == 0
    assert DL.resolve_timestamp(path, 2_000_000) == 1
    assert DL.resolve_timestamp(path, 2_500_000) == 1
    assert DL.resolve_timestamp(path, 3_000_000) == 2

    got = sorted(
        r.id
        for r in DL.read_snapshot(spark, path, timestamp=2_400_000).collect()
    )
    assert got == [0, 1, 2, 3, 4, 5]

    with pytest.raises(ValueError, match="before the earliest"):
        DL.resolve_timestamp(path, 999_999)
    with pytest.raises(ValueError, match="after the latest"):
        DL.resolve_timestamp(path, 3_000_001)
    with pytest.raises(ValueError, match="not both"):
        DL.read_snapshot(spark, path, upto=1, timestamp=2_000_000)


def test_timestamp_accepts_iso_and_datetime(spark, tmp_path):
    import datetime as dt

    path = str(tmp_path / "tt_iso")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 2).toDF("id").coalesce(1))    # v0
    sink.append(spark.range(2, 4).toDF("id").coalesce(1))    # v1
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    _write_commit_ts(path, 0, int(t0.timestamp() * 1000))
    _write_commit_ts(path, 1, int(t0.timestamp() * 1000) + 86_400_000)
    assert DL.resolve_timestamp(path, "2024-01-01T12:00:00") == 0
    assert DL.resolve_timestamp(path, "2024-01-02 00:00:00") == 1
    assert (
        DL.resolve_timestamp(
            path, dt.datetime(2024, 1, 1, 6, 0, tzinfo=dt.timezone.utc)
        )
        == 0
    )


def test_non_monotonic_clocks_are_fixed_up(spark, tmp_path):
    """A later commit with an EARLIER wall clock (writer skew, blob
    copy) must not make time travel non-deterministic: effective
    clocks are max(prev + 1, own)."""
    path = str(tmp_path / "tt_skew")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    for i in range(3):
        sink.append(spark.range(i, i + 1).toDF("id").coalesce(1))
    _write_commit_ts(path, 0, 5_000_000)
    _write_commit_ts(path, 1, 4_000_000)  # skewed backwards
    _write_commit_ts(path, 2, 6_000_000)
    pairs = DL.commit_timestamps(path)
    assert [v for v, _ in pairs] == [0, 1, 2]
    ts = [t for _, t in pairs]
    assert ts == sorted(ts) and len(set(ts)) == 3
    assert ts[1] == 5_000_001  # fixed up past v0
    assert DL.resolve_timestamp(path, 5_000_001) == 1


def test_ict_enablement_and_monotonic_stamping(spark, tmp_path):
    """Enabling delta.enableInCommitTimestamps commits the writer
    feature + provenance properties, and every subsequent commit
    carries a strictly increasing commitInfo.inCommitTimestamp that
    commit_timestamps() treats as authoritative (over a deliberately
    lying commitInfo.timestamp)."""
    path = str(tmp_path / "ict")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 2).toDF("id").coalesce(1))        # v0
    sink.set_properties({"delta.enableInCommitTimestamps": "true"})
    proto = DL.latest_protocol(path)
    assert "inCommitTimestamp" in (proto.get("writerFeatures") or [])
    meta = DL.latest_metadata(spark, path)
    conf = meta["configuration"]
    assert conf["delta.enableInCommitTimestamps"] == "true"
    assert "delta.inCommitTimestampEnablementVersion" in conf
    assert "delta.inCommitTimestampEnablementTimestamp" in conf

    sink.append(spark.range(2, 4).toDF("id").coalesce(1))
    sink.delete("id = 0")
    enable_v = int(conf["delta.inCommitTimestampEnablementVersion"])
    icts = []
    for v in DL.list_commit_versions(path):
        info = DL._commit_info_of(path, v) or {}
        if v >= enable_v:
            assert "inCommitTimestamp" in info, f"commit {v} missing ICT"
            icts.append(info["inCommitTimestamp"])
    assert icts == sorted(icts) and len(set(icts)) == len(icts)

    # authoritative over a lying wall clock
    head = DL.list_commit_versions(path)[-1]
    _write_commit_ts(path, head, 1)  # nonsense timestamp; ICT survives
    pairs = dict(DL.commit_timestamps(path))
    assert pairs[head] == icts[-1]


def test_starting_timestamp_stream(spark, tmp_path):
    _register(spark)
    path, ckpt = str(tmp_path / "st"), str(tmp_path / "st_ckpt")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(0, 3).toDF("id").coalesce(1))     # v0
    sink.append(spark.range(10, 13).toDF("id").coalesce(1))   # v1
    sink.append(spark.range(20, 22).toDF("id").coalesce(1))   # v2
    _write_commit_ts(path, 0, 1_000_000)
    _write_commit_ts(path, 1, 2_000_000)
    _write_commit_ts(path, 2, 3_000_000)

    rows: list = []

    def collect(bdf, _bid):
        rows.extend(bdf.collect())

    q = (
        spark.readStream.format("mlk_delta")
        .option("path", path)
        .option("startingTimestamp", "1970-01-01T00:25:00")  # 1.5e6 ms
        .load()
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert sorted(r["id"] for r in rows) == [10, 11, 12, 20, 21]

    # beyond the head: empty stream, no error
    rows.clear()
    q = (
        spark.readStream.format("mlk_delta")
        .option("path", path)
        .option("startingTimestamp", "2099-01-01T00:00:00")
        .load()
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "st_ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert rows == []

    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.readStream.format("mlk_delta")
            .option("path", path)
            .option("startingTimestamp", "2024-01-01")
            .option("startingVersion", "1")
            .load()
        )
