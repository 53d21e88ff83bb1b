"""Round-11: mid-stream schema-evolution guard on the mlk_delta source.

A streaming query's schema is pinned at load, so a metaData change
landing AFTER the stream started would silently drop new columns (or
mis-read renamed ones) from every later batch — exactly the kind of
silent divergence a live replica must never accumulate.  Delta's own
source fails the stream on schema change; this pins the same posture:

- a LIVE stream fails loudly when the source evolves under it;
- a RESTART picks up the new schema and resumes from the checkpoint;
- HISTORICAL evolution (commits at/below the head the stream loaded
  from) replays fine — old files are read with the latest schema
  (added columns null-fill, widened ones cast).
"""

import time

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from mirror_lake_kusto_spark.streaming.delta_source import DeltaLogDataSource


def _register(spark):
    try:
        spark.dataSource.register(DeltaLogDataSource)
    except Exception:
        pass


def _evolved_schema(spark):
    return (
        spark.createDataFrame([], "n long, extra string").schema.json()
    )


def test_live_stream_fails_on_mid_stream_evolution(spark, tmp_path):
    _register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")
    s = DeltaSink(spark, path)
    s.append(spark.range(3).toDF("n").coalesce(1))           # v0
    batches = []
    q = (
        spark.readStream.format("mlk_delta")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(
            lambda bdf, _b: batches.append(bdf.count())
        )
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and sum(batches) < 3:
            time.sleep(0.2)
        assert sum(batches) == 3
        s.evolve_add(_evolved_schema(spark))                 # v1: evolve
        s.append(
            spark.createDataFrame([(9, "x")], "n long, extra string")
        )                                                    # v2
        with pytest.raises(StreamingQueryException, match="schema.*changed"):
            q.awaitTermination(120)
            raise AssertionError("stream survived a schema change")
    finally:
        q.stop()


def test_restart_picks_up_new_schema(spark, tmp_path):
    """After the loud failure, a plain restart resumes from the stored
    offset WITH the new schema — nothing lost, nothing duplicated."""
    _register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")
    s = DeltaSink(spark, path)
    s.append(spark.range(2).toDF("n").coalesce(1))           # v0
    rows: list = []

    def drain():
        q = (
            spark.readStream.format("mlk_delta")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(
                lambda bdf, _b: rows.extend(bdf.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()                                                  # consumes v0
    assert sorted(r["n"] for r in rows) == [0, 1]
    s.evolve_add(_evolved_schema(spark))                     # v1
    s.append(
        spark.createDataFrame([(7, "x")], "n long, extra string")
    )                                                        # v2
    rows.clear()
    drain()  # fresh reader: evolution is now historical; new schema
    assert [(r["n"], r["extra"]) for r in rows] == [(7, "x")]


def test_historical_evolution_replays_with_null_fill(spark, tmp_path):
    """A fresh stream over a table whose history CONTAINS an evolution
    replays old commits with the latest schema (null-filled extras)."""
    _register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")
    s = DeltaSink(spark, path)
    s.append(spark.range(2).toDF("n").coalesce(1))           # v0: narrow
    s.evolve_add(_evolved_schema(spark))                     # v1
    s.append(
        spark.createDataFrame([(5, "y")], "n long, extra string")
    )                                                        # v2
    rows: list = []
    q = (
        spark.readStream.format("mlk_delta")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(lambda bdf, _b: rows.extend(bdf.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r["n"], r["extra"]) for r in rows)
    assert got == [(0, None), (1, None), (5, "y")]


def test_cdf_stream_also_guarded(spark, tmp_path):
    """The change feed shares _commit_entries, so the guard covers the
    replica path too (a replica silently missing a column would
    corrupt every downstream consumer)."""
    _register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")
    s = DeltaSink(spark, path)
    s.append(spark.range(3).toDF("n").coalesce(1))           # v0
    batches = []
    q = (
        spark.readStream.format("mlk_delta")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(lambda bdf, _b: batches.append(bdf.count()))
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and sum(batches) < 3:
            time.sleep(0.2)
        assert sum(batches) == 3
        s.evolve_add(_evolved_schema(spark))
        s.append(
            spark.createDataFrame([(9, "x")], "n long, extra string")
        )
        with pytest.raises(StreamingQueryException, match="schema.*changed"):
            q.awaitTermination(120)
            raise AssertionError("CDF stream survived a schema change")
    finally:
        q.stop()
