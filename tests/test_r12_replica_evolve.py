"""Round-12 ask #2: StreamReplica evolution-follow parity with the
batch mirror.

The r11 replica followed evolve_add only — a source RENAME or WIDEN
stopped replication permanently (the restart re-failed in the merge
forever).  Now the replica pins the source schemaString it was built
against in its own table property (mlk.replica.sourceSchema) and, on
restart, diffs by column-mapping physical identity — the same rule as
the batch mirror's _rename_delta/_widen_delta (orchestrate.py):
renames relabel the target via evolve_rename, widens follow via
evolve_widen, adds fall through to the additive follow, and DROP stays
loud by design.

Pins (SURVEY §5 idiom): replica ≡ snapshot after a rename restart and
after a widen restart, positional AND value-keyed; combined
rename+add; drop fails loud.
"""

import pytest

from mirror_lake_kusto_spark.pipeline.stream_replica import StreamReplica
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _snapshot_rows(spark, path, *cols):
    return _rows(DL.read_snapshot(spark, path).select(*cols), *cols)


def test_replica_follows_source_rename_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.range(10)
        .selectExpr("id AS n", "concat('v', id) AS v")
        .coalesce(1)
    )                                                    # v0
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()                                 # shot 1
    s.evolve_rename({"v": "val"})                        # v1: rename
    s.append(
        spark.range(100, 103)
        .selectExpr("id AS n", "concat('w', id) AS val")
        .coalesce(1)
    )                                                    # v2
    rep.run_until_idle()                                 # shot 2: follows
    assert "val" in rep.replica_df().columns
    assert "v" not in rep.replica_df().columns
    assert _rows(rep.replica_df(), "n", "val") == _snapshot_rows(
        spark, src, "n", "val"
    )


def test_replica_follows_source_widen_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.range(8)
        .selectExpr("CAST(id AS INT) AS n", "concat('v', id) AS v")
        .coalesce(1)
    )                                                    # v0
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()                                 # shot 1
    s.evolve_widen({"n": "long"})                        # v1: widen
    s.append(
        spark.range(3_000_000_000, 3_000_000_002)
        .selectExpr("id AS n", "'big' AS v")
        .coalesce(1)
    )                                                    # v2
    rep.run_until_idle()                                 # shot 2: follows
    got = rep.replica_df()
    assert dict(got.dtypes)["n"] == "bigint"
    assert _rows(got, "n", "v") == _snapshot_rows(spark, src, "n", "v")


def test_replica_follows_rename_plus_add(spark, tmp_path):
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.range(6)
        .selectExpr("id AS n", "concat('v', id) AS v")
        .coalesce(1)
    )                                                    # v0
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()                                 # shot 1
    s.evolve_rename({"v": "val"})                        # v1
    from pyspark.sql.types import StructType

    import json

    meta = DL.latest_metadata(spark, src)
    wide = StructType.fromJson(json.loads(meta["schemaString"])).add(
        "extra", "string"
    )
    s.evolve_add(wide.json())                            # v2: add column
    s.append(
        spark.range(200, 202)
        .selectExpr("id AS n", "'r' AS val", "'x' AS extra")
        .coalesce(1)
    )                                                    # v3
    rep.run_until_idle()                                 # shot 2
    assert _rows(rep.replica_df(), "n", "val", "extra") == _snapshot_rows(
        spark, src, "n", "val", "extra"
    )


def test_value_keyed_replica_follows_rename(spark, tmp_path):
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.range(10)
        .selectExpr("id AS k", "concat('v', id) AS v")
        .coalesce(1)
    )                                                    # v0
    s.set_properties({"delta.enableChangeDataFeed": "true"})  # v1
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck"),
        key_cols=["k"],
    )
    rep.run_until_idle()                                 # shot 1
    s.evolve_rename({"v": "val"})                        # v2
    s.update("k = 3", {"val": "'three'"})                # v3: cdc rows
    rep.run_until_idle()                                 # shot 2
    assert _rows(rep.replica_df(), "k", "val") == _snapshot_rows(
        spark, src, "k", "val"
    )


def test_replica_source_drop_stays_loud(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.range(5)
        .selectExpr("id AS n", "concat('v', id) AS v", "'z' AS w")
        .coalesce(1)
    )                                                    # v0
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()                                 # shot 1
    s.evolve_drop(["w"])                                 # v1: DROP
    s.append(
        spark.range(50, 52)
        .selectExpr("id AS n", "'d' AS v")
        .coalesce(1)
    )                                                    # v2
    with pytest.raises(StreamingQueryException, match="dropped"):
        rep.run_until_idle()
