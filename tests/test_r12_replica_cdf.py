"""Round-12 top ask: StreamReplica over a CDF-ENABLED source.

A table under ``delta.enableChangeDataFeed`` writes ``_change_data``
files whose rows carry VALUES (insert / delete / update_preimage /
update_postimage), not positions — the positional ``changeRowIds``
identity cannot exist for them, and the mlk_delta source refuses such
commits loudly.  ``StreamReplica(key_cols=[...])`` switches to a
VALUE-KEYED merge on a business key (reference analogue: the batch
remove handling ``BlobLoadingOrchestration.cs:117-138`` has no such
restriction).

Pins: replica ≡ source snapshot through MERGE (all four change types)
+ CoW delete + update + plain append; key-CHANGING updates net to
delete(old key) + upsert(new key); one-shot ≡ two-shot restart (SURVEY
§5 idiom); the no-key positional mode still refuses CDF commits; NULL
business keys fail loud; key_cols validation.
"""

import pytest

from mirror_lake_kusto_spark.pipeline.stream_replica import StreamReplica
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _rows(df, *cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def _snapshot_rows(spark, path, *cols):
    return _rows(DL.read_snapshot(spark, path).select(*cols), *cols)


def _cdf_source(spark, path, n=20):
    s = DeltaSink(spark, path)
    s.append(
        spark.range(n)
        .selectExpr("id AS k", "concat('v', id) AS v")
        .coalesce(1)
    )                                                          # v0
    s.set_properties({"delta.enableChangeDataFeed": "true"})   # v1
    return s


def test_value_keyed_replica_follows_cdf_merge(spark, tmp_path):
    src = str(tmp_path / "src")
    s = _cdf_source(spark, src)
    # v2: MERGE emitting all four change types in ONE commit —
    # update_preimage/update_postimage (k<5 matched), insert (k=100),
    # delete (k=17)
    ups = spark.range(5).selectExpr("id AS k", "concat('u', id) AS v")
    ins = spark.sql("SELECT 100 AS k, 'new' AS v")
    s.merge(
        ups.unionByName(ins),
        key_cols=["k"],
        delete_keys=spark.sql("SELECT 17 AS k"),
    )
    s.delete("k = 8")                                          # v3: CoW
    s.update("k = 9", {"v": "'nine'"})                         # v4
    s.append(spark.range(200, 203).selectExpr(
        "id AS k", "concat('a', id) AS v").coalesce(1))        # v5
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck"),
        key_cols=["k"],
    )
    rep.run_until_idle()
    assert _rows(rep.replica_df(), "k", "v") == _snapshot_rows(
        spark, src, "k", "v"
    )


def test_value_keyed_key_changing_update(spark, tmp_path):
    """An update that CHANGES the business key emits preimage(old key)
    with no postimage beside it and postimage(new key): the replica
    must delete the old key and upsert the new one."""
    src = str(tmp_path / "src")
    s = _cdf_source(spark, src, n=10)
    s.update("k = 5", {"k": "505"})                            # v2
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck"),
        key_cols=["k"],
    )
    rep.run_until_idle()
    got = _rows(rep.replica_df(), "k", "v")
    assert got == _snapshot_rows(spark, src, "k", "v")
    keys = [k for k, _ in got]
    assert 5 not in keys and 505 in keys


def test_value_keyed_one_shot_equals_two_shot_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    s = _cdf_source(spark, src, n=15)
    s.update("k % 4 = 2", {"v": "concat(v, '_x')"})            # v2
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck"),
        key_cols=["k"],
    )
    rep.run_until_idle()                                       # shot 1
    assert _rows(rep.replica_df(), "k", "v") == _snapshot_rows(
        spark, src, "k", "v"
    )
    s.merge(
        spark.sql("SELECT 3 AS k, 'm3' AS v"),
        key_cols=["k"],
        delete_keys=spark.sql("SELECT 11 AS k"),
    )                                                          # v3
    s.delete("k = 0")                                          # v4
    rep.run_until_idle()                                       # shot 2
    two_shot = _rows(rep.replica_df(), "k", "v")
    fresh = StreamReplica(
        spark, src, str(tmp_path / "rep2"), str(tmp_path / "ck2"),
        key_cols=["k"],
    )
    fresh.run_until_idle()
    assert two_shot == _rows(fresh.replica_df(), "k", "v")
    assert two_shot == _snapshot_rows(spark, src, "k", "v")


def test_positional_mode_still_refuses_cdf_commits(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    s = _cdf_source(spark, src, n=8)
    s.update("k = 2", {"v": "'two'"})                          # v2: cdc
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    with pytest.raises(StreamingQueryException, match="_change_data"):
        rep.run_until_idle()


def test_value_keyed_null_key_fails_loud(spark, tmp_path):
    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(
        spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS k, 'x' AS v "
            "UNION ALL SELECT 1, 'y'"
        ).coalesce(1)
    )
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck"),
        key_cols=["k"],
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="NULL"):
        rep.run_until_idle()


def test_key_cols_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="non-empty"):
        StreamReplica(
            spark, str(tmp_path / "s"), str(tmp_path / "r"),
            str(tmp_path / "c"), key_cols=[],
        )
    with pytest.raises(ValueError, match="collide"):
        StreamReplica(
            spark, str(tmp_path / "s"), str(tmp_path / "r"),
            str(tmp_path / "c"), key_cols=["_change_type"],
        )
    src = str(tmp_path / "src")
    DeltaSink(spark, src).append(spark.range(3).toDF("n").coalesce(1))
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck"),
        key_cols=["nope"],
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="nope"):
        rep.run_until_idle()
