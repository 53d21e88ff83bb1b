"""Bloom-filter file skipping (sources/bloom.py): deterministic
cross-engine hashing, pruning effectiveness, and the advisory-safety
contract — read_snapshot(predicate=p) ≡ read_snapshot().filter(p)
with the index present, stale, or absent."""

from __future__ import annotations

import json
import random

import pyspark.sql.functions as F
import pytest

from mirror_lake_kusto_spark.sources import bloom as B
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from pyspark.sql.types import StructType


def _sink_words(spark, tmp_path, name, n_batches=6, rows=50):
    """One add-file per batch; word column unique per row."""
    sink = DeltaSink(spark, str(tmp_path / name))
    for b in range(n_batches):
        df = (
            spark.range(b * rows, (b + 1) * rows)
            .toDF("id")
            .withColumn("word", F.concat(F.lit("w"), F.col("id")))
            .coalesce(1)
        )
        sink.append(df)
    return sink


def _schema(spark, sink):
    meta = DL.latest_metadata(spark, sink.path)
    return StructType.fromJson(json.loads(meta["schemaString"]))


def test_bloom_positions_jvm_python_identical(spark):
    """The JVM position expression and the Python read-side hash must
    agree bit-for-bit — string and integral renderings."""
    df = spark.createDataFrame(
        [("hello",), ("w123",), ("",), ("it's",), ("héllo",),
         ("日本語テキスト",), ("emoji 🙂🚀",)],
        "v string",
    ).union(spark.createDataFrame([(str(x),) for x in (0, -7, 12345)], "v string"))
    rows = df.select(
        "v", F.expr(B._positions_sql("v", 8192, 6)).alias("ps")
    ).collect()
    for r in rows:
        assert list(r["ps"]) == B._positions_py(r["v"], 8192, 6), r["v"]


def test_build_prune_point_lookup(spark, tmp_path):
    sink = _sink_words(spark, tmp_path, "bl1")
    B.build_bloom_index(spark, sink.path, ["word"], m=4096, k=5)
    files = DL.snapshot_files(spark, sink.path)
    schema = _schema(spark, sink)
    kept = B.prune_files_bloom(sink.path, files, "word = 'w137'", schema)
    # w137 lives in exactly one file; blooms should prune most others
    assert len(kept) < len(files)
    assert any(f for f in kept), "the containing file must survive"
    got = DL.read_snapshot(spark, sink.path, predicate="word = 'w137'")
    assert [r["id"] for r in got.collect()] == [137]


def test_bloom_in_list_pruning(spark, tmp_path):
    sink = _sink_words(spark, tmp_path, "bl2")
    B.build_bloom_index(spark, sink.path, ["word", "id"], m=4096, k=5)
    files = DL.snapshot_files(spark, sink.path)
    schema = _schema(spark, sink)
    kept = B.prune_files_bloom(
        sink.path, files, "word IN ('w10', 'w260')", schema
    )
    assert len(kept) < len(files)
    got = DL.read_snapshot(
        spark, sink.path, predicate="word IN ('w10', 'w260')"
    )
    assert sorted(r["id"] for r in got.collect()) == [10, 260]
    # integral column lookups prune too (canonical decimal rendering)
    kept_id = B.prune_files_bloom(sink.path, files, "id = 42", schema)
    assert len(kept_id) < len(files)


def test_bloom_never_drops_matching_rows(spark, tmp_path):
    """Safety sweep: every value present in the table must survive
    pruning — no false negatives, ever."""
    sink = _sink_words(spark, tmp_path, "bl3", n_batches=4, rows=40)
    B.build_bloom_index(spark, sink.path, ["word"], m=2048, k=4)
    rng = random.Random(7)
    probes = [f"w{rng.randrange(160)}" for _ in range(25)]
    for w in probes:
        got = DL.read_snapshot(
            spark, sink.path, predicate=f"word = '{w}'"
        ).collect()
        assert len(got) == 1 and got[0]["word"] == w


def test_stale_index_is_safe(spark, tmp_path):
    """Files appended AFTER the build have no sidecar entry and are
    always kept — results stay exact without a rebuild."""
    sink = _sink_words(spark, tmp_path, "bl4", n_batches=3)
    B.build_bloom_index(spark, sink.path, ["word"])
    sink.append(
        spark.range(900, 950)
        .toDF("id")
        .withColumn("word", F.concat(F.lit("w"), F.col("id")))
        .coalesce(1)
    )
    got = DL.read_snapshot(spark, sink.path, predicate="word = 'w930'")
    assert [r["id"] for r in got.collect()] == [930]


def test_absent_value_prunes_everything(spark, tmp_path):
    sink = _sink_words(spark, tmp_path, "bl5")
    B.build_bloom_index(spark, sink.path, ["word"], m=4096, k=5)
    files = DL.snapshot_files(spark, sink.path)
    schema = _schema(spark, sink)
    kept = B.prune_files_bloom(
        sink.path, files, "word = 'definitely-not-present'", schema
    )
    # FPR ~2% per file; with 6 files, typically 0 kept — never an error
    assert len(kept) <= len(files)
    got = DL.read_snapshot(
        spark, sink.path, predicate="word = 'definitely-not-present'"
    )
    assert got.count() == 0


def test_unsupported_column_types_raise(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "bl6"))
    sink.append(
        spark.range(5).toDF("id").withColumn("x", F.col("id") * 1.5)
    )
    with pytest.raises(ValueError, match="only string/integral"):
        B.build_bloom_index(spark, sink.path, ["x"])
    with pytest.raises(ValueError, match="not in schema"):
        B.build_bloom_index(spark, sink.path, ["nope"])


def test_bloom_stats_observability(spark, tmp_path):
    sink = _sink_words(spark, tmp_path, "bl7", n_batches=2)
    assert B.bloom_stats(sink.path) is None
    B.build_bloom_index(spark, sink.path, ["word"])
    st = B.bloom_stats(sink.path)
    assert st["columns"] == ["word"] and st["indexed_files"] == 2


# -- property: bloom pruning never produces a false negative ---------------

import hypothesis.strategies as st  # noqa: E402
from hypothesis import given, settings  # noqa: E402

_word = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="'"),
    min_size=0,
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(
    file_values=st.lists(
        st.lists(_word, min_size=0, max_size=12), min_size=1, max_size=4
    ),
    probes=st.lists(_word, min_size=1, max_size=4),
    m=st.sampled_from([64, 512, 2048]),
    k=st.integers(1, 8),
)
def test_bloom_membership_no_false_negatives(file_values, probes, m, k):
    """Pure-hash level (JVM equivalence pinned separately): any value
    written into a file's bitmap must be admitted by might-contain,
    for arbitrary unicode, m, and k."""
    from mirror_lake_kusto_spark.sources.bloom import (
        _bit_set,
        _bitmap_b64,
        _positions_py,
    )
    import base64

    for values in file_values:
        all_pos = [p for v in values for p in _positions_py(v, m, k)]
        bitmap = base64.b64decode(_bitmap_b64(sorted(set(all_pos)), m))
        for v in values + [p for p in probes if p in values]:
            assert all(_bit_set(bitmap, p) for p in _positions_py(v, m, k))


def test_bloom_cli_build_and_stats(spark, tmp_path, capsys):
    from mirror_lake_kusto_spark.__main__ import main

    sink = _sink_words(spark, tmp_path, "blcli", n_batches=2)
    rc = main(["bloom", sink.path, "--columns", "word", "--m", "1024"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"indexed_files": 2' in out
    rc = main(["bloom", sink.path, "--stats"])
    assert rc == 0
    assert '"m": 1024' in capsys.readouterr().out


def test_bloom_composes_with_zorder_optimize(spark, tmp_path):
    """The intended 100 TB layout pipeline: OPTIMIZE ZORDER clusters
    min/max ranges, a bloom REBUILD indexes the compacted files, and a
    point lookup prunes through BOTH mechanisms with exact results."""
    sink = _sink_words(spark, tmp_path, "blz", n_batches=6, rows=50)
    sink.optimize(zorder_by=["id"])
    B.build_bloom_index(spark, sink.path, ["word"], m=4096, k=5)
    got = DL.read_snapshot(spark, sink.path, predicate="word = 'w123'")
    assert [r["id"] for r in got.collect()] == [123]
    st = B.bloom_stats(sink.path)
    live = {f["path"] for f in DL.snapshot_files(spark, sink.path)}
    assert st["indexed_files"] == len(live)


def test_convert_cli(spark, tmp_path, capsys):
    import pyspark.sql.functions as F

    from mirror_lake_kusto_spark.__main__ import main

    src = str(tmp_path / "cliconv")
    spark.range(30).toDF("id").withColumn(
        "w", F.concat(F.lit("c"), F.col("id"))
    ).repartition(2).write.parquet(src)
    rc = main(["convert", src])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"files": 2' in out and '"rows": 30' in out


def test_bloom_on_shallow_clone(spark, tmp_path):
    """A clone's files are stored by ABSOLUTE path — the index must
    key them correctly and point lookups must prune on the clone."""
    src = _sink_words(spark, tmp_path, "blclone_src", n_batches=4)
    clone = DeltaSink.shallow_clone(
        spark, src.path, str(tmp_path / "blclone")
    )
    B.build_bloom_index(spark, clone.path, ["word"], m=4096, k=5)
    st = B.bloom_stats(clone.path)
    assert st["indexed_files"] == 4
    files = DL.snapshot_files(spark, clone.path)
    schema = _schema(spark, clone)
    kept = B.prune_files_bloom(clone.path, files, "word = 'w137'", schema)
    assert len(kept) < len(files)
    got = DL.read_snapshot(spark, clone.path, predicate="word = 'w137'")
    assert [r["id"] for r in got.collect()] == [137]


def test_point_lookup_query_actually_prunes(spark):
    """The registry's mirror_bloom_point_lookup must open fewer files
    than the table holds (min/max + bloom pruning live end-to-end)."""
    import os
    import tempfile

    from mirror_lake_kusto_spark.queries import all_queries
    from mirror_lake_kusto_spark.sources.skipping import parse_conjuncts
    from tests.conftest import SF_DIR

    q = all_queries()["mirror_bloom_point_lookup"]
    rows = q.fn(spark, SF_DIR).collect()
    assert rows and all(r["l_orderkey"] == rows[0]["l_orderkey"] for r in rows)
    sf = os.path.basename(SF_DIR.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), f"mlk_bloomtab_{sf}")
    files = DL.snapshot_files(spark, path)
    assert len(files) == 8
    key = rows[0]["l_orderkey"]
    import json as _json

    meta = DL.latest_metadata(spark, path)
    from pyspark.sql.types import StructType as _St

    schema = _St.fromJson(_json.loads(meta["schemaString"]))
    from mirror_lake_kusto_spark.sources.skipping import prune_files

    kept = prune_files(files, f"l_orderkey = {key}", schema, [])
    kept = B.prune_files_bloom(path, kept, f"l_orderkey = {key}", schema)
    assert len(kept) < 8
