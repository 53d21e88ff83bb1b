"""V2 (manifest + sidecar) checkpoints and the widened reader-feature
acceptance (timestampNtz, vacuumProtocolCheck, v2Checkpoint) — the log
shapes current Delta writers emit by default."""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _to_v2_checkpoint(spark, path):
    """Convert the table's classic log into a v2 manifest+sidecar
    checkpoint at the current head, then truncate the JSON commits —
    readers MUST take the v2 path afterwards."""
    head = max(DL.list_commit_versions(path))
    files = DL.snapshot_files(spark, path)
    meta = DL.latest_metadata(spark, path)
    log = os.path.join(path, "_delta_log")
    side_dir = os.path.join(log, "_sidecars")
    os.makedirs(side_dir, exist_ok=True)

    add_type = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]
    )
    adds = [
        {
            "path": f["path"],
            "partitionValues": list((f["partitionValues"] or {}).items()),
            "size": f["size"],
            "modificationTime": 0,
            "dataChange": True,
            "stats": f.get("stats"),
        }
        for f in files
    ]
    side_name = f"{uuid.uuid4()}.parquet"
    pq.write_table(
        pa.table({"add": pa.array(adds, add_type)}),
        os.path.join(side_dir, side_name),
    )

    proto_type = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    meta_type = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    sidecar_type = pa.struct(
        [
            ("path", pa.string()),
            ("sizeInBytes", pa.int64()),
            ("modificationTime", pa.int64()),
        ]
    )
    ckpt_meta_type = pa.struct([("version", pa.int64())])
    manifest = pa.table(
        {
            "protocol": pa.array(
                [
                    {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["v2Checkpoint"],
                        "writerFeatures": ["v2Checkpoint"],
                    },
                    None,
                    None,
                ],
                proto_type,
            ),
            "metaData": pa.array(
                [
                    None,
                    {
                        "id": meta["id"],
                        "format": {"provider": "parquet"},
                        "schemaString": meta["schemaString"],
                        "partitionColumns": meta.get("partitionColumns")
                        or [],
                        "configuration": list(
                            (meta.get("configuration") or {}).items()
                        ),
                        "createdTime": 0,
                    },
                    None,
                ],
                meta_type,
            ),
            "sidecar": pa.array(
                [
                    None,
                    None,
                    {
                        "path": side_name,
                        "sizeInBytes": 1,
                        "modificationTime": 0,
                    },
                ],
                sidecar_type,
            ),
            "checkpointMetadata": pa.array(
                [None, None, None], ckpt_meta_type
            ),
        }
    )
    pq.write_table(
        manifest,
        os.path.join(
            log, f"{head:020d}.checkpoint.{uuid.uuid4()}.parquet"
        ),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": head, "size": len(files)}, f)
    for v in DL.list_commit_versions(path):
        if v <= head:
            os.remove(os.path.join(log, f"{v:020d}.json"))


def test_v2_checkpoint_snapshot_read(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "k long, v string"
        )
    )
    sink.delete("k = 2")
    _to_v2_checkpoint(spark, path)
    got = sorted(r["k"] for r in DL.read_snapshot(spark, path).collect())
    assert got == [0, 1, 3, 4, 5]
    # driver replay path agrees
    assert len(DL.snapshot_files(spark, path)) >= 1
    # further commits on top of the v2 checkpoint still apply
    DeltaSink(spark, path).append(
        spark.createDataFrame([(9, "v9")], "k long, v string")
    )
    got = sorted(r["k"] for r in DL.read_snapshot(spark, path).collect())
    assert got == [0, 1, 3, 4, 5, 9]


def test_v2_checkpoint_spark_replay_path(spark, tmp_path):
    """Force the DataFrame replay (bypassing the driver fast path) by
    reading actions directly."""
    path = str(tmp_path / "t")
    DeltaSink(spark, path).append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )
    _to_v2_checkpoint(spark, path)
    acts = DL.read_actions(spark, path)
    adds = acts.filter("add IS NOT NULL").count()
    protos = acts.filter("protocol IS NOT NULL").count()
    metas = acts.filter("metaData IS NOT NULL").count()
    assert adds >= 1 and protos >= 1 and metas >= 1


def test_timestamp_ntz_feature_accepted(spark, tmp_path):
    path = str(tmp_path / "t")
    os.makedirs(path + "/_delta_log")
    t = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000, 1_700_000_100_000_000],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(t, os.path.join(path, "f.parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {
                "name": "ts",
                "type": "timestamp_ntz",
                "nullable": True,
                "metadata": {},
            },
        ],
    }
    acts = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
                "writerFeatures": ["timestampNtz"],
            }
        },
        {
            "metaData": {
                "id": "ntz",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": "f.parquet",
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(path, "f.parquet")),
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 2}),
            }
        },
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    df = DL.read_snapshot(spark, path)
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert df.count() == 2


def test_unknown_feature_still_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(spark.createDataFrame([(1,)], "n long"))
    with open(
        os.path.join(path, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["someFutureFeature"],
                    }
                }
            )
            + "\n"
        )
    # round 8: catalogOwned now partial-reads the backfilled prefix
    # (test_r8_coordinated), so this guard is pinned with a feature
    # the engine genuinely does not know
    with pytest.raises(
        DL.UnsupportedTableFeature, match="someFutureFeature"
    ):
        DL.read_snapshot(spark, path).collect()


def test_sink_writes_v2_checkpoints(spark, tmp_path):
    """checkpoint_format='v2': the sink's periodic checkpoint is a
    manifest + distributed sidecars; reads work through both replay
    paths, the protocol row carries v2Checkpoint, txn ledger entries
    survive truncation, and further commits land on top."""
    path = str(tmp_path / "t")
    sink = DeltaSink(
        spark, path, checkpoint_interval=3, checkpoint_format="v2"
    )
    for i in range(3):
        sink.append(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string"),
            txn=("writer-app", i),
        )
    # interval crossed at v2 -> the sink first COMMITS the v2Checkpoint
    # protocol upgrade (v3) so JSON replay and checkpoint replay agree,
    # then checkpoints at the upgrade version
    assert DL.read_last_checkpoint(path) == 3
    # the upgrade is a real LOG action (not invented in the manifest)
    # and enumerates the legacy features writer version 2 implied
    with open(os.path.join(path, "_delta_log", f"{3:020d}.json")) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    pr = next(a["protocol"] for a in acts if "protocol" in a)
    assert "v2Checkpoint" in pr["readerFeatures"]
    assert {"appendOnly", "invariants", "v2Checkpoint"} <= set(
        pr["writerFeatures"]
    )
    names = os.listdir(os.path.join(path, "_delta_log"))
    assert any(".checkpoint." in n and n.endswith(".parquet") for n in names)
    assert os.path.isdir(os.path.join(path, "_delta_log", "_sidecars"))
    # truncate the JSON history: readers must survive on the checkpoint
    for v in DL.list_commit_versions(path):
        if v <= 3:
            os.remove(
                os.path.join(path, "_delta_log", f"{v:020d}.json")
            )
    got = sorted(r["k"] for r in DL.read_snapshot(spark, path).collect())
    assert got == [0, 1, 2]
    proto = DL.latest_protocol(path)
    assert "v2Checkpoint" in (proto["readerFeatures"] or [])
    # exactly-once ledger survives the truncation (I3)
    assert DL.last_txn_version(spark, path, "writer-app") == 2
    # and the table keeps working
    sink2 = DeltaSink(spark, path, checkpoint_format="v2")
    sink2.append(spark.createDataFrame([(9, "v9")], "k long, v string"))
    got = sorted(r["k"] for r in DL.read_snapshot(spark, path).collect())
    assert got == [0, 1, 2, 9]


def test_sink_v2_checkpoint_multipart_sidecars(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = DeltaSink(
        spark,
        path,
        checkpoint_interval=100,
        checkpoint_parts=3,
        checkpoint_format="v2",
    )
    sink.append(spark.range(50).toDF("n").repartition(4))
    sink._write_checkpoint(0)
    side = os.listdir(os.path.join(path, "_delta_log", "_sidecars"))
    assert len(side) == 3  # sharded file actions
    os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
    assert DL.read_snapshot(spark, path).count() == 50


def test_mirror_from_v2_checkpoint_only_source(spark, tmp_path):
    """Fresh mirror of a source whose JSON history is fully truncated
    behind a v2 checkpoint: discovery must take the snapshot-diff path
    through the manifest + sidecars."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline

    src = str(tmp_path / "src")
    sink = DeltaSink(
        spark, src, checkpoint_interval=2, checkpoint_format="v2"
    )
    sink.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    sink.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    # checkpoint lands at v2: the committed v2Checkpoint protocol upgrade
    assert DL.read_last_checkpoint(src) == 2
    sink.vacuum()  # truncate JSON commits <= checkpoint
    sink.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    pipe = MirrorPipeline(
        spark,
        source_path=src,
        target_path=str(tmp_path / "dst"),
        state_dir=str(tmp_path / "state"),
        table_name="v2src",
    )
    pipe.run_until_idle()
    got = sorted(r["k"] for r in pipe.mirror_df().collect())
    assert got == [1, 2, 3]
    assert pipe.run_once()["status"] == "up-to-date"
