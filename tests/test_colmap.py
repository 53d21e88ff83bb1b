"""Column-mapping reads (delta_log.column_mapping_of + read_snapshot
physical->logical rename): name-mode tables with physical file names,
physically-keyed partition values, logical-name predicates; plus the
write-side and mirror-side guards (reads work, rewrites refuse)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_log import UnsupportedTableFeature
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _author(tmp_path, partitioned=True):
    path = str(tmp_path / "cm")
    os.makedirs(path + "/_delta_log")
    fields = [
        {
            "name": "k",
            "type": "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-aa",
            },
        },
        {
            "name": "v",
            "type": "string",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-bb",
            },
        },
    ]
    if partitioned:
        fields.append(
            {
                "name": "part",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 3,
                    "delta.columnMapping.physicalName": "col-pp",
                },
            }
        )
    acts = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "cm-1",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": fields}
                ),
                "partitionColumns": ["col-pp"] if partitioned else [],
                "configuration": {"delta.columnMapping.mode": "name"},
                "createdTime": 0,
            }
        },
    ]
    for part, ks in (("A", [1, 2]), ("B", [3])):
        rel = f"p={part}/f.parquet" if partitioned else f"f{part}.parquet"
        os.makedirs(os.path.dirname(os.path.join(path, rel)), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "col-aa": pa.array(ks, pa.int64()),
                    "col-bb": [f"v{k}" for k in ks],
                }
            ),
            os.path.join(path, rel),
        )
        acts.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {"col-pp": part} if partitioned else {},
                    "size": os.path.getsize(os.path.join(path, rel)),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": len(ks)}),
                }
            }
        )
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    return path


def test_colmap_read_logical_names(spark, tmp_path):
    path = _author(tmp_path)
    df = DL.read_snapshot(spark, path)
    assert df.columns == ["k", "v", "part"]
    rows = sorted((r["k"], r["v"], r["part"]) for r in df.collect())
    assert rows == [(1, "v1", "A"), (2, "v2", "A"), (3, "v3", "B")]


def test_colmap_partition_pruning_with_logical_predicate(spark, tmp_path):
    path = _author(tmp_path)
    rows = DL.read_snapshot(
        spark, path, partition_predicate="part = 'B'"
    ).collect()
    assert [(r["k"], r["part"]) for r in rows] == [(3, "B")]


def test_colmap_row_predicate_exact(spark, tmp_path):
    path = _author(tmp_path)
    rows = DL.read_snapshot(spark, path, predicate="k >= 2").collect()
    assert sorted(r["k"] for r in rows) == [2, 3]


def test_colmap_unpartitioned(spark, tmp_path):
    path = _author(tmp_path, partitioned=False)
    rows = sorted(
        (r["k"], r["v"]) for r in DL.read_snapshot(spark, path).collect()
    )
    assert rows == [(1, "v1"), (2, "v2"), (3, "v3")]


def test_colmap_missing_physical_name_raises(spark, tmp_path):
    path = str(tmp_path / "bad")
    os.makedirs(path + "/_delta_log")
    acts = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "bad",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {
                                "name": "k",
                                "type": "long",
                                "nullable": True,
                                "metadata": {},
                            }
                        ],
                    }
                ),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
                "createdTime": 0,
            }
        },
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    with pytest.raises(UnsupportedTableFeature, match="physicalName"):
        DL.read_snapshot(spark, path)


def test_mirror_stages_colmap_source(spark, tmp_path):
    """Rename-on-ingest: physical-named source files stage under the
    LOGICAL schema (read physical, relabel after the scan), partition
    values map physical->logical keys."""
    src = _author(tmp_path)
    pipe = MirrorPipeline(
        spark,
        source_path=src,
        target_path=str(tmp_path / "dst"),
        state_dir=str(tmp_path / "state"),
        table_name="cm_stage",
    )
    pipe.run_until_idle()
    df = pipe.mirror_df()
    assert {"k", "v", "part"} <= set(df.columns)
    rows = sorted((r["k"], r["v"], r["part"]) for r in df.collect())
    assert rows == [(1, "v1", "A"), (2, "v2", "A"), (3, "v3", "B")]
    assert pipe.run_once()["status"] == "up-to-date"


def test_sink_rewrites_refuse_colmap_table(spark, tmp_path):
    path = _author(tmp_path)
    sink = DeltaSink(spark, path)
    with pytest.raises(UnsupportedTableFeature, match="column mapping"):
        sink.delete("k = 1")
