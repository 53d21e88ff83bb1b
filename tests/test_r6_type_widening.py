"""Round-6: ``typeWidening`` reader feature (PROTOCOL.md "Type
Widening").

A Delta 4.x table widens a column's type in metaData (INT -> LONG,
FLOAT -> DOUBLE, DECIMAL growth, DATE -> TIMESTAMP_NTZ) while files
written BEFORE the change keep the narrow physical type.  read_snapshot
already reads every file with the LATEST schema; Spark 4's parquet
readers promote the narrow physical types natively, so supporting the
feature is (a) admitting it through the fail-closed protocol guard and
(b) proving the promoted reads are correct — including stats-based
file skipping whose recorded stats carry the OLD type's spelling.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_log import UnsupportedTableFeature
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _schema_str(a_type: str, b_type: str, a_meta: dict | None = None) -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "a",
                    "type": a_type,
                    "nullable": True,
                    "metadata": a_meta or {},
                },
                {"name": "b", "type": b_type, "nullable": True, "metadata": {}},
            ],
        }
    )


def _author_widened(tmp_path) -> str:
    """Foreign table: v0 = int/float schema + narrow file; v1 = widened
    long/double schema (with the delta.typeChanges provenance metadata
    Databricks records); v2 = a wide file."""
    path = str(tmp_path / "tw")
    os.makedirs(path + "/_delta_log")

    pq.write_table(
        pa.table(
            {
                "a": pa.array([1, 2], pa.int32()),
                "b": pa.array([1.5, 2.5], pa.float32()),
            }
        ),
        os.path.join(path, "narrow.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "a": pa.array([3_000_000_000], pa.int64()),
                "b": pa.array([3.5], pa.float64()),
            }
        ),
        os.path.join(path, "wide.parquet"),
    )

    def add(rel, stats):
        return {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(path, rel)),
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps(stats),
            }
        }

    v0 = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
                "writerFeatures": ["typeWidening"],
            }
        },
        {
            "metaData": {
                "id": "tw-1",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_str("integer", "float"),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        add(
            "narrow.parquet",
            {
                "numRecords": 2,
                "minValues": {"a": 1, "b": 1.5},
                "maxValues": {"a": 2, "b": 2.5},
                "nullCount": {"a": 0, "b": 0},
            },
        ),
    ]
    # the widened schema records the change provenance the way
    # delta-spark does (field metadata delta.typeChanges)
    v1 = [
        {
            "metaData": {
                "id": "tw-1",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_str(
                    "long",
                    "double",
                    a_meta={
                        "delta.typeChanges": [
                            {
                                "fromType": "integer",
                                "toType": "long",
                                "tableVersion": 1,
                            }
                        ]
                    },
                ),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        }
    ]
    v2 = [
        add(
            "wide.parquet",
            {
                "numRecords": 1,
                "minValues": {"a": 3_000_000_000, "b": 3.5},
                "maxValues": {"a": 3_000_000_000, "b": 3.5},
                "nullCount": {"a": 0, "b": 0},
            },
        )
    ]
    for v, acts in enumerate([v0, v1, v2]):
        with open(
            os.path.join(path, "_delta_log", f"{v:020d}.json"), "w"
        ) as f:
            f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    return path


def test_widened_table_passes_guard_and_reads_promoted(spark, tmp_path):
    path = _author_widened(tmp_path)
    DL.check_protocol_supported(path)  # must NOT raise anymore
    df = DL.read_snapshot(spark, path)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "double",
    ]
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [(1, 1.5), (2, 2.5), (3_000_000_000, 3.5)]


def test_widened_table_predicate_skipping_still_exact(spark, tmp_path):
    """File stats recorded under the NARROW type must still prune
    correctly against the widened schema (values beyond int32 range
    only live in the wide file)."""
    path = _author_widened(tmp_path)
    rows = DL.read_snapshot(
        spark, path, predicate="a > 2000000000"
    ).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(3_000_000_000, 3.5)]
    rows = DL.read_snapshot(spark, path, predicate="a <= 2").collect()
    assert sorted(r["a"] for r in rows) == [1, 2]


def test_unknown_reader_feature_still_refused(spark, tmp_path):
    """Admitting typeWidening must not loosen the fail-closed guard."""
    path = str(tmp_path / "bad")
    os.makedirs(path + "/_delta_log")
    acts = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["someFutureFeature"],
                "writerFeatures": ["someFutureFeature"],
            }
        },
        {
            "metaData": {
                "id": "x",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_str("integer", "float"),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    with pytest.raises(UnsupportedTableFeature):
        DL.check_protocol_supported(path)


def test_sink_side_widening_append_roundtrip(spark, tmp_path):
    """The sink's own schema-changing append (int then long frames)
    records new metaData; the read promotes the old narrow files to
    the widened schema."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    path = str(tmp_path / "sw")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(
        spark.createDataFrame(
            [(1,), (2,)], StructType([StructField("a", IntegerType())])
        )
    )
    sink.append(spark.createDataFrame([(3_000_000_000,)], "a: bigint"))
    df = DL.read_snapshot(spark, path)
    assert df.schema.fields[0].dataType.simpleString() == "bigint"
    assert sorted(r["a"] for r in df.collect()) == [1, 2, 3_000_000_000]
