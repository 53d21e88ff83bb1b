"""Round-6: ``variantType`` reader/writer feature (PROTOCOL.md
"Variant Data Type").

VARIANT columns store semi-structured values as binary
(metadata/value), optionally SHREDDED: the parquet layout adds
typed_value columns and the reader reconstructs the variant.  Spark 4
reads both layouts natively (spark.sql.variant.allowReadingShredded),
so the engine's job is (a) schema translation ("variant" <->
VariantType), (b) admitting the feature through the fail-closed
protocol guard, (c) committing the feature gate when the sink writes a
variant frame, and (d) footer-free add stats — pyarrow cannot parse
the VARIANT logical type, so staging falls back to one distributed
row-count job.
"""

from __future__ import annotations

import json
import os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _variant_df(spark, lo, hi):
    return spark.sql(
        "select id, parse_json(concat('{\"a\":', id, ', \"b\":\"x', id,"
        " '\"}')) as v from range(%d, %d)" % (lo, hi)
    )


def test_sink_variant_roundtrip_and_feature_gate(spark, tmp_path):
    path = str(tmp_path / "vt")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(_variant_df(spark, 0, 3))
    proto = DL.latest_protocol(path)
    assert "variantType" in (proto.get("readerFeatures") or [])
    assert "variantType" in (proto.get("writerFeatures") or [])
    DL.check_protocol_supported(path)
    df = DL.read_snapshot(spark, path)
    assert df.schema["v"].dataType.typeName() == "variant"
    got = sorted(
        (r["id"], r["a"])
        for r in df.selectExpr(
            "id", "variant_get(v, '$.a', 'int') as a"
        ).collect()
    )
    assert got == [(0, 0), (1, 1), (2, 2)]
    # adds carry footer-free numRecords stats (pyarrow cannot read the
    # VARIANT footer) — and DELETE's rewrite path works the same way
    adds = [
        a["add"]
        for a in DL._read_commit(path, 0)
        if "add" in a
    ]
    assert adds and all(
        json.loads(a["stats"])["numRecords"] >= 0 for a in adds
    )
    sink.delete("id = 1")
    got = sorted(
        r["id"] for r in DL.read_snapshot(spark, path).collect()
    )
    assert got == [0, 2]


def test_foreign_shredded_variant_table_reads(spark, tmp_path):
    """A table whose files were written SHREDDED (typed_value layout,
    via Spark's test hook) behind a hand-authored variantType log:
    the guard admits it and the read reconstructs full variants."""
    path = str(tmp_path / "vs")
    os.makedirs(path + "/_delta_log")
    spark.conf.set(
        "spark.sql.variant.forceShreddingSchemaForTest", "a int, b string"
    )
    try:
        _variant_df(spark, 0, 4).coalesce(1).write.mode("append").parquet(
            path
        )
    finally:
        spark.conf.unset("spark.sql.variant.forceShreddingSchemaForTest")
    files = [n for n in os.listdir(path) if n.endswith(".parquet")]
    assert len(files) == 1
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "variant", "nullable": True, "metadata": {}},
        ],
    }
    acts = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["variantType"],
                "writerFeatures": ["variantType"],
            }
        },
        {
            "metaData": {
                "id": "vs-1",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": files[0],
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(path, files[0])),
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 4}),
            }
        },
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    DL.check_protocol_supported(path)
    df = DL.read_snapshot(spark, path)
    got = sorted(
        (r["id"], r["a"], r["b"])
        for r in df.selectExpr(
            "id",
            "variant_get(v, '$.a', 'int') as a",
            "variant_get(v, '$.b', 'string') as b",
        ).collect()
    )
    assert got == [(0, 0, "x0"), (1, 1, "x1"), (2, 2, "x2"), (3, 3, "x3")]
    # full reconstruction, not just typed_value fields
    s = sorted(str(r["v"]) for r in df.collect())
    assert s[0] == '{"a":0,"b":"x0"}'


def test_schema_uses_variant_walks_properly(spark, tmp_path):
    """A column literally NAMED 'variant' must not trip the feature
    gate; a nested array<variant> must."""
    path = str(tmp_path / "vn")
    sink = DeltaSink(spark, path, checkpoint_interval=10**6)
    sink.append(spark.range(2).withColumnRenamed("id", "variant"))
    proto = DL.latest_protocol(path)
    assert "variantType" not in (proto.get("readerFeatures") or [])

    path2 = str(tmp_path / "vnest")
    sink2 = DeltaSink(spark, path2, checkpoint_interval=10**6)
    sink2.append(
        spark.sql(
            "select id, array(parse_json(cast(id as string))) as arr "
            "from range(2)"
        )
    )
    proto2 = DL.latest_protocol(path2)
    assert "variantType" in (proto2.get("readerFeatures") or [])
    back = DL.read_snapshot(spark, path2).selectExpr(
        "id", "variant_get(arr[0], '$', 'long') as x"
    )
    assert sorted((r["id"], r["x"]) for r in back.collect()) == [
        (0, 0),
        (1, 1),
    ]
