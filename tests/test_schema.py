"""Unit tests for the Delta<->Kusto<->Spark type mapping (SURVEY §1.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mirror_lake_kusto_spark.schema import (
    delta_type_to_spark,
    parse_delta_schema_string,
    spark_schema_to_kusto_columns,
    spark_type_to_kusto,
)


def test_primitives():
    assert delta_type_to_spark("string") == T.StringType()
    assert delta_type_to_spark("long") == T.LongType()
    assert delta_type_to_spark("integer") == T.IntegerType()
    assert delta_type_to_spark("double") == T.DoubleType()
    assert delta_type_to_spark("binary") == T.BinaryType()
    assert delta_type_to_spark("timestamp") == T.TimestampType()


def test_decimal():
    assert delta_type_to_spark("decimal(10,2)") == T.DecimalType(10, 2)
    assert delta_type_to_spark("decimal") == T.DecimalType(38, 18)


def test_nested():
    node = {
        "type": "array",
        "elementType": "string",
        "containsNull": True,
    }
    assert delta_type_to_spark(node) == T.ArrayType(T.StringType(), True)


def test_schema_string_roundtrip():
    s = (
        '{"type":"struct","fields":['
        '{"name":"id","type":"long","nullable":true,"metadata":{}},'
        '{"name":"name","type":"string","nullable":false,"metadata":{}}]}'
    )
    st = parse_delta_schema_string(s)
    assert st.fieldNames() == ["id", "name"]
    assert st["name"].nullable is False


def test_schema_root_must_be_struct():
    with pytest.raises(ValueError):
        parse_delta_schema_string('{"type":"array","elementType":"string"}')


def test_unknown_type_raises():
    # the reference hits NotImplementedException for unknown types
    # (TransactionLogEntry.cs:341-342); we match that strictness
    with pytest.raises(NotImplementedError):
        delta_type_to_spark("uuid")


def test_kusto_mapping():
    assert spark_type_to_kusto(T.LongType()) == "long"
    assert spark_type_to_kusto(T.IntegerType()) == "int"
    assert spark_type_to_kusto(T.FloatType()) == "real"
    assert spark_type_to_kusto(T.TimestampType()) == "datetime"
    assert spark_type_to_kusto(T.ArrayType(T.StringType())) == "dynamic"


def test_columns_list():
    st = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("b", T.LongType()),
        ]
    )
    assert spark_schema_to_kusto_columns(st) == [("a", "string"), ("b", "long")]


def test_unsupported_protocol_raises(spark, tmp_path):
    """A table requiring reader features this engine lacks must fail
    LOUDLY — reading anyway would return wrong rows.  (deletionVectors
    and columnMapping are SUPPORTED since round 4 — see test_dv.py /
    test_colmap.py — a bare feature upgrade no longer blocks reads,
    but unknown features still do.)"""
    import json
    import os

    import pytest

    from mirror_lake_kusto_spark.sources import delta_log as DL
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    sink = DeltaSink(spark, str(tmp_path / "dvtable"))
    sink.append(spark.range(10).toDF("id"))
    log = os.path.join(sink.path, "_delta_log")
    # a DV-feature upgrade alone is readable now (no DV'd adds yet)
    with open(os.path.join(log, "%020d.json" % 1), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors"],
                    }
                }
            )
            + "\n"
        )
    assert len(DL.snapshot_files(spark, sink.path)) > 0
    # an UNKNOWN reader feature still fails closed (catalogOwned now
    # partial-reads the backfilled prefix — test_r8_coordinated — so
    # this guard pins a feature the engine genuinely does not know)
    with open(os.path.join(log, "%020d.json" % 2), "w") as f:
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
    with pytest.raises(DL.UnsupportedTableFeature, match="someFutureFeature"):
        DL.snapshot_files(spark, sink.path)
    with pytest.raises(DL.UnsupportedTableFeature):
        DL.read_changes(spark, sink.path, 0)
    # time travel BEFORE the upgrade still works
    assert len(DL.snapshot_files(spark, sink.path, upto=0)) > 0
