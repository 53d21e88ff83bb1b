"""Delta <-> Kusto <-> Spark type mapping (SURVEY §1.2).

The reference maps Delta schemaString types to Kusto scalar types at
``Storage/DeltaLake/TransactionLogEntry.cs:317-344``.  We map both
directions onto Spark types.  Unlike the reference we support ``binary``
natively (the reference returns the error message as the type string —
a latent bug at TransactionLogEntry.cs:333-334) and we represent Kusto
``dynamic`` as a JSON string column (helpers in functions.kql parse it).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

# Delta primitive type name -> Spark type (delta-io PROTOCOL.md type names).
_DELTA_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "integer": T.IntegerType(),
    "short": T.ShortType(),
    "byte": T.ByteType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    # Delta "variantType" table feature: semi-structured values with
    # shredded parquet storage (PROTOCOL.md "Variant Data Type");
    # Spark 4 reads both unshredded (metadata/value) and shredded
    # (typed_value) physical layouts natively
    "variant": T.VariantType(),
}

# Spark type -> Kusto scalar type string (parity table with
# TransactionLogEntry.cs:317-344; complex types -> dynamic).
_SPARK_TO_KUSTO: dict[type, str] = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.FloatType: "real",
    T.DoubleType: "real",
    T.BooleanType: "bool",
    T.DateType: "datetime",
    T.TimestampType: "datetime",
    T.TimestampNTZType: "datetime",
    T.BinaryType: "string",  # reference: unsupported; we base64 if exporting
    T.VariantType: "dynamic",
}


def delta_type_to_spark(delta_type: Any) -> T.DataType:
    """One Delta schemaString ``type`` node -> Spark DataType."""
    if isinstance(delta_type, str):
        if delta_type in _DELTA_TO_SPARK:
            return _DELTA_TO_SPARK[delta_type]
        if delta_type.startswith("decimal"):
            # "decimal(p,s)"
            inner = delta_type[len("decimal") :].strip("()")
            if inner:
                p, s = (int(x) for x in inner.split(","))
                return T.DecimalType(p, s)
            return T.DecimalType(38, 18)
        raise NotImplementedError(f"unsupported Delta type: {delta_type!r}")
    if isinstance(delta_type, dict):
        kind = delta_type.get("type")
        if kind == "struct":
            return delta_struct_to_spark(delta_type)
        if kind == "array":
            return T.ArrayType(
                delta_type_to_spark(delta_type["elementType"]),
                bool(delta_type.get("containsNull", True)),
            )
        if kind == "map":
            return T.MapType(
                delta_type_to_spark(delta_type["keyType"]),
                delta_type_to_spark(delta_type["valueType"]),
                bool(delta_type.get("valueContainsNull", True)),
            )
    raise NotImplementedError(f"unsupported Delta type node: {delta_type!r}")


def delta_struct_to_spark(node: dict) -> T.StructType:
    """Delta schemaString root -> Spark StructType.

    Mirrors the strictness of TransactionLogEntry.cs:295-302: the root
    must be a struct with fields.
    """
    if node.get("type") != "struct" or "fields" not in node:
        raise ValueError(f"Delta schema root must be a struct with fields: {node!r}")
    fields = [
        T.StructField(
            f["name"],
            delta_type_to_spark(f["type"]),
            bool(f.get("nullable", True)),
            metadata=f.get("metadata") or {},
        )
        for f in node["fields"]
    ]
    return T.StructType(fields)


def parse_delta_schema_string(schema_string: str) -> T.StructType:
    """The ``schemaString`` JSON inside a Delta metaData action -> StructType."""
    return delta_struct_to_spark(json.loads(schema_string))


def spark_type_to_kusto(dt: T.DataType) -> str:
    """Spark type -> Kusto scalar type string (complex types -> dynamic)."""
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
        return "dynamic"
    kusto = _SPARK_TO_KUSTO.get(type(dt))
    if kusto is None:
        raise NotImplementedError(f"no Kusto mapping for Spark type {dt}")
    return kusto


def spark_schema_to_kusto_columns(schema: T.StructType) -> list[tuple[str, str]]:
    """Schema -> [(name, kusto_type)] as the reference's ColumnDefinition list
    (Storage/ColumnDefinition.cs:9-14)."""
    return [(f.name, spark_type_to_kusto(f.dataType)) for f in schema.fields]
