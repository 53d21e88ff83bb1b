"""Round-10: collation-HONORING comparators (extends the r8
read-through).  ``StructType.fromJson`` parses ``__COLLATIONS`` field
metadata into Spark 4's NATIVE collated string types and read_snapshot
scans with that schema, so filters, sorts, joins, and groupings on a
declared-collation column compare under the declared collation inside
Catalyst — for both SPARK.* and ICU.* providers."""

import json
import os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _collated_table(spark, tmp_path, ident="SPARK.UTF8_LCASE"):
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.createDataFrame(
            [("Banana",), ("apple",), ("cherry",), ("Apricot",)],
            "s string",
        )
    )
    meta = DL.latest_metadata(spark, path)
    schema = json.loads(meta["schemaString"])
    schema["fields"][0].setdefault("metadata", {})["__COLLATIONS"] = {
        "s": ident
    }
    head = DL.list_commit_versions(path)[-1]
    with open(
        os.path.join(path, "_delta_log", "%020d.json" % (head + 1)), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["collations-preview"],
                        "writerFeatures": ["collations-preview"],
                    }
                }
            )
            + "\n"
            + json.dumps(
                {"metaData": {**meta, "schemaString": json.dumps(schema)}}
            )
            + "\n"
        )
    return path


def test_collated_sort_differs_from_binary(spark, tmp_path):
    import pyspark.sql.functions as F

    path = _collated_table(spark, tmp_path)
    df = DL.read_snapshot(spark, path)
    assert "UTF8_LCASE" in dict(df.dtypes)["s"].upper()
    collated = [r["s"] for r in df.orderBy("s").collect()]
    assert collated == ["apple", "Apricot", "Banana", "cherry"]  # lcase
    binary = [
        r["s"]
        for r in df.orderBy(F.collate(F.col("s"), "UTF8_BINARY")).collect()
    ]
    assert binary == ["Apricot", "Banana", "apple", "cherry"]


def test_collated_filter_matches_case_insensitively(spark, tmp_path):
    path = _collated_table(spark, tmp_path)
    # UTF8_LCASE equality finds 'Banana' — including via the
    # predicate= pushdown path (binary-ordered stats pruning is
    # DISABLED on collated columns, so no file is wrongly dropped)
    assert (
        DL.read_snapshot(spark, path).filter("s = 'banana'").count() == 1
    )
    assert (
        DL.read_snapshot(spark, path, predicate="s = 'banana'").count()
        == 1
    )


def test_icu_collation_honored(spark, tmp_path):
    path = _collated_table(spark, tmp_path, ident="ICU.UNICODE_CI")
    collated = [
        r["s"]
        for r in DL.read_snapshot(spark, path).orderBy("s").collect()
    ]
    assert collated == ["apple", "Apricot", "Banana", "cherry"]


def test_unknown_collation_fails_loudly(spark, tmp_path):
    path = _collated_table(spark, tmp_path, ident="ICU.NO_SUCH_COLLATION")
    with pytest.raises(Exception, match="NO_SUCH_COLLATION|COLLATION"):
        DL.read_snapshot(spark, path).collect()


def test_values_read_through_unchanged(spark, tmp_path):
    """The r8 guarantee stands: VALUES read normally (parquet string
    bytes are collation-agnostic) — only comparisons change."""
    path = _collated_table(spark, tmp_path)
    got = {r["s"] for r in DL.read_snapshot(spark, path).collect()}
    assert got == {"Banana", "apple", "cherry", "Apricot"}
