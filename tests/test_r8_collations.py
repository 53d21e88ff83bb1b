"""Round-8 collations read-through (Delta "collations" preview).

Parquet string BYTES are collation-agnostic, so a collated table's
values read normally and the declared collation surfaces through the
schema's field metadata (``__COLLATIONS``).  What must NOT happen is
collation-sensitive file skipping: per-file min/max stats are
binary-ordered, and a range predicate pruned in binary order can drop
files that match under the declared collation — so stats/partition/
bloom pruning is disabled on collated columns (pruning is advisory;
the row filter keeps results exact in Spark's UTF8_BINARY semantics).
"""

import json as _json
import os as _os

import pyspark.sql.functions as F

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _collate(sink, col, ident, feature="collations-preview"):
    """Rewrite the table's metaData + protocol the way a collation-
    aware writer would: reader v3 with the collations feature, and the
    field's metadata carrying __COLLATIONS."""
    meta = DL.latest_metadata(sink.spark, sink.path)
    schema = _json.loads(meta["schemaString"])
    for f in schema["fields"]:
        if f["name"] == col:
            f.setdefault("metadata", {})["__COLLATIONS"] = {col: ident}
    head = DL.list_commit_versions(sink.path)[-1]
    with open(
        _os.path.join(sink.path, "_delta_log", "%020d.json" % (head + 1)),
        "w",
    ) as fh:
        fh.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": [feature],
                        "writerFeatures": [feature],
                    }
                }
            )
            + "\n"
        )
        fh.write(
            _json.dumps(
                {
                    "metaData": {
                        **meta,
                        "schemaString": _json.dumps(schema),
                    }
                }
            )
            + "\n"
        )


def _files_planned(spark, path, pred):
    """Files the pruned plan READS (inputFiles inspects the scan before
    the row filter runs — the pruning decision itself)."""
    return len(DL.read_snapshot(spark, path, predicate=pred).inputFiles())


def test_collated_table_reads_and_surfaces_collation(spark, tmp_path):
    path = str(tmp_path / "coll")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.createDataFrame(
            [(1, "Apple"), (2, "banana"), (3, "Cherry")], "id long, s string"
        )
    )
    _collate(sink, "s", "ICU.UNICODE_CI")
    df = DL.read_snapshot(spark, path)
    assert sorted((r.id, r.s) for r in df.collect()) == [
        (1, "Apple"), (2, "banana"), (3, "Cherry")
    ]
    # the declared collation surfaces: Spark 4 parses __COLLATIONS
    # field metadata into a COLLATED StringType natively
    field = next(f for f in df.schema.fields if f.name == "s")
    assert "UNICODE_CI" in repr(field.dataType)
    meta = DL.latest_metadata(spark, path)
    assert DL.collations_of(meta) == {"s": "ICU.UNICODE_CI"}
    # default collation is NOT reported as collated
    assert (
        DL.collations_of(
            {"schemaString": _json.dumps({
                "type": "struct",
                "fields": [{
                    "name": "s", "type": "string", "nullable": True,
                    "metadata": {"__COLLATIONS": {"s": "SPARK.UTF8_BINARY"}},
                }],
            })}
        )
        == {}
    )


def test_collated_column_disables_string_skipping(spark, tmp_path):
    """Identical two-file layouts; the range predicate prunes files on
    the UNCOLLATED column but scans everything on the collated one."""
    path = str(tmp_path / "collskip")
    sink = DeltaSink(spark, path)
    # file 1: a..m, file 2: n..z — disjoint binary ranges on both cols
    rows1 = [(i, chr(97 + i) * 3, chr(97 + i) * 3) for i in range(13)]
    rows2 = [(i, chr(97 + i) * 3, chr(97 + i) * 3) for i in range(13, 26)]
    sink.append(
        spark.createDataFrame(rows1, "id long, s string, t string")
        .coalesce(1)
    )
    sink.append(
        spark.createDataFrame(rows2, "id long, s string, t string")
        .coalesce(1)
    )
    _collate(sink, "s", "ICU.UNICODE_CI")
    # uncollated column t: binary stats prune the plan to 1 file
    assert _files_planned(spark, path, "t >= 'aaa' AND t < 'ddd'") == 1
    # collated column s: pruning DISABLED -> both files in the plan
    assert _files_planned(spark, path, "s >= 'aaa' AND s < 'ddd'") == 2
    # results stay exact either way
    assert (
        DL.read_snapshot(
            spark, path, predicate="s >= 'aaa' AND s < 'ddd'"
        ).count()
        == 3
    )


def test_collated_mirror_roundtrip(spark, tmp_path):
    """The mirror of a collated source syncs (values byte-faithful)
    and carries the collation metadata through to the target schema."""
    from mirror_lake_kusto_spark.pipeline.orchestrate import MirrorPipeline

    src_path = str(tmp_path / "collsrc")
    src = DeltaSink(spark, src_path)
    src.append(
        spark.createDataFrame(
            [(1, "Ä"), (2, "a"), (3, "b")], "id long, s string"
        )
    )
    _collate(src, "s", "ICU.de")
    pipe = MirrorPipeline(
        spark,
        src_path,
        str(tmp_path / "colldst"),
        str(tmp_path / "collstate"),
        table_name="coll_mirror",
    )
    pipe.run_until_idle()
    out = pipe.mirror_df().select("id", "s")
    assert sorted((r.id, r.s) for r in out.collect()) == [
        (1, "Ä"), (2, "a"), (3, "b")
    ]
    field = next(f for f in out.schema.fields if f.name == "s")
    assert "de" in repr(field.dataType), field
