"""Round-11 ask #2: collation-AWARE file skipping.

Round 8 disabled stats pruning on collated columns wholesale (binary
min/max order is not the collation's order — correct, but a filter on
a UTF8_LCASE column full-scans at 100x).  Round 11 restores pruning
for the SPARK.UTF8_LCASE family via the case-variant interval: for an
ASCII literal L, every string with lower(s) == lower(L) lies in
[upper(L), lower(L)] in binary order, so a file whose [min, max]
misses that interval is provably match-free.  ICU collations, RTRIM
variants, non-ASCII literals, and range operators stay non-prunable.
"""

import json
import os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from mirror_lake_kusto_spark.sources.skipping import (
    parse_conjuncts,
    prune_files,
)
from pyspark.sql.types import StringType, StructField, StructType

_SCHEMA = StructType([StructField("s", StringType())])


def _collated_table(spark, tmp_path, batches, ident="SPARK.UTF8_LCASE"):
    """One file per batch, then a collation-declaring commit."""
    path = str(tmp_path / "t")
    sink = DeltaSink(spark, path)
    for rows in batches:
        sink.append(
            spark.createDataFrame([(r,) for r in rows], "s string").coalesce(1)
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


def _fake_file(lo, hi, n=5):
    return {
        "path": f"f_{lo}_{hi}.parquet",
        "partitionValues": {},
        "stats": json.dumps(
            {
                "numRecords": n,
                "minValues": {"s": lo},
                "maxValues": {"s": hi},
                "nullCount": {"s": 0},
            }
        ),
    }


_LCASE = {"s": "SPARK.UTF8_LCASE"}


def test_lcase_equality_prunes_disjoint_files():
    # case-clustered files (the common layout): only the file whose
    # range intersects a case-variant hull of the literal survives
    files = [
        _fake_file("aaa", "apple"),
        _fake_file("BANANA", "Banana"),
        _fake_file("cherry", "plum"),
    ]
    kept = prune_files(files, "s = 'bAnAnA'", _SCHEMA, collations=_LCASE)
    assert [f["path"] for f in kept] == ["f_BANANA_Banana.parquet"]


def test_lcase_equality_keeps_case_straddling_file():
    # a file spanning the upper->lower byte gap ([Apricot, apple]
    # contains every 'B*' string) genuinely admits 'BAnAnA' — it must
    # be kept even though neither endpoint resembles the literal
    files = [_fake_file("Apricot", "apple")]
    kept = prune_files(files, "s = 'banana'", _SCHEMA, collations=_LCASE)
    assert len(kept) == 1


def test_lcase_equality_keeps_variant_straddling_file():
    # the unsound fold-the-stats counter-example: a file spanning
    # ['Y', 'a'] may contain 'Z', which matches 'z' under LCASE —
    # folding min/max to ['y', 'a'] would wrongly skip it
    files = [_fake_file("Y", "a")]
    kept = prune_files(files, "s = 'z'", _SCHEMA, collations=_LCASE)
    assert len(kept) == 1


def test_lcase_in_prunes_per_value():
    files = [
        _fake_file("APRICOT", "Apple"),
        _fake_file("mango", "mulberry"),
        _fake_file("cherry", "fig"),
    ]
    kept = prune_files(
        files, "s IN ('Mango', 'apricot')", _SCHEMA, collations=_LCASE
    )
    assert sorted(f["path"] for f in kept) == [
        "f_APRICOT_Apple.parquet",
        "f_mango_mulberry.parquet",
    ]


def test_lcase_range_ops_never_prune():
    files = [_fake_file("x", "z")]
    for pred in ("s < 'b'", "s <= 'b'", "s > 'zz'", "s >= 'zz'"):
        assert len(prune_files(files, pred, _SCHEMA, collations=_LCASE)) == 1
        assert parse_conjuncts(pred, _SCHEMA, _LCASE) == []


def test_lcase_inequality_skips_single_variant_file():
    files = [_fake_file("MiXeD", "MiXeD"), _fake_file("a", "z")]
    kept = prune_files(files, "s != 'mixed'", _SCHEMA, collations=_LCASE)
    assert [f["path"] for f in kept] == ["f_a_z.parquet"]


def test_non_ascii_literal_disables_lcase_pruning():
    files = [_fake_file("a", "b")]
    kept = prune_files(files, "s = 'straße'", _SCHEMA, collations=_LCASE)
    assert len(kept) == 1
    assert parse_conjuncts("s = 'straße'", _SCHEMA, _LCASE) == []


def test_icu_collation_stays_non_prunable():
    files = [_fake_file("a", "b")]
    icu = {"s": "ICU.de_DE"}
    assert len(prune_files(files, "s = 'zzz'", _SCHEMA, collations=icu)) == 1
    assert parse_conjuncts("s = 'zzz'", _SCHEMA, icu) == []


def test_null_checks_prune_on_any_collation():
    no_nulls = _fake_file("a", "b")
    all_null = {
        "path": "nulls.parquet",
        "partitionValues": {},
        "stats": json.dumps(
            {"numRecords": 3, "nullCount": {"s": 3}}
        ),
    }
    for coll in (_LCASE, {"s": "ICU.de_DE"}):
        kept = prune_files(
            [no_nulls, all_null], "s IS NULL", _SCHEMA, collations=coll
        )
        assert [f["path"] for f in kept] == ["nulls.parquet"]
        kept = prune_files(
            [no_nulls, all_null], "s IS NOT NULL", _SCHEMA, collations=coll
        )
        assert [f["path"] for f in kept] == [no_nulls["path"]]


def test_lcase_pruning_is_sound_exhaustively():
    """Brute force over a tricky alphabet spanning the upper/lower
    byte-order boundary: for every 2-char min/max pair and every
    2-char literal, a skipped file must contain NO case-insensitive
    match anywhere in its [min, max] range."""
    import itertools

    alpha = ["A", "Z", "_", "a", "z"]  # '_' sits between 'Z' and 'a'
    strings = ["".join(p) for p in itertools.product(alpha, repeat=2)]
    strings.sort()
    for i, lo in enumerate(strings):
        for hi in strings[i:]:
            f = [_fake_file(lo, hi)]
            in_range = [s for s in strings if lo <= s <= hi]
            for lit in ("az", "Za", "_z", "zz", "AZ"):
                kept = prune_files(
                    f, f"s = '{lit}'", _SCHEMA, collations=_LCASE
                )
                has_match = any(
                    s.lower() == lit.lower() for s in in_range
                )
                if has_match:
                    assert kept, (lo, hi, lit)


def test_end_to_end_collated_pruning_and_correctness(spark, tmp_path):
    """Three single-file commits; an LCASE equality predicate must (a)
    return the case-insensitive matches and (b) provably prune the
    disjoint files at the metadata layer."""
    path = _collated_table(
        spark,
        tmp_path,
        [["apple", "avocado"], ["BANANA", "Banana"], ["cherry", "plum"]],
    )
    got = sorted(
        r["s"]
        for r in DL.read_snapshot(
            spark, path, predicate="s = 'banana'"
        ).collect()
    )
    assert got == ["BANANA", "Banana"]
    # metadata-layer proof: the pruner keeps exactly one file
    meta = DL.latest_metadata(spark, path)
    files = DL.snapshot_files(spark, path)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    kept = prune_files(
        files,
        "s = 'banana'",
        schema,
        collations=DL.collations_of(meta),
    )
    assert len(files) == 3 and len(kept) == 1


def test_end_to_end_icu_still_full_scans_correctly(spark, tmp_path):
    path = _collated_table(
        spark,
        tmp_path,
        [["Apricot", "apple"], ["BANANA", "Banana"]],
        ident="ICU.UNICODE_CI",
    )
    got = sorted(
        r["s"]
        for r in DL.read_snapshot(
            spark, path, predicate="s = 'banana'"
        ).collect()
    )
    assert got == ["BANANA", "Banana"]
