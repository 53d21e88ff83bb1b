"""Data skipping: per-file min/max stats written by the sink, consumed
by stats-based file pruning in read_snapshot (sources/skipping.py).

The reference's analogue is Kusto's extent min/max index consulted
before touching extents; on the Delta side this is the protocol's
per-file ``stats`` JSON (the reference parses its numRecords at
TransactionLogEntry.cs:345-361).  Correctness contract: pruning is
strictly advisory — to_df(predicate=p) ≡ to_df().filter(p) always.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from mirror_lake_kusto_spark.sources.skipping import (
    parse_conjuncts,
    prune_files,
    split_conjuncts,
)


def _sink_with_ranges(spark, tmp_path, name, n_batches=8, rows=100):
    """One add-file per batch, batch b holding ids [b*rows, (b+1)*rows)."""
    sink = DeltaSink(spark, str(tmp_path / name))
    for b in range(n_batches):
        df = spark.range(b * rows, (b + 1) * rows).toDF("id").coalesce(1)
        sink.append(df)
    return sink


# -- write side: stats recorded on add actions ------------------------------


def test_sink_records_minmax_stats(spark, tmp_path):
    sink = _sink_with_ranges(spark, tmp_path, "stats", n_batches=3)
    files = DL.snapshot_files(spark, sink.path)
    assert len(files) == 3
    for f in files:
        st = json.loads(f["stats"])
        assert st["numRecords"] == 100
        assert st["maxValues"]["id"] - st["minValues"]["id"] == 99
        assert st["nullCount"]["id"] == 0


def test_stats_survive_checkpoint(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "ckpt"), checkpoint_interval=5)
    for b in range(7):
        sink.append(spark.range(b * 10, b * 10 + 10).toDF("id").coalesce(1))
    assert DL.read_last_checkpoint(sink.path) is not None
    files = DL.snapshot_files(spark, sink.path)
    assert len(files) == 7
    assert all(
        "minValues" in json.loads(f["stats"]) for f in files
    ), "checkpoint reconciliation must preserve full stats, not just numRecords"


# -- read side: predicate -> fewer files opened, identical rows -------------


def test_predicate_prunes_files_and_matches_filter(spark, tmp_path):
    sink = _sink_with_ranges(spark, tmp_path, "prune")
    pred = "id >= 250 AND id < 320"
    pruned = sink.to_df(predicate=pred)
    plain = sink.to_df().filter(pred)
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in plain.collect()
    )
    # only the two files covering [200,300) and [300,400) survive pruning
    assert len(pruned.inputFiles()) == 2
    assert len(plain.inputFiles()) == 8


def test_predicate_prunes_to_empty(spark, tmp_path):
    sink = _sink_with_ranges(spark, tmp_path, "empty", n_batches=2)
    out = sink.to_df(predicate="id > 100000")
    assert out.count() == 0
    assert out.columns  # schema preserved on the all-pruned path


def test_unparseable_predicate_is_safe(spark, tmp_path):
    sink = _sink_with_ranges(spark, tmp_path, "safe", n_batches=3)
    pred = "id % 97 = 3"  # expression conjunct — parser must not prune
    out = sink.to_df(predicate=pred)
    assert len(out.inputFiles()) == 3
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in sink.to_df().filter(pred).collect()
    )


def test_mixed_partition_and_stats_pruning(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "mix"), partition_by=["g"])
    df = spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(100)], "id long, g string"
    )
    sink.append(df.repartition(2, "g"))
    # partition conjunct on g + stats conjunct on id, through one predicate
    out = sink.to_df(predicate="g = 'b' AND id >= 90")
    assert sorted(r["id"] for r in out.collect()) == list(range(90, 100))
    assert len(out.inputFiles()) == 1


# -- parser unit coverage ----------------------------------------------------


def test_split_conjuncts_respects_quotes_and_parens():
    assert split_conjuncts("a = 'x AND y' AND (b > 1 AND c < 2) AND d IS NULL") == [
        "a = 'x AND y'",
        "(b > 1 AND c < 2)",
        "d IS NULL",
    ]


@pytest.mark.parametrize(
    "pred,kept_ids",
    [
        ("v = 5", [0]),
        ("v != 5", [0, 1]),  # only a constant file v=[7,7] could be pruned
        ("v < 5", [0]),
        ("v <= 10", [0, 1]),
        ("v > 10", [1]),
        ("v >= 11", [1]),
        ("5 < v", [0, 1]),
        ("v IN (3, 12)", [0, 1]),
        ("v IN (100)", []),
        ("v IS NULL", [1]),
        ("v IS NOT NULL", [0, 1]),
        ("lower(v) = 'x'", [0, 1]),  # non-literal — never prunes
    ],
)
def test_prune_files_interval_logic(pred, kept_ids):
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("v", LongType())])
    files = [
        {
            "path": "f0",
            "partitionValues": {},
            "stats": json.dumps(
                {"numRecords": 10, "minValues": {"v": 0}, "maxValues": {"v": 9},
                 "nullCount": {"v": 0}}
            ),
        },
        {
            "path": "f1",
            "partitionValues": {},
            "stats": json.dumps(
                {"numRecords": 10, "minValues": {"v": 10}, "maxValues": {"v": 19},
                 "nullCount": {"v": 3}}
            ),
        },
    ]
    kept = prune_files(files, pred, schema)
    assert [f["path"] for f in kept] == [f"f{i}" for i in kept_ids]


def test_file_without_stats_always_kept():
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("v", LongType())])
    files = [{"path": "f0", "partitionValues": {}, "stats": None}]
    assert prune_files(files, "v = 123456", schema) == files


def test_timestamp_stats_pruning(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "ts"))
    base = dt.datetime(2024, 1, 1)
    for day in (0, 10):
        df = spark.createDataFrame(
            [(i, base + dt.timedelta(days=day, hours=i)) for i in range(4)],
            "id long, ts timestamp",
        ).coalesce(1)
        sink.append(df)
    out = sink.to_df(predicate="ts >= '2024-01-11 00:00:00'")
    assert len(out.inputFiles()) == 1
    assert out.count() == 4


# -- z-order clustering ------------------------------------------------------


def test_zorder_makes_multicolumn_skipping_selective(spark, tmp_path):
    """Random (x, y) points arrive in arrival order, so every file spans
    the whole domain of both columns and nothing can be pruned.  After
    OPTIMIZE ZORDER BY (x, y), a selective predicate on EITHER column
    opens only a corner of the files."""
    import random

    rnd = random.Random(42)
    sink = DeltaSink(spark, str(tmp_path / "z"))
    for _ in range(4):
        rows = [(rnd.randrange(1000), rnd.randrange(1000)) for _ in range(2000)]
        sink.append(
            spark.createDataFrame(rows, "x long, y long").coalesce(1)
        )
    pred = "x < 100 AND y < 100"
    before = sink.to_df(predicate=pred)
    assert len(before.inputFiles()) == 4  # unclustered: nothing prunable
    expected = sorted((r["x"], r["y"]) for r in before.collect())

    sink.optimize(target_file_bytes=8 << 10, zorder_by=["x", "y"])
    after = sink.to_df(predicate=pred)
    total = len(sink.to_df().inputFiles())
    assert total >= 4
    assert len(after.inputFiles()) < total / 2
    assert sorted((r["x"], r["y"]) for r in after.collect()) == expected
    # single-column predicates prune too (the point of z vs linear sort)
    for p in ("x >= 900", "y >= 900"):
        assert len(sink.to_df(predicate=p).inputFiles()) < total


def test_zorder_preserves_rows_and_is_not_datachange(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "znc"))
    for b in range(3):
        sink.append(spark.range(b * 100, b * 100 + 100).toDF("id").coalesce(1))
    v = sink.optimize(zorder_by=["id"])
    assert v >= 0
    assert sorted(r["id"] for r in sink.to_df().collect()) == list(range(300))
    # every action in the optimize commit is dataChange: false
    log = tmp_path / "znc" / "_delta_log" / f"{v:020d}.json"
    acts = [json.loads(line) for line in log.read_text().splitlines() if line.strip()]
    assert acts and all(
        not a[k]["dataChange"] for a in acts for k in ("add", "remove") if k in a
    )


def test_zorder_rejects_partition_and_unknown_columns(spark, tmp_path):
    sink = DeltaSink(spark, str(tmp_path / "zbad"), partition_by=["g"])
    sink.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, g string")
    )
    with pytest.raises(ValueError, match="not data columns"):
        sink.optimize(zorder_by=["g"])
    with pytest.raises(ValueError, match="not data columns"):
        sink.optimize(zorder_by=["nope"])


def test_zorder_string_column(spark, tmp_path):
    import random

    rnd = random.Random(7)
    sink = DeltaSink(spark, str(tmp_path / "zs"))
    words = [f"{c}{i:03d}" for c in "abcdefgh" for i in range(250)]
    rnd.shuffle(words)
    for b in range(4):
        sink.append(
            spark.createDataFrame(
                [(w,) for w in words[b * 500 : (b + 1) * 500]], "w string"
            ).coalesce(1)
        )
    sink.optimize(target_file_bytes=4 << 10, zorder_by=["w"])
    total = len(sink.to_df().inputFiles())
    pruned = sink.to_df(predicate="w >= 'h'")
    assert len(pruned.inputFiles()) < total
    assert pruned.count() == 250


def test_parse_conjuncts_drops_unknown_columns():
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("v", LongType())])
    cs = parse_conjuncts("nope = 1 AND v > 2", schema)
    assert len(cs) == 1 and cs[0].col == "v"


def test_optimize_scoped_by_partition_predicate(spark, tmp_path):
    """OPTIMIZE WHERE: only matching partitions are rewritten."""
    sink = DeltaSink(spark, str(tmp_path / "ow"), partition_by=["g"])
    for b in range(3):
        sink.append(
            spark.createDataFrame(
                [(b * 10 + i, g) for i in range(10) for g in ("a", "b")],
                "id long, g string",
            ).repartition(2, "g")
        )
    before = {f["path"] for f in DL.snapshot_files(spark, sink.path)}
    a_before = {p for p in before if p.startswith("g=a/")}
    b_before = {p for p in before if p.startswith("g=b/")}
    assert len(a_before) == 3 and len(b_before) == 3
    sink.optimize(partition_predicate="g = 'a'")
    after = {f["path"] for f in DL.snapshot_files(spark, sink.path)}
    assert {p for p in after if p.startswith("g=b/")} == b_before  # untouched
    assert len({p for p in after if p.startswith("g=a/")}) == 1    # compacted
    assert sink.to_df().count() == 60


# -- property: pruning never excludes a file holding a matching row ----------


import hypothesis.strategies as st  # noqa: E402
from hypothesis import given, settings  # noqa: E402


def _eval_atom(row, kind, col_val, op, lits):
    if kind == "isnull":
        return col_val is None
    if kind == "notnull":
        return col_val is not None
    if col_val is None:
        return False  # SQL three-valued logic: comparisons with NULL fail
    if kind == "in":
        return col_val in lits
    v = lits[0]
    return {
        "=": col_val == v, "!=": col_val != v,
        "<": col_val < v, "<=": col_val <= v,
        ">": col_val > v, ">=": col_val >= v,
    }[op]


_atom = st.one_of(
    st.tuples(
        st.just("cmp"),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
        st.lists(st.integers(-5, 25), min_size=1, max_size=1),
    ),
    st.tuples(st.just("in"), st.none(), st.lists(st.integers(-5, 25), min_size=1, max_size=4)),
    st.tuples(st.just("isnull"), st.none(), st.just([])),
    st.tuples(st.just("notnull"), st.none(), st.just([])),
)


@settings(max_examples=200, deadline=None)
@given(
    files=st.lists(
        st.lists(st.one_of(st.none(), st.integers(0, 20)), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    ),
    atoms=st.lists(_atom, min_size=1, max_size=3),
)
def test_pruning_never_drops_matching_rows(files, atoms):
    """For ANY data layout and conjunctive predicate: every row that
    satisfies the predicate lives in a file prune_files KEEPS."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("v", LongType())])
    file_dicts = []
    for i, rows in enumerate(files):
        nonnull = [r for r in rows if r is not None]
        stats = {"numRecords": len(rows),
                 "nullCount": {"v": len(rows) - len(nonnull)}}
        if nonnull:
            stats["minValues"] = {"v": min(nonnull)}
            stats["maxValues"] = {"v": max(nonnull)}
        file_dicts.append(
            {"path": f"f{i}", "partitionValues": {}, "stats": json.dumps(stats)}
        )

    parts = []
    for kind, op, lits in atoms:
        if kind == "cmp":
            parts.append(f"v {op} {lits[0]}")
        elif kind == "in":
            parts.append(f"v IN ({', '.join(map(str, lits))})")
        elif kind == "isnull":
            parts.append("v IS NULL")
        else:
            parts.append("v IS NOT NULL")
    predicate = " AND ".join(parts)

    kept = {f["path"] for f in prune_files(file_dicts, predicate, schema)}
    for i, rows in enumerate(files):
        for val in rows:
            if all(_eval_atom(None, k, val, op, lits) for k, op, lits in atoms):
                assert f"f{i}" in kept, (
                    f"file f{i} holds matching value {val!r} for "
                    f"{predicate!r} but was pruned"
                )


# -- regression: predicate misparses that caused silent over-pruning ---------


def _str_files():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("c", StringType()),
            StructField("d", StringType()),
            StructField("b", LongType()),
        ]
    )
    files = [
        {
            "path": "f_az",
            "partitionValues": {},
            "stats": json.dumps(
                {"numRecords": 5, "minValues": {"c": "a", "d": "a", "b": 1},
                 "maxValues": {"c": "c", "d": "c", "b": 5},
                 "nullCount": {"c": 0, "d": 0, "b": 0}}
            ),
        },
        {
            "path": "f_z",
            "partitionValues": {},
            "stats": json.dumps(
                {"numRecords": 5, "minValues": {"c": "x", "d": "x", "b": 10},
                 "maxValues": {"c": "z", "d": "z", "b": 20},
                 "nullCount": {"c": 0, "d": 0, "b": 0}}
            ),
        },
    ]
    return schema, files


def test_or_with_quoted_strings_never_prunes():
    # "c = 'a' OR c = 'z'" once misparsed as the single string literal
    # "a' OR c = 'z" and pruned the file that contains c='z'
    schema, files = _str_files()
    kept = prune_files(files, "c = 'a' OR c = 'z'", schema)
    assert [f["path"] for f in kept] == ["f_az", "f_z"]


def test_toplevel_or_beside_and_never_prunes():
    # b = 1 OR c = 'x' AND b = 20  ==  b = 1 OR (c = 'x' AND b = 20):
    # neither atom is a required conjunct, so nothing may prune
    schema, files = _str_files()
    kept = prune_files(files, "b = 1 OR c = 'x' AND b = 20", schema)
    assert [f["path"] for f in kept] == ["f_az", "f_z"]


def test_column_to_column_comparison_not_a_literal():
    # c = d must not prune as if d were the string 'd'
    schema, files = _str_files()
    kept = prune_files(files, "c = d", schema)
    assert [f["path"] for f in kept] == ["f_az", "f_z"]


def test_unquoted_bareword_is_identifier_not_string_literal():
    # c = zzz: zzz is an identifier (maybe a column we don't know), not 'zzz'
    schema, files = _str_files()
    kept = prune_files(files, "c = zzz", schema)
    assert [f["path"] for f in kept] == ["f_az", "f_z"]


def test_doubled_quote_escape_unescaped():
    schema, files = _str_files()
    # literal is  it's  -> between 'c' and 'x': both files prunable
    kept = prune_files(files, "c = 'it''s'", schema)
    assert kept == []
    # conjunct-splitter must not treat quotes inside '' as openers
    kept = prune_files(files, "c = 'it''s' AND b >= 1", schema)
    assert kept == []


def test_quoted_partition_value_with_quote_char(spark=None):
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("p", StringType())])
    files = [
        {"path": "f0", "partitionValues": {"p": "it's"}, "stats": None},
        {"path": "f1", "partitionValues": {"p": "zzz"}, "stats": None},
    ]
    kept = prune_files(files, "p = 'it''s'", schema, partition_columns=["p"])
    assert [f["path"] for f in kept] == ["f0"]


# -- property: OR / quoted strings / column refs never over-prune ------------

_STR_VALS = ["x", "y", "z", "it's", "a' OR c = 'z"]


def _sql_str(v):
    return "'" + v.replace("'", "''") + "'"


_satom = st.one_of(
    st.tuples(
        st.just("scmp"),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
        st.sampled_from(_STR_VALS),
    ),
    st.tuples(
        st.just("icmp"),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
        st.integers(-2, 12),
    ),
    st.tuples(st.just("colcmp"), st.none(), st.none()),
    st.tuples(st.just("isnull"), st.none(), st.none()),
)


def _eval_satom(row, kind, op, lit):
    a, c = row["a"], row["c"]
    if kind == "isnull":
        return a is None
    if kind == "colcmp":
        return a is not None and c is not None and a == c
    if kind == "scmp":
        if a is None:
            return False
        return {
            "=": a == lit, "!=": a != lit, "<": a < lit,
            "<=": a <= lit, ">": a > lit, ">=": a >= lit,
        }[op]
    b = row["b"]
    if b is None:
        return False
    return {
        "=": b == lit, "!=": b != lit, "<": b < lit,
        "<=": b <= lit, ">": b > lit, ">=": b >= lit,
    }[op]


def _satom_sql(kind, op, lit):
    if kind == "isnull":
        return "a IS NULL"
    if kind == "colcmp":
        return "a = c"
    if kind == "scmp":
        return f"a {op} {_sql_str(lit)}"
    return f"b {op} {lit}"


@settings(max_examples=200, deadline=None)
@given(
    files=st.lists(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.sampled_from(_STR_VALS)),
                st.one_of(st.none(), st.sampled_from(_STR_VALS)),
                st.one_of(st.none(), st.integers(0, 10)),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    ),
    groups=st.lists(  # OR of AND-groups; each group: AND of clauses;
        st.lists(     # each clause: one atom or a parenthesized OR pair
            st.lists(_satom, min_size=1, max_size=2),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=2,
    ),
)
def test_pruning_never_drops_matching_rows_strings_and_or(files, groups):
    """OR-of-AND predicates with quoted strings (incl. embedded quotes),
    column-to-column atoms, and parenthesized inner ORs: every row that
    satisfies the predicate lives in a kept file."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("a", StringType()),
            StructField("c", StringType()),
            StructField("b", LongType()),
        ]
    )
    file_dicts = []
    for i, rows in enumerate(files):
        stats = {"numRecords": len(rows), "minValues": {}, "maxValues": {},
                 "nullCount": {}}
        for col, idx in (("a", 0), ("c", 1), ("b", 2)):
            vals = [r[idx] for r in rows if r[idx] is not None]
            stats["nullCount"][col] = len(rows) - len(vals)
            if vals:
                stats["minValues"][col] = min(vals)
                stats["maxValues"][col] = max(vals)
        file_dicts.append(
            {"path": f"f{i}", "partitionValues": {}, "stats": json.dumps(stats)}
        )

    group_sqls = []
    for group in groups:
        clause_sqls = []
        for clause in group:
            atom_sqls = [_satom_sql(*atom) for atom in clause]
            clause_sqls.append(
                atom_sqls[0] if len(atom_sqls) == 1
                else "(" + " OR ".join(atom_sqls) + ")"
            )
        group_sqls.append(" AND ".join(clause_sqls))
    predicate = " OR ".join(group_sqls)

    def truth(row):
        return any(
            all(
                any(_eval_satom(row, *atom) for atom in clause)
                for clause in group
            )
            for group in groups
        )

    kept = {f["path"] for f in prune_files(file_dicts, predicate, schema)}
    for i, rows in enumerate(files):
        for tup in rows:
            row = {"a": tup[0], "c": tup[1], "b": tup[2]}
            if truth(row):
                assert f"f{i}" in kept, (
                    f"file f{i} holds matching row {row!r} for "
                    f"{predicate!r} but was pruned"
                )
