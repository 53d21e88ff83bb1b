"""Round-8 cross-engine-deterministic SimHash (md5-derived token
bits).  The oracle-side twin lives in the ``dedup_simhash_md5`` query
(DuckDB re-derives every signature via md5_number_lower); these tests
pin the operator's algebra on tiny controlled corpora.
"""

import hashlib

from mirror_lake_kusto_spark.operators import dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_pair_at_hamming_zero(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    out = dedup.simhash_md5_pairs(
        _df(spark, [(1, base), (2, base), (3, "entirely different words")]),
        "doc_id",
        "text",
        max_hamming=0,
    ).collect()
    assert [(r.id1, r.id2, r.hamming) for r in out] == [(1, 2, 0)]


def test_near_dup_found_distinct_not(spark):
    base = [f"tok{i}" for i in range(60)]
    mutated = base[:-1] + ["changed"]
    out = dedup.simhash_md5_pairs(
        _df(
            spark,
            [
                (1, " ".join(base)),
                (2, " ".join(mutated)),
                (3, " ".join(f"other{i}" for i in range(60))),
            ],
        ),
        "doc_id",
        "text",
        max_hamming=6,
    ).collect()
    pairs = {(r.id1, r.id2) for r in out}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_token_bits_match_md5_reference(spark):
    """The operator's per-token 64 bits must equal the lower 8 digest
    bytes little-endian (DuckDB's md5_number_lower) — the contract the
    oracle depends on.  One-token docs make the signature the token
    hash itself (a +1 sum per set bit, -1 per clear bit; >=0 -> 1)."""
    tok = "hello"
    ref = int.from_bytes(
        hashlib.md5(tok.encode()).digest()[8:16], "little"
    )
    out = dedup.simhash_md5_pairs(
        _df(spark, [(1, tok), (2, tok)]), "doc_id", "text", max_hamming=0
    )
    row = out.collect()[0]
    assert (row.id1, row.id2, row.hamming) == (1, 2, 0)
    # reconstruct doc 1's signature via the operator's internals: a
    # single token means bit i of the signature == bit i of the hash
    from pyspark.sql import functions as F

    h = (
        _df(spark, [(1, tok)])
        .select(F.md5(F.col("text")).alias("h"))
        .collect()[0]
        .h
    )
    got = int.from_bytes(bytes.fromhex(h)[8:16], "little")
    assert got == ref


def test_all_jvm_side_plan(spark):
    """No Python execution in the plan — the whole operator is
    expressions + joins (the 100 TB hot-path requirement)."""
    df = dedup.simhash_md5_pairs(
        _df(spark, [(1, "a b c"), (2, "a b d")]), "doc_id", "text"
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan
