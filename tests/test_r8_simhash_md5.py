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


def test_randomized_pairs_match_python_reference(spark):
    """25 seeded random near-dup pairs, disjoint vocabularies: the
    operator's reported hamming must equal a pure-Python md5 SimHash
    reference exactly — pair present iff reference hamming <= 3."""
    import random

    rng = random.Random(80808)

    def py_sig(tokens):
        sums = [0] * 64
        for t in set(tokens):
            h = int.from_bytes(
                hashlib.md5(t.encode()).digest()[8:16], "little"
            )
            for i in range(64):
                sums[i] += 1 if (h >> i) & 1 else -1
        return sum((1 << i) for i in range(64) if sums[i] >= 0)

    rows, expected = [], {}
    for p in range(25):
        vocab = [f"p{p}w{j}" for j in range(rng.randint(30, 80))]
        a = list(vocab)
        b = list(vocab)
        for _ in range(rng.randint(0, 3)):  # 0-3 token mutations
            b[rng.randrange(len(b))] = f"p{p}mut{rng.randrange(1000)}"
        rows.append((2 * p, " ".join(a)))
        rows.append((2 * p + 1, " ".join(b)))
        ham = bin(py_sig(a) ^ py_sig(b)).count("1")
        if ham <= 3:
            expected[(2 * p, 2 * p + 1)] = ham
    out = dedup.simhash_md5_pairs(
        _df(spark, rows), "doc_id", "text", max_hamming=3
    ).collect()
    got = {
        (r.id1, r.id2): r.hamming
        for r in out
        if r.id2 == r.id1 + 1 and r.id1 % 2 == 0
    }
    assert got == expected
    # cross-pair hits (disjoint vocabularies) must exceed hamming 3
    # and therefore never appear
    cross = [r for r in out if (r.id1, r.id2) not in expected]
    assert cross == []
