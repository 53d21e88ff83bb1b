"""Deduplication operators for LLM training-data pipelines.

Four families, all pure DataFrame programs designed for 100 TB:

- exact:    group on a 256-bit content hash; only the hash + doc id
            shuffle, never the payload.
- n-gram Jaccard (exact): inverted-index self-join on shingles — the
            shuffle is (shingle, id) pairs, quadratic only within a
            shingle's posting list, never a global cross join.
- MinHash + LSH: fixed seeded affine permutations over xxhash64
            shingle hashes; band signatures bucket-join candidates,
            which are then exact-verified.  Linear shuffle volume.
            (Broder 1997 min-wise resemblance; banding analysis per
            Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3.)
- SimHash:  64-bit signature; banded equi-join finds hamming<=k
            candidates without a cross join (Charikar 2002 similarity
            estimation; Manku et al. 2007 near-dup detection).

The reference has no dedup beyond arg_max last-writer-wins
(Kusto/DatabaseGateway.cs:93); these extend that surface per the
north-star contract (BASELINE.json).

Performance note (measured, not guessed): tokenize -> shingle -> hash
-> signature MUST be materialized as separate projections.  Inlining
them into one expression tree makes Catalyst re-evaluate the whole
chain once per signature lane (codegen subexpression elimination does
not cross higher-order-function lambda boundaries) — a 64-lane MinHash
then tokenizes every document ~200x.  Multi-referenced non-trivial
aliases block the CollapseProject rule, so each stage below is computed
exactly once per row.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.storagelevel import StorageLevel

# 31-bit Mersenne prime: affine perms stay in 62 bits -> no ANSI overflow.
_MERSENNE_P = (1 << 31) - 1

# Fixed seeds -> deterministic signatures across runs/engines.
_MINHASH_A = [(i * 2654435761 + 1) % _MERSENNE_P for i in range(1, 65)]
_MINHASH_B = [(i * 40503 + 7) % _MERSENNE_P for i in range(1, 65)]


def content_hash(col: Column | str) -> Column:
    """256-bit content hash for exact dedup grouping."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest id per exact content group.

    Groups on sha2(text) so the shuffle key is 32 bytes regardless of
    document size; the representative text rides along as an aggregate
    (all values within a group are identical by construction).
    """
    return (
        df.withColumn("_h", content_hash(text_col))
        .groupBy("_h")
        .agg(
            F.min(id_col).alias(id_col),
            F.first(text_col).alias(text_col),
            F.count("*").alias("n_copies"),
        )
        .drop("_h")
    )


def _shingles_from_tokens(toks_col: str, n: int) -> Column:
    """Distinct word n-grams from a materialized token-array column.
    Texts shorter than n words yield an empty array (sequence(0, -1)
    would count DOWN, so the short case is guarded explicitly).

    Gram construction is array_join(slice(toks, i+1, n)) — ONE slice
    per gram.  The per-element shape (n element_at calls + concat_ws
    inside the transform lambda) runs interpreted per reference and
    measured 4.4x slower at n=5; slice+join does the same work in one
    evaluator call (split() never yields nulls, and both forms skip
    nulls identically anyway)."""
    toks = F.col(toks_col)
    cnt = F.size(toks) - (n - 1)
    return F.when(
        cnt > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), cnt - 1),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column, as a single
    expression (JVM-side only).  Prefer _shingled() inside operators —
    it stages tokenization into its own projection (see module note)."""
    toks = F.split(F.col(text_col), " ")
    cnt = F.size(toks) - (n - 1)
    return F.when(
        cnt > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), cnt - 1),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism when the scan
    under-parallelizes (a small corpus in one parquet file would
    otherwise hash/shingle serially on one core).  A well-partitioned
    100 TB input passes through untouched — no shuffle is added."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, sh) with tokenize and shingle as separate projections."""
    return _spread(df).select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_toks")
    ).select("id", _shingles_from_tokens("_toks", n).alias("sh"))


def minhash_signature(text_col: str, n: int = 3, k: int = 64) -> Column:
    """k-wide MinHash signature over word-n-gram shingles, as a single
    column expression: sig[i] = min over shingles of
    (a_i * xxhash64(shingle) + b_i) mod p.

    One ``transform`` over the lane indices with the seed vectors as
    array literals — the shingle hashes are referenced once, so this
    composes with a materialized hash column without re-evaluation.
    """
    base = F.transform(
        word_shingles(text_col, n), lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P))
    )
    return _sig_from_hashes(base, k)


def _sig_from_hashes(hashes: Column, k: int) -> Column:
    a_vec = F.array(*[F.lit(a) for a in _MINHASH_A[:k]])
    b_vec = F.array(*[F.lit(b) for b in _MINHASH_B[:k]])
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                hashes,
                lambda h: F.pmod(
                    F.element_at(a_vec, i + 1) * h + F.element_at(b_vec, i + 1),
                    F.lit(_MERSENNE_P),
                ),
            )
        ),
    )


@functools.lru_cache(maxsize=8)
def _sig_udf(k: int):
    """numpy twin of ``_sig_from_hashes`` — IDENTICAL math ((a*h+b) mod
    p, min over shingles; all values < 2^62, no int64 overflow), Arrow-
    batched.  Nested higher-order-function lambdas run interpreted in
    Catalyst (no codegen across lambda boundaries), so the k x |sh|
    affine sweep is ~5x cheaper as one vectorized matrix op per doc;
    ``test_minhash_sig_udf_matches_expression`` pins the equivalence.
    Empty shingle sets yield all-null lanes, exactly like array_min
    over an empty array."""
    A = np.asarray(_MINHASH_A[:k], dtype=np.int64)[:, None]
    B = np.asarray(_MINHASH_B[:k], dtype=np.int64)[:, None]

    @F.pandas_udf("array<long>")
    def sig(hsh: pd.Series) -> pd.Series:
        out = []
        none_sig = [None] * k
        for arr in hsh:
            if arr is None or len(arr) == 0:
                out.append(none_sig)
                continue
            h = np.asarray(arr, dtype=np.int64)[None, :]
            out.append(((A * h + B) % _MERSENNE_P).min(axis=1).tolist())
        return pd.Series(out)

    return sig


def _pairs_from_groups(
    grouped: DataFrame,
    star_over: int | None = None,
    drop_over: int | None = None,
) -> DataFrame:
    """(id1 < id2) pairs from a frame holding a SORTED member-id array
    column ``ids`` per group — the shared candidate-generation shape of
    every inverted-index dedup here (LSH buckets, shingle posting
    lists).  Pairs are emitted by a JVM array expression, no self-join,
    no window:

    - groups wider than ``star_over`` switch from all-pairs to a STAR
      on the minimum id (adversarial near-dup clusters stay O(width));
    - groups wider than ``drop_over`` are dropped entirely (stopword-
      frequency posting lists excluded from candidate generation).

    An explicit repartition spreads the group arrays first — AQE
    otherwise coalesces the small aggregate to 1-2 partitions and
    serializes the quadratic expansion."""
    if drop_over is not None:
        grouped = grouped.filter(F.size("ids") <= drop_over)
    grouped = grouped.repartition(
        grouped.sparkSession.sparkContext.defaultParallelism
    )
    ids = F.col("ids")
    all_pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    if star_over is not None:
        star = F.transform(
            F.slice(ids, 2, F.size(ids)),
            lambda y: F.struct(
                F.element_at(ids, 1).alias("id1"), y.alias("id2")
            ),
        )
        pair_expr = F.when(F.size(ids) <= star_over, all_pairs).otherwise(star)
    else:
        pair_expr = all_pairs
    return grouped.select(F.explode(pair_expr).alias("p")).select(
        "p.id1", "p.id2"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    k: int = 64,
    bands: int = 32,
    max_bucket_width: int | None = None,
    eager_index: bool = True,
) -> DataFrame:
    """MinHash LSH candidate generation + exact Jaccard verification.

    bands x rows = k; a pair is a candidate if any band of the
    signature collides (bucket equi-join — linear shuffle).  Candidates
    are then exact-verified so the output contains no false positives;
    with 32 bands of 2 rows, recall at J>=0.5 is 1-(1-0.25)^32 ~ 0.9999.

    ``max_bucket_width`` bounds the quadratic term under adversarial
    skew: a cluster of near-identical documents collides in EVERY band,
    making one bucket O(cluster^2).  Buckets wider than the cap switch
    from all-pairs to a STAR pattern — every member pairs with the
    bucket's minimum id only — so candidate volume per bucket is
    O(width) while every member of a pathological near-dup cluster is
    still verified against the cluster representative.  Buckets at or
    under the cap are unaffected (exact all-pairs).

    The (id, shingles, signature) frame is persisted (memory-and-disk):
    it feeds the bucket join AND both sides of the verification join,
    and signatures are exactly the thing LSH precomputes once at scale.
    """
    if bands <= 0 or k % bands:
        raise ValueError(
            f"bands ({bands}) must divide k ({k}) — otherwise band "
            "hashes are built from empty/truncated signature slices "
            "and every document collides in every band"
        )
    rows = k // bands
    # verification runs on the RAW xxhash64 shingle sets, not the
    # strings: |A∩B| and |A∪B| are identical under a collision-free
    # hash, and int64 arrays are ~4x cheaper to persist and shuffle
    # than the string shingles (collisions at corpus scale: ~n²/2⁶⁴ —
    # the mod-p reduction is applied ONLY inside the signature math,
    # where the 2³¹ space would otherwise inflate intersections).
    # Documents with no shingles (shorter than n words) are dropped:
    # they have no content to near-dup against, and their all-null
    # signatures would otherwise collide in every band.
    sh = (
        _shingled(df, id_col, text_col, n)
        .filter(F.size("sh") > 0)
        .select(
            "id",
            F.array_sort(
                F.transform("sh", lambda s: F.xxhash64(s))
            ).alias("hsh"),
        )
        .select(
            "id",
            "hsh",
            _sig_udf(k)(
                F.transform(
                    "hsh", lambda h: F.pmod(h, F.lit(_MERSENNE_P))
                )
            ).alias("sig"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # eager_index (DEFAULT) materializes the signature frame up front.
    # `sh` has three consumers (the bucket build and both sides of the
    # verification join) — independent stages the scheduler runs
    # CONCURRENTLY, and a cold persist gives no cross-stage locking:
    # concurrent stages each recompute the uncached partitions
    # (shingle -> minhash), measured as erratic 2-10x swings at sf0.1.
    # One deterministic materialization costs ~0.3 s standalone and
    # makes every composition stable; eager_index=False exists only
    # for callers that consume the pair stream exactly once and
    # tolerate the variance.
    if eager_index:
        sh.count()
    band_cols = [
        F.hash(F.slice("sig", i * rows + 1, rows), F.lit(i)).alias("band_hash")
        for i in range(bands)
    ]
    buckets = sh.select(
        "id",
        F.posexplode(F.array(*[F.struct(c.alias("h")) for c in band_cols])).alias(
            "band", "bh"
        ),
    ).select("id", "band", F.col("bh.h").alias("band_hash"))
    # ONE aggregation per (band, bucket): collect the sorted member-id
    # array, then generate candidate pairs as a JVM array expression —
    # no window pass, no bucket self-join.  The shuffle is the same
    # (band_hash, id) volume the join shape moved, but pairs within a
    # bucket are emitted by a single task from an in-memory array,
    # which is exactly the bucket-local quadratic the LSH cap bounds.
    grouped = buckets.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    cand = _pairs_from_groups(grouped, star_over=max_bucket_width).distinct()
    s1 = sh.select(F.col("id").alias("id1"), F.col("hsh").alias("hs1"))
    s2 = sh.select(F.col("id").alias("id2"), F.col("hsh").alias("hs2"))
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("hs1", "hs2"))
                / F.size(F.array_union("hs1", "hs2")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    max_doc_frequency: int | None = None,
) -> DataFrame:
    """Jaccard-similar pairs via an inverted index.

    explode(shingles) -> ONE groupBy per shingle collecting the sorted
    member-id array -> pairs emitted as a JVM array expression
    (``_pairs_from_groups``; no posting-list self-join) -> per-pair
    shared-shingle count -> join set sizes -> filter.  At scale the
    only quadratic term is within a single shingle's posting list.

    ``max_doc_frequency`` caps that term: shingles appearing in more
    than the cap's documents (stopword-like / boilerplate shingles) are
    excluded from CANDIDATE GENERATION, and surviving candidate pairs
    are verified with their FULL shingle sets — so every returned
    jaccard value is exact.  A pair is only missed if every shingle it
    shares is hot; near-dups virtually always share rare shingles.
    With the cap unset the classic fully-exact counting path runs
    (pair multiplicity per shared shingle IS the intersection size).
    """
    # sh feeds the posting index, both size sides, and both verify
    # sides — persist + materialize ONCE (the deterministic-eager
    # lesson from the LSH path)
    sh = (
        _shingled(df, id_col, text_col, n)
        .withColumn("sh_size", F.size("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sh.count()
    posting = sh.select("id", F.explode("sh").alias("shingle"))
    grouped = posting.groupBy("shingle").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    if max_doc_frequency is None:
        sizes = sh.select("id", "sh_size")
        inter = (
            _pairs_from_groups(grouped)
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("n_common"))
        )
        s1 = sizes.select(F.col("id").alias("id1"), F.col("sh_size").alias("size1"))
        s2 = sizes.select(F.col("id").alias("id2"), F.col("sh_size").alias("size2"))
        return (
            inter.join(s1, "id1")
            .join(s2, "id2")
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_common")
                    / (F.col("size1") + F.col("size2") - F.col("n_common")),
                    4,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id1", "id2", "jaccard")
        )
    # Candidate generation over the RARE posting lists, with the pair
    # MULTIPLICITY kept: m = exact count of shared rare shingles.  A
    # pair's true intersection is at most m + min(h1, h2) where h_i is
    # doc i's count of HOT (over-cap) shingles, so
    #     jaccard <= (m + min(h)) / (s1 + s2 - m - min(h))
    # and pairs whose upper bound misses the threshold are pruned
    # WITHOUT touching their shingle arrays.  The expensive exact
    # verification (array intersect/union over full shingle sets) then
    # runs only on plausible pairs — on boilerplate-free corpora the
    # bound is exact (h=0) and the verify set ~equals the answer.
    m = (
        _pairs_from_groups(grouped, drop_over=max_doc_frequency)
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("m"))
    )
    hot_per_doc = (
        grouped.filter(F.size("ids") > max_doc_frequency)
        .select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("h"))
    )
    sizes = sh.select("id", "sh_size")
    side = lambda tag: (  # noqa: E731
        sizes.join(hot_per_doc, "id", "left")
        .select(
            F.col("id").alias(f"id{tag}"),
            F.col("sh_size").alias(f"size{tag}"),
            F.coalesce("h", F.lit(0)).alias(f"h{tag}"),
        )
    )
    bound = F.col("m") + F.least("h1", "h2")
    # relaxed by the final filter's round-to-4 half-width: a pair with
    # true jaccard in [threshold - 5e-5, threshold) rounds INTO the
    # threshold downstream, so the exact-bound prune must not drop it
    cand = (
        m.join(side(1), "id1")
        .join(side(2), "id2")
        .filter(
            bound / (F.col("size1") + F.col("size2") - bound)
            >= threshold - 0.00005
        )
        .select("id1", "id2")
    )
    hashed = sh.select(
        "id",
        # RAW 64-bit hashes: the mod-p space (2³¹) would produce ~|A||B|/2³¹
        # spurious intersections on large shingle sets, breaking the
        # "exact jaccard" contract near the threshold
        F.array_sort(F.transform("sh", lambda s: F.xxhash64(s))).alias(
            "hsh"
        ),
    )
    v1 = hashed.select(F.col("id").alias("id1"), F.col("hsh").alias("hs1"))
    v2 = hashed.select(F.col("id").alias("id2"), F.col("hsh").alias("hs2"))
    return (
        cand.join(v1, "id1")
        .join(v2, "id2")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("hs1", "hs2"))
                / F.size(F.array_union("hs1", "hs2")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def simhash64(text_col: str) -> Column:
    """64-bit SimHash over word hashes: sum per-bit +/-1 contributions
    of each token's xxhash64, take the sign bit-vector.  Single-column
    form; simhash_pairs stages the token hashing separately.
    """
    hashes = F.transform(
        F.array_distinct(F.split(F.col(text_col), " ")), lambda t: F.xxhash64(t)
    )
    return _simhash_from_hashes(hashes)


def _simhash_from_hashes(hashes: Column) -> Column:
    bits = [
        F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    out = F.lit(0).cast("long")
    for i, bit in enumerate(bits):
        out = out + F.shiftleft(bit, i)
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Banded LSH on 16-bit slices of the signature: any pair within
    hamming k < bands must share at least one exact band (pigeonhole),
    so the equi-join on (band, slice) finds all candidates when
    max_hamming < bands ... for max_hamming >= bands this is a
    high-recall heuristic; candidates are exact-verified via
    bit_count(xor).
    """
    width = 64 // bands
    sigs = (
        _spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("_toks"),
        )
        .select(
            "id", F.transform("_toks", lambda t: F.xxhash64(t)).alias("_th")
        )
        .select("id", _simhash_from_hashes(F.col("_th")).alias("sig"))
    )
    slices = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("sig", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("slice"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "sig", "b.band", "b.slice")
    a = slices.alias("a")
    b = slices.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def cluster_components(
    pairs: DataFrame,
    id_a: str = "id1",
    id_b: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    ``(id, cluster_id)`` where ``cluster_id`` is the smallest id
    reachable through the pairs — the canonical representative every
    fuzzy-dedup pipeline needs after pair generation (keep one doc per
    cluster, drop the rest).

    Min-label propagation with ADAPTIVE pointer jumping: each round
    takes the per-node minimum of own and neighbor labels over the
    edge list; from round 3 on, a shortcut ``label <- label[label]``
    (one self-join on the label id) is added, halving the remaining
    distance to the component minimum per round.  Dedup graphs are
    overwhelmingly tiny cliques (diameter 1-2, converge in 2 rounds —
    measured: the unconditional jump doubled round cost for nothing),
    but a long near-dup CHAIN (boilerplate drift across a crawl) still
    converges in O(log diameter) rounds once jumping engages.  Every
    round is pure joins over the PAIRS (never the corpus), shuffling
    O(edges).  The loop stops as soon as an iteration changes nothing
    and fails loudly past ``max_iter`` rather than returning a
    half-converged labeling.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .persist()
    )
    # Eager: the union reads `pairs` twice and every round reads
    # `edges`; a lazy persist lets the first round's stages recompute
    # the whole upstream (LSH chain) concurrently — materialize ONCE,
    # deterministically, before iterating.
    edges.count()
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    try:
        for it in range(max_iter):
            nbr = (
                edges.join(labels, edges.b == labels.id)
                .groupBy("a")
                .agg(F.min("label").alias("nbr_label"))
            )
            stepped = labels.join(nbr, labels.id == nbr.a, "left").select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            if it >= 2:
                # still unconverged after 2 rounds -> a deep component;
                # engage pointer jumping (label <- label[label]; labels
                # are node ids, so the lookup is one self-join)
                jump = stepped.select(
                    F.col("id").alias("label"), F.col("label").alias("_jump")
                )
                stepped = stepped.join(jump, "label", "left").select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce("_jump", "label")
                    ).alias("label"),
                )
            new_labels = stepped.persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                # localCheckpoint materializes the result and cuts the
                # iterative lineage, so the working persist can be
                # RELEASED here — otherwise every call leaks one cached
                # frame into executor storage for the session lifetime
                out = labels.select(
                    "id", F.col("label").alias("cluster_id")
                ).localCheckpoint(eager=True)
                return out
        raise RuntimeError(
            f"cluster_components did not converge in {max_iter} iterations"
        )
    finally:
        edges.unpersist()
        labels.unpersist()
