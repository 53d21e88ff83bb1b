"""KQL pipe-language queries: the reference's emitted dialect run as
STRINGS through functions/kql_parse, oracle-checked against DuckDB SQL.

These prove dialect parity end-to-end: a reference user can paste the
KQL their tooling emits (SURVEY §2's B/D/F rows are all KQL text in the
C# source) and get hash-identical results from this engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions.kql_parse import kql
from ..sources.tables import load_table
from .base import query


def _tables(spark, sf_dir, *names):
    return {n: load_table(spark, n, sf_dir) for n in names}


@query(
    "kql_summarize_pipeline",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP'1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="KQL string: where + datetime literal + extend + summarize by "
    "(B2/B9/D5 as emitted text; DeltaTableOrchestration.cs:234)",
)
def kql_summarize_pipeline(spark, sf_dir):
    return kql(
        spark,
        """
        lineitem
        | where l_shipdate <= datetime(1998-09-02)
        | extend net = l_extendedprice * (1 - l_discount)
        | summarize revenue = round(sum(net), 2), n = count()
            by l_returnflag, l_linestatus
        """,
        tables=_tables(spark, sf_dir, "lineitem"),
    )


@query(
    "kql_term_match_count",
    r"""
    SELECT CAST(COUNT(*) AS BIGINT) AS Count FROM part
    WHERE regexp_matches(p_type, '\bPROMO\b')
    """,
    doc="KQL string: `has` word-boundary term match + count verb "
    "(B6/D1; KustoClusterGateway.cs:73)",
)
def kql_term_match_count(spark, sf_dir):
    return kql(
        spark,
        "part | where p_type has 'PROMO' | count",
        tables=_tables(spark, sf_dir, "part"),
    )


@query(
    "kql_argmax_by_key",
    """
    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS l_quantity,
           l_orderkey
    FROM (
      SELECT l_returnflag, l_quantity, l_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_quantity DESC, l_orderkey DESC, l_linenumber DESC
             ) AS rn
      FROM lineitem) WHERE rn = 1
    """,
    doc="KQL string: summarize arg_max(x, *) by key (D3; "
    "Kusto/DatabaseGateway.cs:93) — deterministic tiebreak on "
    "(l_orderkey, l_linenumber) desc",
)
def kql_argmax_by_key(spark, sf_dir):
    return kql(
        spark,
        """
        lineitem
        | extend rank = l_quantity * 100000000000 + l_orderkey * 10
            + l_linenumber
        | summarize arg_max(rank, *) by l_returnflag
        | project l_returnflag, l_quantity = tolong(l_quantity), l_orderkey
        """,
        tables=_tables(spark, sf_dir, "lineitem"),
    )


@query(
    "kql_join_subquery_topk",
    """
    SELECT o_orderkey, o_orderdate,
           CAST(qty AS BIGINT) AS qty
    FROM orders
    JOIN (SELECT l_orderkey AS o_orderkey, SUM(l_quantity) AS qty
          FROM lineitem GROUP BY l_orderkey) USING (o_orderkey)
    WHERE qty > 250
    """,
    doc="KQL string: join kind=inner with a piped subquery on a shared "
    "key (C3/C4 as emitted text; BlobLoadingOrchestration.cs:96-115)",
)
def kql_join_subquery_topk(spark, sf_dir):
    tables = _tables(spark, sf_dir, "orders", "lineitem")
    return kql(
        spark,
        """
        orders
        | project o_orderkey, o_orderdate
        | join kind=inner (
            lineitem
            | summarize qty = sum(l_quantity) by o_orderkey = l_orderkey
          ) on o_orderkey
        | where qty > 250
        | project o_orderkey, o_orderdate, qty = tolong(qty)
        """,
        tables=tables,
    )


@query(
    "kql_datetime_bin",
    """
    SELECT CAST(to_timestamp(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 21600)
                             * 21600) AS TIMESTAMP) AS slot,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05'
      AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-12'
      AND event_type = 'click'
    GROUP BY slot ORDER BY slot
    """,
    doc="KQL string: datetime bin(ts, 6h) epoch-aligned bucketing + "
    "between range + timespan literals -- the Kusto time-series "
    "idiom (summarize ... by bin(ts, dt)) over the events stream "
    "table",
)
def kql_datetime_bin(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | where ts between (datetime(2024-01-05) .. datetime(2024-01-12))
            and event_type == 'click'
        | summarize n = count(), total = round(sum(value), 2)
            by slot = bin(ts, 6h)
        | order by slot asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_make_series",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(to_timestamp(
               FLOOR((epoch(CAST(ts AS TIMESTAMP))
                      - epoch(TIMESTAMP '2024-01-01')) / 86400) * 86400
               + epoch(TIMESTAMP '2024-01-01')) AS TIMESTAMP) AS slot,
             value
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-11'
    ),
    agg AS (
      SELECT event_type, slot, CAST(COUNT(*) AS BIGINT) AS n FROM ev
      GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT event_type FROM ev),
    slots AS (
      SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-10',
                                    INTERVAL 1 DAY)) AS slot
    )
    SELECT k.event_type,
           to_json(list(strftime(s.slot, '%Y-%m-%d %H:%M:%S')
                        ORDER BY s.slot)) AS ts,
           to_json(list(COALESCE(a.n, 0) ORDER BY s.slot)) AS n
    FROM keys k CROSS JOIN slots s
    LEFT JOIN agg a ON a.event_type = k.event_type AND a.slot = s.slot
    GROUP BY k.event_type ORDER BY k.event_type
    """,
    doc="KQL string: make-series daily counts by event_type — Kusto's "
    "time-chart idiom parsed from the emitted dialect and lowered onto "
    "operators/timeseries.make_series.  Dynamic arrays serialized to "
    "JSON strings (Kusto's own dynamic rendering; keeps the driver "
    "harness's pandas row canonicalizer sortable)",
)
def kql_make_series(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | make-series n = count() default = 0
            on ts from datetime(2024-01-01) to datetime(2024-01-11) step 1d
            by event_type
        | order by event_type asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.select(
        "event_type",
        F.to_json(
            F.transform("ts", lambda x: F.date_format(x, "yyyy-MM-dd HH:mm:ss"))
        ).alias("ts"),
        F.to_json("n").alias("n"),
    )


@query(
    "kql_let_serialize_cumsum",
    """
    WITH daily AS (
      SELECT CAST(to_timestamp(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400)
                               * 86400) AS TIMESTAMP) AS day,
             ROUND(SUM(value), 2) AS daily
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT day, daily,
           ROUND(SUM(daily) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum,
           LAG(daily, 1) OVER (ORDER BY day) AS prev_day
    FROM daily ORDER BY day
    """,
    doc="KQL string: let statements (scalar + tabular) -> serialize -> "
    "row_cumsum/prev over the order-by sort -- Kusto's running-total "
    "idiom on daily purchase revenue",
)
def kql_let_serialize_cumsum(spark, sf_dir):
    return kql(
        spark,
        """
        let kind = 'purchase';
        let purchases = events | where event_type == kind;
        purchases
        | summarize daily = round(sum(value), 2) by day = bin(ts, 1d)
        | order by day asc
        | serialize
        | extend cum = round(row_cumsum(daily), 2), prev_day = prev(daily)
        | project day, daily, cum, prev_day
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_json_props",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    WHERE event_type = 'purchase'
      AND CAST(json_extract(props, '$.k') AS BIGINT) >= 90
    GROUP BY k ORDER BY k
    """,
    doc="KQL string: dynamic JSON property access "
    "(todynamic(props).k -> one try_parse_json + variant_get) with a "
    "case-insensitive predicate and aggregation over the extracted key",
)
def kql_json_props(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | where event_type == 'purchase'
        | extend k = tolong(todynamic(props).k)
        | where k >= 90
        | summarize n = count(), total = round(sum(value), 2) by k
        | order by k asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_range_calendar",
    """
    WITH daily AS (
      SELECT CAST(to_timestamp(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400)
                               * 86400) AS TIMESTAMP) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT day, COALESCE(n, 0) AS n
    FROM (SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                        TIMESTAMP '2024-01-30',
                                        INTERVAL 1 DAY)) AS day)
    LEFT JOIN daily USING (day)
    ORDER BY day
    """,
    doc="KQL string: range-generated calendar axis left-joined with "
    "daily counts (zero-filled gaps) -- the generated-dimension idiom; "
    "also exercises let + leftouter join + coalesce",
)
def kql_range_calendar(spark, sf_dir):
    return kql(
        spark,
        """
        let daily = events
          | where event_type == 'view'
          | summarize n = count() by day = bin(ts, 1d);
        range day from datetime(2024-01-01) to datetime(2024-01-30) step 1d
        | join kind=leftouter (daily) on day
        | project day, n = coalesce(n, CAST(0 AS BIGINT))
        | order by day asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_evaluate_pivot",
    """
    SELECT day, ROUND(click, 2) AS click, ROUND(error, 2) AS error,
           ROUND(purchase, 2) AS purchase, ROUND(signup, 2) AS signup,
           ROUND(view, 2) AS view
    FROM (
      PIVOT (SELECT CAST(to_timestamp(FLOOR(epoch(CAST(ts AS TIMESTAMP))
                                            / 86400) * 86400) AS TIMESTAMP)
                      AS day,
                    event_type, value
             FROM events)
      ON event_type USING SUM(value) GROUP BY day
    ) ORDER BY day
    """,
    doc="KQL string: evaluate pivot(event_type, sum(value)) per day -- "
    "the pivot plugin lowered onto Spark's native groupBy().pivot(); "
    "oracle is DuckDB's PIVOT of the same slice",
)
def kql_evaluate_pivot(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | project day = bin(ts, 1d), event_type, value
        | evaluate pivot(event_type, round(sum(value), 2))
        | order by day asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_lookup_top_nested",
    """
    WITH base AS (
      SELECT c_mktsegment AS seg, o_custkey AS cust,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    lvl0 AS (SELECT seg, SUM(n) AS seg_n FROM base GROUP BY 1),
    top0 AS (
      SELECT seg, seg_n FROM (
        SELECT seg, seg_n,
               DENSE_RANK() OVER (ORDER BY seg_n DESC, seg) AS r
        FROM lvl0) WHERE r <= 3
    ),
    lvl1 AS (
      SELECT b.seg, seg_n, cust, n,
             DENSE_RANK() OVER (PARTITION BY b.seg
                                ORDER BY n DESC, cust) AS r
      FROM base b JOIN top0 USING (seg)
    )
    SELECT seg, CAST(seg_n AS BIGINT) AS aggregated_seg,
           cust, n AS aggregated_cust
    FROM lvl1 WHERE r <= 2 ORDER BY seg, cust
    """,
    doc="KQL string: lookup (broadcast dimension enrichment) feeding "
    "top-nested (hierarchical top-k: 3 segments by order count, top-2 "
    "customers within each) -- ranks run over per-level aggregates, "
    "never the fact rows",
)
def kql_lookup_top_nested(spark, sf_dir):
    return kql(
        spark,
        """
        let ord = orders | project c_custkey = o_custkey;
        ord
        | lookup kind=inner (customer | project c_custkey,
            seg = c_mktsegment) on c_custkey
        | project seg, cust = c_custkey
        | top-nested 3 of seg by aggregated_seg = count(),
          top-nested 2 of cust by aggregated_cust = count()
        | order by seg asc, cust asc
        """,
        tables=_tables(spark, sf_dir, "orders", "customer"),
    )


@query(
    "kql_conditional_aggs",
    """
    SELECT l_linestatus,
           ROUND(SUM(l_extendedprice) FILTER (WHERE l_returnflag = 'A'), 2)
             AS returned_rev,
           ROUND(AVG(l_quantity) FILTER (WHERE l_discount > 0.05), 4)
             AS avg_discounted_qty,
           CAST(COUNT(DISTINCT l_orderkey) FILTER (WHERE l_quantity > 45)
             AS BIGINT) AS big_orders
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    doc="KQL string: sumif/avgif/dcountif conditional aggregates "
    "lowered to SQL FILTER clauses -- one aggregation pass, no "
    "self-joins, JVM-side",
)
def kql_conditional_aggs(spark, sf_dir):
    return kql(
        spark,
        """
        lineitem
        | summarize
            returned_rev = round(sumif(l_extendedprice,
                                       l_returnflag == 'A'), 2),
            avg_discounted_qty = round(avgif(l_quantity,
                                             l_discount > 0.05), 4),
            big_orders = dcountif(l_orderkey, l_quantity > 45)
            by l_linestatus
        | order by l_linestatus asc
        """,
        tables=_tables(spark, sf_dir, "lineitem"),
    )


@query(
    "kql_bag_unpack",
    """
    SELECT event_type,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="KQL string: evaluate bag_unpack(props) turns the JSON bag "
    "into typed columns (schema inferred from a bounded driver "
    "sample, unpacking is JVM-side get_json_object over all rows)",
)
def kql_bag_unpack(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | project event_type, props
        | evaluate bag_unpack(props)
        | summarize max_k = max(k), n = count() by event_type
        | order by event_type asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_parse_extract",
    """
    SELECT s_name,
           CAST(regexp_extract(s_name, '^Supplier#(.*)$', 1) AS BIGINT)
               AS num
    FROM supplier
    WHERE regexp_matches(s_name, '^Supplier#(.*)$')
    """,
    doc="KQL string: parse-where pattern extraction (one compiled "
    "regex, one JVM-side regexp_extract per typed output column)",
)
def kql_parse_extract(spark, sf_dir):
    return kql(
        spark,
        "supplier | parse-where s_name with 'Supplier#' num:long "
        "| project s_name, num",
        tables=_tables(spark, sf_dir, "supplier"),
    )


@query(
    "kql_top_hitters",
    """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS approximate_count_source
    FROM documents
    GROUP BY source
    ORDER BY approximate_count_source DESC, source ASC
    LIMIT 5
    """,
    doc="KQL string: top-hitters heavy-hitter summary (exact groupBy "
    "+ TakeOrdered here; deterministic tie-break on the key)",
)
def kql_top_hitters(spark, sf_dir):
    return kql(
        spark,
        "documents | top-hitters 5 of source",
        tables=_tables(spark, sf_dir, "documents"),
    )


@query(
    "kql_mv_apply",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT t) AS BIGINT) AS d
    FROM toks WHERE length(t) >= 4
    GROUP BY doc_id
    """,
    doc="KQL string: mv-apply per-row subquery (explode once under a "
    "row id, inner summarize grouped by it, join back) — token count "
    "and distinct-count per document over the filtered elements",
)
def kql_mv_apply(spark, sf_dir):
    return kql(
        spark,
        "documents"
        " | extend toks = split(text, ' ')"
        " | mv-apply t = toks on ("
        "     where strlen(t) >= 4"
        "     | summarize n = count(), d = dcount(t) )"
        " | project doc_id, n, d",
        tables=_tables(spark, sf_dir, "documents"),
    )


@query(
    "kql_partition_topk",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey DESC
             ) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    doc="KQL string: partition by key ( per-partition subquery ) — the "
    "Kusto partition operator (legacy strategy, 64-key cap, raises past "
    "it); top-3 orders per priority class, deterministic tiebreak",
)
def kql_partition_topk(spark, sf_dir):
    return kql(
        spark,
        """
        orders
        | partition by o_orderpriority (
            top 3 by o_totalprice desc, o_orderkey desc )
        | project o_orderpriority, o_orderkey, o_totalprice
        """,
        tables=_tables(spark, sf_dir, "orders"),
    )


@query(
    "kql_partition_shuffle",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rn
      FROM orders WHERE o_orderkey <= 30000)
    WHERE rn <= 2
    """,
    doc="KQL partition operator, hint.strategy=shuffle (round 9): "
    "Kusto's shuffle strategy has NO 64-key cap — the subquery lowers "
    "onto ONE hash-partitioned window pass keyed on an internal copy "
    "of the partition column (kql_parse._partition_shuffle), never a "
    "per-key loop of filtered scans.  Top-2 orders per CUSTOMER "
    "(hundreds of keys at every SF — the legacy strategy raises on "
    "this query, pinned in test_kql)",
)
def kql_partition_shuffle(spark, sf_dir):
    return kql(
        spark,
        """
        orders
        | where o_orderkey <= 30000
        | partition hint.strategy=shuffle by o_custkey (
            top 2 by o_totalprice desc, o_orderkey asc )
        | project o_custkey, o_orderkey, o_totalprice
        """,
        tables=_tables(spark, sf_dir, "orders"),
    )


@query(
    "kql_facet_overview",
    """
    SELECT 'o_orderpriority' AS "column", o_orderpriority AS value,
           CAST(COUNT(*) AS BIGINT) AS count_
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'o_orderstatus', o_orderstatus, CAST(COUNT(*) AS BIGINT)
    FROM orders GROUP BY o_orderstatus
    """,
    doc="KQL string: facet by c1, c2 — Kusto emits one value-frequency "
    "table per column; the single-DataFrame rendering stacks them as "
    "(column, value, count_) rows",
)
def kql_facet_overview(spark, sf_dir):
    return kql(
        spark,
        "orders | facet by o_orderpriority, o_orderstatus",
        tables=_tables(spark, sf_dir, "orders"),
    )


@query(
    "kql_scalar_toolkit",
    """
    SELECT p_partkey,
           split_part(p_name, ' ', 2) AS second_word,
           regexp_replace(p_brand, '^(?:Brand#)+', '') AS brand_id,
           lower(to_hex(p_size)) AS size_hex,
           GREATEST(p_size, 25) AS size_floor25,
           POW(2, p_size % 8) AS pow2,
           to_json({brand: p_brand, size: p_size}) AS packed,
           to_base64(encode(p_brand)) AS brand_b64,
           repeat(p_type, 2) AS type_twice,
           translate(p_brand, '#', '-') AS brand_dashed
    FROM part WHERE p_partkey <= 500
    """,
    doc="KQL string: round-3 scalar batch — split (element index), "
    "trim_start (regex), tohex, max_of, pow, pack -> JSON object, "
    "base64_encode_tostring, strrep, translate (KQL arg order)",
)
def kql_scalar_toolkit(spark, sf_dir):
    return kql(
        spark,
        """
        part
        | where p_partkey <= 500
        | project p_partkey,
            second_word = split(p_name, ' ', 1),
            brand_id = trim_start('Brand#', p_brand),
            size_hex = tohex(p_size),
            size_floor25 = max_of(p_size, 25),
            pow2 = pow(2, p_size % 8),
            packed = pack('brand', p_brand, 'size', p_size),
            brand_b64 = base64_encode_tostring(p_brand),
            type_twice = strrep(p_type, 2),
            brand_dashed = translate('#', '-', p_brand)
        """,
        tables=_tables(spark, sf_dir, "part"),
    )


@query(
    "kql_dynamic_toolkit",
    """
    WITH w AS (
      SELECT p_partkey, string_split(p_name, ' ') AS words, p_brand
      FROM part WHERE p_partkey <= 500
    )
    SELECT p_partkey,
           to_json(words[1:2]) AS first_two,
           to_json(list_sort(words, 'DESC')) AS words_desc,
           to_json(list_sort(list_distinct(list_concat(words, [p_brand]))))
             AS with_brand
    FROM w
    """,
    doc="KQL string: dynamic-array batch — split to array, array_slice "
    "(0-based inclusive), array_sort_desc, set_union + pack_array; "
    "arrays serialized to JSON for the harness (sorted where the "
    "dialects' internal orders differ)",
)
def kql_dynamic_toolkit(spark, sf_dir):
    out = kql(
        spark,
        """
        part
        | where p_partkey <= 500
        | extend words = split(p_name, ' ')
        | project p_partkey,
            first_two = array_slice(words, 0, 1),
            words_desc = array_sort_desc(words),
            with_brand = array_sort_asc(set_union(words, pack_array(p_brand)))
        """,
        tables=_tables(spark, sf_dir, "part"),
    )
    return out.select(
        "p_partkey",
        F.to_json("first_two").alias("first_two"),
        F.to_json("words_desc").alias("words_desc"),
        F.to_json("with_brand").alias("with_brand"),
    )


@query(
    "kql_scan_funnel",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    p AS (
      SELECT *,
             MAX(CASE WHEN event_type = 'signup' THEN rn END) OVER
               (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_signup,
             MAX(CASE WHEN event_type = 'purchase' THEN rn END) OVER
               (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_purchase
      FROM e
    ),
    done AS (
      SELECT rn, event_id, user_id, last_signup,
             ROW_NUMBER() OVER (ORDER BY rn) AS mid
      FROM p
      WHERE event_type = 'purchase' AND last_signup IS NOT NULL
        AND (last_purchase IS NULL OR last_signup > last_purchase)
    )
    SELECT d.mid, 'converted' AS step, d.event_id, d.user_id FROM done d
    UNION ALL
    SELECT d.mid, 'started', e.event_id, e.user_id
    FROM done d JOIN e ON e.rn = d.last_signup
    """,
    doc="KQL string: scan operator (restricted condition-only profile) "
    "— greedy-sequential signup->purchase funnel with restart over the "
    "global ts order; the automaton is equivalently expressed in the "
    "oracle via window functions (a completed purchase is one whose "
    "latest preceding signup is later than the latest preceding "
    "purchase; the emitted start row is that latest signup)",
)
def kql_scan_funnel(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | order by ts asc, event_id asc
        | scan with_match_id=mid with (
            step started: event_type == 'signup';
            step converted: event_type == 'purchase'; )
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.select(
        "mid", F.col("_scan_step").alias("step"), "event_id", "user_id"
    )


@query(
    "kql_join_rightanti",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    doc="KQL string: join kind=rightanti (right side minus matched "
    "keys; no native Spark twin — sides swap onto left_anti, output "
    "columns are the right table's, as in Kusto) — customers with no "
    "urgent order",
)
def kql_join_rightanti(spark, sf_dir):
    out = kql(
        spark,
        """
        orders
        | where o_orderpriority == '1-URGENT'
        | project c_custkey = o_custkey
        | join kind=rightanti (customer) on c_custkey
        | project c_custkey, c_name, c_nationkey
        """,
        tables=_tables(spark, sf_dir, "orders", "customer"),
    )
    return out


@query(
    "kql_join_innerunique",
    """
    WITH lk AS (SELECT DISTINCT l_orderkey FROM lineitem)
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice
    FROM lk JOIN orders o ON o.o_orderkey = lk.l_orderkey
    """,
    doc="KQL string: join kind=innerunique (Kusto's DEFAULT kind) — "
    "the LEFT side deduplicates to one row per key before the inner "
    "join.  Left side projected to the key alone so Kusto's "
    "arbitrary-row pick is deterministic here",
)
def kql_join_innerunique(spark, sf_dir):
    return kql(
        spark,
        """
        lineitem
        | project o_orderkey = l_orderkey
        | join kind=innerunique (orders) on o_orderkey
        | project o_orderkey, o_orderpriority, o_totalprice
        """,
        tables=_tables(spark, sf_dir, "lineitem", "orders"),
    )


@query(
    "kql_evaluate_narrow",
    """
    WITH b AS (
      SELECT event_id, user_id, event_type,
             ROW_NUMBER() OVER (ORDER BY event_id) AS "Row"
      FROM events ORDER BY event_id LIMIT 100
    )
    SELECT "Row", 'event_id' AS "Column", CAST(event_id AS VARCHAR) AS "Value"
      FROM b
    UNION ALL
    SELECT "Row", 'user_id', CAST(user_id AS VARCHAR) FROM b
    UNION ALL
    SELECT "Row", 'event_type', event_type FROM b
    """,
    doc="KQL string: evaluate narrow() — unpivot to (Row, Column, "
    "Value) with stringified values; Row numbering requires a "
    "preceding order by (the serialize contract)",
)
def kql_evaluate_narrow(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | project event_id, user_id, event_type
        | order by event_id asc
        | take 100
        | evaluate narrow()
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_invoke_function",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP'1998-09-02'
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC
    """,
    doc="KQL lambda let-function applied with `invoke`: the tabular "
    "first parameter binds the piped frame, scalar args substitute "
    "into the body (one declarative plan — Catalyst sees through the "
    "function boundary).  Kusto user-function idiom, public docs.",
)
def kql_invoke_function(spark, sf_dir):
    return kql(
        spark,
        """
        let revenue_by = (T:(*), maxd:datetime) {
            T
            | where l_shipdate <= maxd
            | extend net = l_extendedprice * (1 - l_discount)
            | summarize revenue = round(sum(net), 2), n = count()
                by l_returnflag
        };
        lineitem
        | invoke revenue_by(datetime(1998-09-02))
        | order by l_returnflag asc
        """,
        tables=_tables(spark, sf_dir, "lineitem"),
    )


@query(
    "kql_top_nested_others",
    """
    WITH per AS (
      SELECT l_returnflag AS flag,
             CAST(SUM(l_quantity) AS BIGINT) AS qty
      FROM lineitem GROUP BY l_returnflag
    ), ranked AS (
      SELECT *, DENSE_RANK() OVER (ORDER BY qty DESC, flag ASC) AS rnk
      FROM per
    )
    SELECT CASE WHEN rnk <= 2 THEN flag ELSE 'Other' END AS l_returnflag,
           CAST(SUM(qty) AS BIGINT) AS qty
    FROM ranked
    GROUP BY CASE WHEN rnk <= 2 THEN flag ELSE 'Other' END
    """,
    doc="top-nested `with others = ...`: beyond-top keys collapse into "
    "one labeled bucket whose aggregate is the rolled-up remainder "
    "(Kusto's share-of-the-rest idiom; the bucket then behaves as a "
    "regular group for deeper levels)",
)
def kql_top_nested_others(spark, sf_dir):
    return kql(
        spark,
        """
        lineitem
        | extend q = tolong(l_quantity)
        | top-nested 2 of l_returnflag with others = 'Other' by qty = sum(q)
        """,
        tables=_tables(spark, sf_dir, "lineitem"),
    )


_DAY = 86400


def _bin_sql(ts_expr: str, anchor: str, step_s: int) -> str:
    """DuckDB bin anchored at ``anchor`` (the kql_make_series idiom:
    to_timestamp is TIMESTAMPTZ, so cast back to naive TIMESTAMP)."""
    return (
        f"CAST(to_timestamp(FLOOR((epoch({ts_expr}) - "
        f"epoch(TIMESTAMP '{anchor}')) / {step_s}) * {step_s} "
        f"+ epoch(TIMESTAMP '{anchor}')) AS TIMESTAMP)"
    )


@query(
    "kql_activity_counts_metrics",
    f"""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-19'
    ), binned AS (
      SELECT user_id, {_bin_sql('t', '2024-01-05', _DAY)} AS Timeline
      FROM ev
    ), per AS (
      SELECT Timeline, COUNT(*) AS count,
             COUNT(DISTINCT user_id) AS dcount
      FROM binned GROUP BY Timeline
    ), firsts AS (
      SELECT user_id, MIN(Timeline) AS Timeline FROM binned
      GROUP BY user_id
    ), nw AS (
      SELECT Timeline, COUNT(*) AS new_dcount FROM firsts
      GROUP BY Timeline
    )
    SELECT p.Timeline, p.count, p.dcount,
           COALESCE(n.new_dcount, 0) AS new_dcount,
           CAST(SUM(COALESCE(n.new_dcount, 0)) OVER (
             ORDER BY p.Timeline
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS aggregated_dcount
    FROM per p LEFT JOIN nw n ON n.Timeline = p.Timeline
    """,
    doc="KQL activity_counts_metrics plugin (user-analytics surface): "
    "per daily bin — row count, distinct users, NEW distinct users "
    "(first activity in that bin), and cumulative distinct users; "
    "two distributed hash aggs + one window over the driver-scale "
    "bin axis",
)
def kql_activity_counts_metrics(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | evaluate activity_counts_metrics(user_id, ts,
            datetime(2024-01-05), datetime(2024-01-19), 1d)
        | order by Timeline asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_sliding_window_counts",
    """
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events
      WHERE event_type = 'click'
        AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-03'
        AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-17'
    ), grid AS (
      SELECT CAST(g AS BIGINT) AS k,
             TIMESTAMP '2024-01-03' + CAST(g AS BIGINT) * INTERVAL 1 DAY
               AS Timeline
      FROM generate_series(0, 14) s(g)
    )
    SELECT g.Timeline,
           COUNT(e.user_id) AS Count,
           COUNT(DISTINCT e.user_id) AS Dcount
    FROM grid g
    LEFT JOIN ev e
      ON e.t <= g.Timeline
     AND e.t > g.Timeline - INTERVAL 7 DAY
    GROUP BY g.Timeline
    """,
    doc="KQL sliding_window_counts plugin: per daily grid point, "
    "events and distinct users in the trailing 7-day window — "
    "implemented as a per-event bin EXPLODE (bounded x window/bin "
    "expansion, no range join, co-partitioned aggregation), the shape "
    "that scales to 100 TB where a bins-to-events nested-loop join "
    "would not",
)
def kql_sliding_window_counts(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | where event_type == 'click'
        | evaluate sliding_window_counts(user_id, ts,
            datetime(2024-01-03), datetime(2024-01-17), 7d, 1d)
        | order by Timeline asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_activity_engagement",
    """
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08'
        AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-24'
    ), grid AS (
      SELECT TIMESTAMP '2024-01-08' + CAST(g AS BIGINT) * INTERVAL 1 DAY
               AS Timeline
      FROM generate_series(0, 16) s(g)
    ), agg AS (
      SELECT g.Timeline,
             COUNT(DISTINCT CASE
               WHEN e.t > g.Timeline - INTERVAL 1 DAY THEN e.user_id
             END) AS dcount_activities_inner,
             COUNT(DISTINCT e.user_id) AS dcount_activities_outer
      FROM grid g
      LEFT JOIN ev e
        ON e.t <= g.Timeline
       AND e.t > g.Timeline - INTERVAL 7 DAY
      GROUP BY g.Timeline
    )
    SELECT Timeline, dcount_activities_inner, dcount_activities_outer,
           ROUND(CAST(dcount_activities_inner AS DOUBLE)
                 / dcount_activities_outer, 4) AS activity_ratio
    FROM agg WHERE dcount_activities_outer > 0
    """,
    doc="KQL activity_engagement plugin — the DAU/MAU engagement "
    "idiom: distinct users in the trailing 1-day vs 7-day window per "
    "daily grid point, plus their ratio",
)
def kql_activity_engagement(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | evaluate activity_engagement(user_id, ts,
            datetime(2024-01-08), datetime(2024-01-24), 1d, 7d)
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.select(
        "Timeline",
        "dcount_activities_inner",
        "dcount_activities_outer",
        F.round("activity_ratio", 4).alias("activity_ratio"),
    )


@query(
    "kql_activity_metrics",
    """
    WITH ev AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)
                   - TIMESTAMP '2024-01-02') / 604800) AS BIGINT) AS k
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-02'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-30'
    ), per AS (
      SELECT k, COUNT(*) AS dcount_values FROM ev GROUP BY k
    ), firsts AS (
      SELECT user_id, MIN(k) AS k FROM ev GROUP BY user_id
    ), nw AS (
      SELECT k, COUNT(*) AS dcount_newvalues FROM firsts GROUP BY k
    ), ret AS (
      SELECT a.k, COUNT(*) AS retained
      FROM ev a JOIN ev b ON b.user_id = a.user_id AND b.k = a.k - 1
      GROUP BY a.k
    )
    SELECT TIMESTAMP '2024-01-02' + p.k * INTERVAL 7 DAY AS Timeline,
           p.dcount_values,
           COALESCE(n.dcount_newvalues, 0) AS dcount_newvalues,
           ROUND(CASE WHEN pv.dcount_values > 0
             THEN CAST(COALESCE(r.retained, 0) AS DOUBLE) / pv.dcount_values
             ELSE 0 END, 6) AS retention_rate,
           ROUND(CASE WHEN pv.dcount_values > 0
             THEN 1 - CAST(COALESCE(r.retained, 0) AS DOUBLE)
                      / pv.dcount_values
             ELSE 0 END, 6) AS churn_rate
    FROM per p
    LEFT JOIN nw n ON n.k = p.k
    LEFT JOIN ret r ON r.k = p.k
    LEFT JOIN per pv ON pv.k = p.k - 1
    """,
    doc="KQL activity_metrics plugin — weekly retention/churn: distinct "
    "users per week, first-seen users, and retained-vs-previous-week "
    "ratio; distinct (id, bin) pairs once, then a bin-shifted self-join "
    "hash-partitioned on the id (the bin axis stays driver-scale)",
)
def kql_activity_metrics(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | evaluate activity_metrics(user_id, ts,
            datetime(2024-01-02), datetime(2024-01-30), 7d)
        | order by Timeline asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.select(
        "Timeline",
        "dcount_values",
        "dcount_newvalues",
        F.round("retention_rate", 6).alias("retention_rate"),
        F.round("churn_rate", 6).alias("churn_rate"),
    )


@query(
    "kql_new_activity_metrics",
    """
    WITH ev AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)
                   - TIMESTAMP '2024-01-02') / 604800) AS BIGINT) AS k
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-02'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-30'
    ), firsts AS (
      SELECT user_id, MIN(k) AS kf FROM ev GROUP BY user_id
    ), coh AS (
      SELECT kf, CAST(COUNT(*) AS BIGINT) AS dcount_new_values
      FROM firsts GROUP BY kf
    ), grid AS (
      SELECT c.kf, c.dcount_new_values, CAST(s.g AS BIGINT) AS kt
      FROM coh c, generate_series(0, 3) s(g)
      WHERE s.g >= c.kf
    ), ret AS (
      SELECT f.kf, e.k AS kt, CAST(COUNT(*) AS BIGINT) AS retained
      FROM firsts f JOIN ev e ON e.user_id = f.user_id
      GROUP BY f.kf, e.k
    )
    SELECT TIMESTAMP '2024-01-02' + g.kf * INTERVAL 7 DAY AS from_ts,
           TIMESTAMP '2024-01-02' + g.kt * INTERVAL 7 DAY AS to_ts,
           g.dcount_new_values,
           COALESCE(r.retained, 0) AS dcount_retained_values,
           g.dcount_new_values - COALESCE(r.retained, 0)
             AS dcount_churn_values,
           ROUND(CAST(COALESCE(r.retained, 0) AS DOUBLE)
                 / g.dcount_new_values, 6) AS retention_rate,
           ROUND(CAST(g.dcount_new_values - COALESCE(r.retained, 0)
                      AS DOUBLE) / g.dcount_new_values, 6) AS churn_rate
    FROM grid g
    LEFT JOIN ret r ON r.kf = g.kf AND r.kt = g.kt
    """,
    doc="KQL new_activity_metrics plugin — weekly COHORT retention: "
    "users grouped by first-activity week, each cohort's active / "
    "churned share tracked over every later week; distinct (id, bin) "
    "pairs once + one id-keyed join, cohort x week grid stays "
    "driver-scale",
)
def kql_new_activity_metrics(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | evaluate new_activity_metrics(user_id, ts,
            datetime(2024-01-02), datetime(2024-01-30), 7d)
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.select(
        "from_ts",
        "to_ts",
        "dcount_new_values",
        "dcount_retained_values",
        "dcount_churn_values",
        F.round("retention_rate", 6).alias("retention_rate"),
        F.round("churn_rate", 6).alias("churn_rate"),
    )


@query(
    "kql_dcount_intersect",
    """
    WITH e AS (
      SELECT user_id % 5 AS grp, user_id, event_type FROM events
    ), ck AS (
      SELECT DISTINCT grp, user_id FROM e WHERE event_type = 'click'
    ), pu AS (
      SELECT DISTINCT grp, user_id FROM e WHERE event_type = 'purchase'
    ), er AS (
      SELECT DISTINCT grp, user_id FROM e WHERE event_type = 'error'
    )
    SELECT g.grp,
           (SELECT COUNT(*) FROM ck WHERE ck.grp = g.grp) AS s0,
           (SELECT COUNT(*) FROM ck JOIN pu
              ON pu.grp = ck.grp AND pu.user_id = ck.user_id
            WHERE ck.grp = g.grp) AS s1,
           (SELECT COUNT(*) FROM ck
              JOIN pu ON pu.grp = ck.grp AND pu.user_id = ck.user_id
              JOIN er ON er.grp = ck.grp AND er.user_id = ck.user_id
            WHERE ck.grp = g.grp) AS s2
    FROM (SELECT DISTINCT grp FROM e) g
    """,
    doc="KQL dcount_intersect plugin: HLL sketches per user cohort "
    "(click / purchase / error actors), intersected via inclusion-"
    "exclusion over hll_union + hll_sketch_estimate — Kusto's own "
    "documented method; per-row JVM expressions over pre-aggregated "
    "sketches, no extra shuffle.  Cohort cardinalities sit in the "
    "DataSketches exact (coupon) range, so the counts hash-match the "
    "exact COUNT(DISTINCT) oracle",
)
def kql_dcount_intersect(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | extend grp = user_id % 5
        | summarize
            h_click = hll(iff(event_type == 'click', user_id,
                              tolong(null))),
            h_purchase = hll(iff(event_type == 'purchase', user_id,
                                 tolong(null))),
            h_error = hll(iff(event_type == 'error', user_id,
                              tolong(null)))
            by grp
        | evaluate dcount_intersect(h_click, h_purchase, h_error)
        | order by grp asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_funnel_sequence",
    """
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_type AS s
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-30'
    ), w AS (
      SELECT user_id, t, s,
             LAG(s) OVER win AS prev,
             LEAD(s, 1) OVER win AS s1,
             LEAD(s, 2) OVER win AS s2,
             LEAD(s, 3) OVER win AS next,
             LEAD(t, 1) OVER win AS t1,
             LEAD(t, 2) OVER win AS t2
      FROM ev
      WINDOW win AS (PARTITION BY user_id ORDER BY t, s)
    ), hits AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY t, s
             ) AS rn
      FROM w
      WHERE s = 'view' AND s1 = 'click' AND s2 = 'purchase'
        AND t1 <= t + INTERVAL 1 DAY
        AND t2 <= t1 + INTERVAL 1 DAY
    )
    SELECT prev, next, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dcount
    FROM hits WHERE rn = 1
    GROUP BY prev, next
    """,
    doc="KQL funnel_sequence plugin (prev/next-distribution profile): "
    "users whose consecutive events contain view->click->purchase "
    "with each hop within 1d, grouped by the states immediately "
    "around the first completion; one per-id window pass (lag/lead "
    "chains hash-partitioned on user_id), no global window",
)
def kql_funnel_sequence(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | evaluate funnel_sequence(user_id, ts,
            datetime(2024-01-01), datetime(2024-01-30), 1d, 1d,
            event_type, dynamic(['view', 'click', 'purchase']))
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_graph_match_2hop",
    """
    SELECT CAST(l_suppkey AS BIGINT) AS supp,
           CAST(COUNT(*) AS BIGINT) AS n_paths,
           ROUND(SUM(l_extendedprice), 2) AS total
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
    doc="KQL graph operators (make-graph + graph-match, restricted "
    "linear profile): customer -placed-> order -supplied-> supplier "
    "money-flow paths over a heterogeneous edge table; the pattern "
    "lowers to a chain of hash equi-joins on edge endpoints — no "
    "cartesian — and the node table attaches only for the pattern "
    "variable whose property the query touches",
)
def kql_graph_match_2hop(spark, sf_dir):
    return kql(
        spark,
        """
        orders
        | project src = tolong(o_custkey), dst = 1000000 + o_orderkey,
                  kind = 'placed', wt = o_totalprice
        | union (lineitem
                 | project src = 1000000 + l_orderkey,
                           dst = 2000000 + l_suppkey,
                           kind = 'supplied', wt = l_extendedprice)
        | make-graph src --> dst
        | graph-match (c)-[e1]->(o)-[e2]->(s)
          where e1.kind == 'placed' and e2.kind == 'supplied'
          project supp = s.id - 2000000, price = e2.wt
        | summarize n_paths = count(), total = round(sum(price), 2)
            by supp
        | order by supp asc
        """,
        tables=_tables(spark, sf_dir, "orders", "lineitem"),
    )


# deterministic 10-node circulant graph: i -> i+2, i+3, i+5 (mod 10);
# the only directed triangles are the step permutations of 2+3+5 = 10
_GRAPH_EDGES = [
    (i, (i + s) % 10, 10 * i + (i + s) % 10)
    for i in range(10)
    for s in (2, 3, 5)
]
_GRAPH_DT = ", ".join(f"{a}, {b}, {w}" for a, b, w in _GRAPH_EDGES)
_GRAPH_VALUES = ", ".join(f"({a}, {b}, {w})" for a, b, w in _GRAPH_EDGES)


@query(
    "kql_graph_match_cycle",
    f"""
    WITH e(src, dst, w) AS (VALUES {_GRAPH_VALUES})
    SELECT CAST(e1.src AS BIGINT) AS a0,
           CAST(e1.dst AS BIGINT) AS b0,
           CAST(e2.dst AS BIGINT) AS c0,
           CAST(e1.w + e2.w + e3.w AS BIGINT) AS wsum
    FROM e e1
    JOIN e e2 ON e2.src = e1.dst
    JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src
    ORDER BY a0, b0, c0
    """,
    doc="KQL graph-match with a REPEATED node variable — directed "
    "triangles (a)->(b)->(c)->(a) on a deterministic circulant "
    "graph; the repeat lowers to an endpoint-equality filter on the "
    "join chain (cycles need no special machinery)",
)
def kql_graph_match_cycle(spark, sf_dir):
    return kql(
        spark,
        f"""
        datatable(src:long, dst:long, w:long) [ {_GRAPH_DT} ]
        | make-graph src --> dst
        | graph-match (a)-[e1]->(b)-[e2]->(c)-[e3]->(a)
          project a0 = a.id, b0 = b.id, c0 = c.id,
                  wsum = e1.w + e2.w + e3.w
        | order by a0 asc, b0 asc, c0 asc
        """,
        tables={},
    )


@query(
    "kql_graph_match_varlen",
    f"""
    WITH e(src, dst, w) AS (VALUES {_GRAPH_VALUES}),
    p AS (
      SELECT src AS a0, dst AS b0 FROM e
      UNION ALL
      SELECT e1.src, e2.dst FROM e e1 JOIN e e2 ON e2.src = e1.dst
    )
    SELECT CAST(a0 AS BIGINT) AS a0, CAST(b0 AS BIGINT) AS b0,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM p GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="KQL graph-match with a VARIABLE-LENGTH edge (*1..2): the "
    "starred segment expands to a bounded union of fixed-length join "
    "chains, one row per path (Kusto match semantics) — here counting "
    "distinct 1-or-2-hop paths per endpoint pair on the circulant "
    "graph",
)
def kql_graph_match_varlen(spark, sf_dir):
    return kql(
        spark,
        f"""
        datatable(src:long, dst:long, w:long) [ {_GRAPH_DT} ]
        | make-graph src --> dst
        | graph-match (a)-[e*1..2]->(b)
          project a0 = a.id, b0 = b.id
        | summarize n_paths = count() by a0, b0
        | order by a0 asc, b0 asc
        """,
        tables={},
    )


@query(
    "kql_graph_match_nodes",
    """
    SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(AVG(c_acctbal), 2) AS avg_bal
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    GROUP BY 1 ORDER BY 1
    """,
    doc="KQL make-graph 'with Nodes on IdCol' — node PROPERTIES from "
    "an explicit node table drive the match predicate (customers "
    "filtered by their nation node's name); unreferenced pattern "
    "variables attach no node join at all",
)
def kql_graph_match_nodes(spark, sf_dir):
    return kql(
        spark,
        """
        customer
        | project src = c_custkey, dst = c_nationkey, bal = c_acctbal
        | make-graph src --> dst with nation on n_nationkey
        | graph-match (c)-[e]->(n)
          where n.n_name in ('NATION_3', 'NATION_7', 'NATION_11')
          project nation = n.n_name, bal = e.bal
        | summarize n_cust = count(), avg_bal = round(avg(bal), 2)
            by nation
        | order by nation asc
        """,
        tables=_tables(spark, sf_dir, "customer", "nation"),
    )


@query(
    "kql_autocluster",
    """
    WITH src AS (
      SELECT event_type,
             'd' || CAST(user_id % 3 AS VARCHAR) AS device
      FROM events
    ), pat AS (
      SELECT event_type, device, CAST(COUNT(*) AS BIGINT) AS Count
      FROM src
      GROUP BY GROUPING SETS ((event_type), (device),
                              (event_type, device))
    ), ranked AS (
      SELECT *,
             ROUND(Count * 100.0 / (SELECT COUNT(*) FROM src), 2)
               AS Percent,
             ROW_NUMBER() OVER (
               ORDER BY Count DESC,
                        event_type ASC NULLS LAST,
                        device ASC NULLS LAST
             ) - 1 AS SegmentId
      FROM pat
    )
    SELECT CAST(SegmentId AS INT) AS SegmentId, Count, Percent,
           event_type, device
    FROM ranked WHERE SegmentId < 32 ORDER BY SegmentId
    """,
    doc="KQL autocluster plugin (deterministic restricted profile): "
    "most common single/pair attribute conjunctions over the event "
    "stream, one grouping-sets hash aggregation + a driver-scale "
    "ranking window",
)
def kql_autocluster(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | project event_type,
            device = strcat('d', tostring(user_id % 3))
        | evaluate autocluster()
        | order by SegmentId asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.withColumn("SegmentId", F.col("SegmentId").cast("int"))


@query(
    "kql_diffpatterns",
    """
    WITH src AS (
      SELECT event_type,
             'd' || CAST(user_id % 3 AS VARCHAR) AS device,
             'r' || CAST(user_id % 5 AS VARCHAR) AS region
      FROM events WHERE event_type IN ('purchase', 'view')
    ), tot AS (
      SELECT SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS ta,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS tb
      FROM src
    ), pat AS (
      SELECT device, region,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END) AS BIGINT) AS CountA,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                      END) AS BIGINT) AS CountB
      FROM src
      GROUP BY GROUPING SETS ((device), (region), (device, region))
    ), scored AS (
      SELECT *,
             ROUND(CountA * 100.0 / (SELECT ta FROM tot), 2)
               AS PercentA,
             ROUND(CountB * 100.0 / (SELECT tb FROM tot), 2)
               AS PercentB
      FROM pat WHERE CountA + CountB > 0
    ), ranked AS (
      SELECT *,
             ROUND(PercentA - PercentB, 2) AS PercentDiffAB,
             ROW_NUMBER() OVER (
               ORDER BY ABS(ROUND(PercentA - PercentB, 2)) DESC,
                        CountA DESC,
                        device ASC NULLS LAST,
                        region ASC NULLS LAST
             ) - 1 AS SegmentId
      FROM scored
    )
    SELECT CAST(SegmentId AS INT) AS SegmentId, CountA, CountB,
           PercentA, PercentB, PercentDiffAB, device, region
    FROM ranked WHERE SegmentId < 32 ORDER BY SegmentId
    """,
    doc="KQL diffpatterns plugin (deterministic restricted profile — "
    "Kusto's own is a heuristic search): single and pair attribute "
    "conjunctions whose frequency differs most between purchase and "
    "view events, computed in ONE grouping-sets hash aggregation "
    "with per-side conditional counts; the pattern table is tiny so "
    "the ranking window is driver-scale",
)
def kql_diffpatterns(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | where event_type in ('purchase', 'view')
        | project event_type,
            device = strcat('d', tostring(user_id % 3)),
            region = strcat('r', tostring(user_id % 5))
        | evaluate diffpatterns(event_type, 'purchase', 'view')
        | order by SegmentId asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.withColumn("SegmentId", F.col("SegmentId").cast("int"))


@query(
    "kql_ipv4_lookup",
    """
    WITH m AS (
      SELECT doc_id, doc_id % 4 AS o2, doc_id % 250 AS o3
      FROM documents
    )
    SELECT doc_id, label FROM (
      SELECT doc_id, 'corpA' AS label FROM m
      UNION ALL
      SELECT doc_id, 'netB' FROM m WHERE o2 = 2
      UNION ALL
      SELECT doc_id, 'subC' FROM m WHERE o2 = 3 AND o3 = 5
    ) ORDER BY doc_id, label
    """,
    doc="KQL ipv4_lookup plugin: CIDR containment joined as a hash "
    "EQUI-join — each network fans out to its covered /16 buckets "
    "and the range check is a residual filter, so the source table "
    "streams through a hash join instead of a broadcast nested loop; "
    "overlapping networks (a /8 containing a /16 containing a /24) "
    "each produce their match row, Kusto's all-matches semantics",
)
def kql_ipv4_lookup(spark, sf_dir):
    return kql(
        spark,
        """
        let nets = datatable(network:string, label:string) [
            '10.0.0.0/8', 'corpA',
            '10.2.0.0/16', 'netB',
            '10.3.5.0/24', 'subC'
        ];
        documents
        | project doc_id,
            ip = strcat('10.', tostring(doc_id % 4), '.',
                        tostring(doc_id % 250), '.',
                        tostring(doc_id % 256))
        | evaluate ipv4_lookup(nets, ip, network)
        | project doc_id, label
        | order by doc_id asc, label asc
        """,
        tables=_tables(spark, sf_dir, "documents"),
    )


@query(
    "kql_session_count",
    """
    WITH ev AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)
                   - TIMESTAMP '2024-01-02') / 86400) AS BIGINT) AS k
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-02'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-23'
    ), act AS (
      SELECT DISTINCT user_id, CAST(s.g AS BIGINT) AS b
      FROM ev, generate_series(0, 20) s(g)
      WHERE s.g BETWEEN ev.k AND ev.k + 2
    ), grid AS (
      SELECT CAST(g.g AS BIGINT) AS b FROM generate_series(0, 20) g(g)
    )
    SELECT TIMESTAMP '2024-01-02' + grid.b * INTERVAL 1 DAY AS ts,
           CAST(COALESCE(n, 0) AS BIGINT) AS count
    FROM grid LEFT JOIN (
      SELECT b, COUNT(*) AS n FROM act GROUP BY b
    ) c USING (b)
    ORDER BY ts
    """,
    doc="KQL session_count plugin: per daily timeline point, ids "
    "active within a 3d look-back window; distinct (id, bin) pairs "
    "fan out to a bounded bin range, all id-cardinality work stays "
    "hash-distributed, output grid is O(bins)",
)
def kql_session_count(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | evaluate session_count(user_id, ts,
            datetime(2024-01-02), datetime(2024-01-23), 1d, 3d)
        | order by ts asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out


@query(
    "kql_rolling_percentile",
    """
    WITH ev AS (
      SELECT value,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)
                   - TIMESTAMP '2024-01-02') / 86400) AS BIGINT) AS k
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-02'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
        AND event_type = 'purchase'
    ), bins AS (
      SELECT CAST(s.g AS BIGINT) AS b FROM generate_series(0, 13) s(g)
    ), fan AS (
      SELECT value, bins.b
      FROM ev JOIN bins ON bins.b BETWEEN ev.k AND ev.k + 2
    )
    SELECT TIMESTAMP '2024-01-02' + bins.b * INTERVAL 1 DAY AS ts,
           ROUND(quantile_cont(fan.value, 0.5), 4) AS p50
    FROM bins LEFT JOIN fan ON fan.b = bins.b
    GROUP BY bins.b ORDER BY ts
    """,
    doc="KQL rolling_percentile plugin: exact interpolated median of "
    "the last 3 daily bins per timeline point over the FULL timeline "
    "grid (empty windows emit null); values fan out to a bounded bin "
    "range and one hash aggregation computes each bin's percentile — "
    "no global window",
)
def kql_rolling_percentile(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | where event_type == 'purchase'
        | evaluate rolling_percentile(value, 50, ts,
            datetime(2024-01-02), datetime(2024-01-16), 1d, 3)
        | order by ts asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.select(
        "ts", F.round("rolling_50_percentile_value", 4).alias("p50")
    )


@query(
    "kql_rows_near",
    """
    WITH ev AS (
      SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS t
      FROM events WHERE user_id % 97 = 0
    ), m AS (
      SELECT *,
             MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               OVER (ORDER BY t, event_id
                     ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS near
      FROM ev
    )
    SELECT event_id, event_type FROM m WHERE near = 1
    ORDER BY event_id
    """,
    doc="KQL rows_near plugin: context rows around error events (2 "
    "before, 1 after) in the serialized order — the inherently "
    "sequential Kusto semantics, one ordered window pass",
)
def kql_rows_near(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | where user_id % 97 == 0
        | project event_id, event_type, ts
        | order by ts asc, event_id asc
        | evaluate rows_near(event_type == 'error', 2, 1)
        | project event_id, event_type
        | order by event_id asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out


@query(
    "kql_scalar_toolkit3",
    """
    WITH base AS (
      SELECT doc_id, text,
             CAST(doc_id % 256 AS VARCHAR) || '.99.1.'
               || CAST(doc_id % 100 AS VARCHAR) AS ip,
             TIMESTAMP '2024-01-01' + CAST(doc_id % 200 AS BIGINT)
               * INTERVAL 1 DAY AS d
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'e+')) AS BIGINT) AS ecount,
           (CAST(doc_id % 256 AS BIGINT) * 16777216
            + 99 * 65536 + 256 + doc_id % 100) AS ipnum,
           (doc_id % 256 = 10
            OR doc_id % 256 = 192) AND FALSE
             OR (doc_id % 256 = 10)
             AS priv,
           (doc_id % 256 = 10) AS inr,
           CAST(weekofyear(d) AS BIGINT) AS wk,
           date_trunc('day', d) + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND
             AS eod,
           CAST(CAST(lpad(CAST(doc_id % 5 AS VARCHAR), 8, '0')
                || '000000020000000100000000' AS DECIMAL(38, 0))
                AS VARCHAR) AS ver
    FROM base
    """,
    doc="round-4 KQL scalar batch over documents: countof_regex, "
    "parse_ipv4 / ipv4_is_private / ipv4_is_in_range on synthesized "
    "addresses, week_of_year / endofday on synthesized dates, "
    "parse_version — all pure Catalyst expressions, oracle-matched "
    "against DuckDB equivalents",
)
def kql_scalar_toolkit3(spark, sf_dir):
    return kql(
        spark,
        """
        documents
        | extend ip = strcat(tostring(doc_id % 256), '.99.1.',
                             tostring(doc_id % 100))
        | extend d = datetime_add('day', toint(doc_id % 200),
                                  datetime(2024-01-01))
        | extend ecount = countof_regex(text, 'e+'),
                 ipnum = parse_ipv4(ip),
                 priv = ipv4_is_private(ip),
                 inr = ipv4_is_in_range(ip, '10.99.0.0/16'),
                 wk = tolong(week_of_year(d)),
                 eod = endofday(d),
                 ver = tostring(parse_version(strcat(
                     tostring(doc_id % 5), '.2.1')))
        | project doc_id, ecount, ipnum, priv, inr, wk, eod, ver
        """,
        tables=_tables(spark, sf_dir, "documents"),
    )


@query(
    "kql_agg_toolkit",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75,
           ROUND(stddev_pop(l_quantity), 4) AS sdp,
           ROUND(var_pop(l_quantity), 4) AS vp,
           bit_or(l_linenumber) AS ball_or,
           bit_and(l_linenumber) AS ball_and,
           bit_xor(CAST(l_orderkey AS BIGINT)) AS ball_xor,
           COUNT(DISTINCT l_suppkey)
             FILTER (WHERE l_quantity > 25) AS dsupp
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="round-4 KQL aggregate batch over lineitem: exact interpolated "
    "percentiles (element-wise, matching DuckDB quantile_cont), "
    "population stdev/variance, binary_all_or/and/xor bit folds, and "
    "count_distinctif — all single-pass hash aggregates",
)
def kql_agg_toolkit(spark, sf_dir):
    out = kql(
        spark,
        """
        lineitem
        | summarize p = percentiles(l_quantity, 25, 75),
                    sdp = round(stdevp(l_quantity), 4),
                    vp = round(variancep(l_quantity), 4),
                    ball_or = binary_all_or(l_linenumber),
                    ball_and = binary_all_and(l_linenumber),
                    ball_xor = binary_all_xor(tolong(l_orderkey)),
                    dsupp = count_distinctif(l_suppkey, l_quantity > 25)
            by l_returnflag
        """,
        tables=_tables(spark, sf_dir, "lineitem"),
    )
    return out.select(
        "l_returnflag",
        F.round(F.element_at("p", 1), 4).alias("q25"),
        F.round(F.element_at("p", 2), 4).alias("q75"),
        "sdp",
        "vp",
        "ball_or",
        "ball_and",
        "ball_xor",
        "dsupp",
    )


@query(
    "kql_sequence_detect",
    """
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_type FROM events
    ), s1 AS (
      SELECT user_id, MIN(t) AS t0 FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, s1.t0, MIN(e.t) AS t1
      FROM ev e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click'
        AND e.t > s1.t0 AND e.t <= s1.t0 + INTERVAL 1 DAY
        AND e.t <= s1.t0 + INTERVAL 7 DAY
      GROUP BY e.user_id, s1.t0
    ), s3 AS (
      SELECT e.user_id, s2.t0, s2.t1, MIN(e.t) AS t2
      FROM ev e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND e.t > s2.t1 AND e.t <= s2.t1 + INTERVAL 1 DAY
        AND e.t <= s2.t0 + INTERVAL 7 DAY
      GROUP BY e.user_id, s2.t0, s2.t1
    )
    SELECT user_id, t0 AS s_view_ts, t1 AS s_click_ts, t2 AS s_purchase_ts
    FROM s3
    """,
    doc="KQL sequence_detect plugin: earliest greedy view -> click -> "
    "purchase completion per user (1d max step gap, 7d max span) — "
    "one aggregation + one join per step, all keyed on the id (k "
    "steps = k hash-partitioned passes, no corpus-wide window)",
)
def kql_sequence_detect(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | extend s_view = event_type == 'view',
                 s_click = event_type == 'click',
                 s_purchase = event_type == 'purchase'
        | evaluate sequence_detect(ts, 1d, 7d,
            s_view, s_click, s_purchase, user_id)
        | order by user_id asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_geo_toolkit",
    """
    WITH pts AS (
      SELECT doc_id,
             -180.0 + (doc_id % 360) AS lon,
             -80.0 + (doc_id % 160) AS lat
      FROM documents
    )
    SELECT doc_id,
           ROUND(2.0 * 6371008.8 * asin(least(1.0, sqrt(
             pow(sin((radians(48.8566) - radians(lat)) / 2), 2)
             + cos(radians(lat)) * cos(radians(48.8566))
               * pow(sin((radians(2.3522) - radians(lon)) / 2), 2)
           ))) / 1000, 3) AS km_to_paris,
           (2.0 * 6371008.8 * asin(least(1.0, sqrt(
             pow(sin((radians(48.8566) - radians(lat)) / 2), 2)
             + cos(radians(lat)) * cos(radians(48.8566))
               * pow(sin((radians(2.3522) - radians(lon)) / 2), 2)
           ))) <= 2000000.0) AS near_paris
    FROM pts
    """,
    doc="Kusto geo toolkit over synthesized coordinates: "
    "geo_distance_2points (spherical haversine, IUGG mean radius) and "
    "geo_point_in_circle — pure trig expressions, no UDFs, matched "
    "against the identical DuckDB formula",
)
def kql_geo_toolkit(spark, sf_dir):
    return kql(
        spark,
        """
        documents
        | extend lon = -180.0 + todouble(doc_id % 360),
                 lat = -80.0 + todouble(doc_id % 160)
        | extend km_to_paris = round(
              geo_distance_2points(lon, lat, 2.3522, 48.8566) / 1000, 3),
            near_paris = geo_point_in_circle(
              lon, lat, 2.3522, 48.8566, 2000000.0)
        | project doc_id, km_to_paris, near_paris
        """,
        tables=_tables(spark, sf_dir, "documents"),
    )


@query(
    "kql_series_elementwise",
    """
    WITH base AS (
      SELECT event_type,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)
                   - TIMESTAMP '2024-01-01') / 86400) AS BIGINT) AS idx,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-31'
      GROUP BY 1, 2
    ), keys AS (SELECT DISTINCT event_type FROM base),
    grid AS (
      SELECT k.event_type, CAST(s.g AS BIGINT) AS idx,
             COALESCE(b.v, 0) AS v
      FROM keys k CROSS JOIN generate_series(0, 29) s(g)
      LEFT JOIN base b ON b.event_type = k.event_type AND b.idx = s.g
    ), sm AS (
      SELECT g1.event_type, g1.idx,
             SUM(g2.v * POWER(0.5, g1.idx - g2.idx + 1)) AS y
      FROM grid g1 JOIN grid g2
        ON g2.event_type = g1.event_type AND g2.idx <= g1.idx
      GROUP BY 1, 2
    )
    SELECT g.event_type,
           SUM(g.v) AS total,
           ROUND(SQRT(SUM(g.v * g.v)), 4) AS mag,
           to_json(list(CAST(FLOOR(s.y * 10000) AS BIGINT)
                        ORDER BY g.idx)) AS sm,
           to_json(list(printf('%.1f', g.v * 2) ORDER BY g.idx)) AS dbl,
           to_json(list(g.v > 100 ORDER BY g.idx)) AS hot
    FROM grid g JOIN sm s
      ON s.event_type = g.event_type AND s.idx = g.idx
    GROUP BY 1 ORDER BY 1
    """,
    doc="Kusto elementwise series family over make-series daily "
    "counts: series_sum / series_magnitude reductions, "
    "series_multiply / series_greater elementwise maps, and "
    "series_iir with a [0.5] / [1, -0.5] exponential smoother — all "
    "pure JVM array lambdas; the 0.5 coefficients keep every product "
    "dyadic-rational so both engines agree bit-for-bit (oracle "
    "computes the IIR's closed-form convolution)",
)
def kql_series_elementwise(spark, sf_dir):
    out = kql(
        spark,
        """
        events
        | make-series n = count() default = 0
            on ts from datetime(2024-01-01) to datetime(2024-01-31)
            step 1d by event_type
        | extend total = series_sum(n),
                 mag = round(series_magnitude(n), 4),
                 sm = series_iir(n, dynamic([0.5]), dynamic([1.0, -0.5])),
                 dbl = series_multiply(n, 2),
                 hot = series_greater(n, 100)
        | order by event_type asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )
    return out.select(
        "event_type",
        "total",
        "mag",
        F.to_json(
            # floor(v*1e4) as exact integers: printf would split on
            # round-half-even (C) vs HALF_UP (Java) at the dyadic
            # halves this smoother produces exactly
            F.transform(
                "sm", lambda v: F.floor(v * 10000).cast("long")
            )
        ).alias("sm"),
        F.to_json(
            F.transform("dbl", lambda v: F.format_string("%.1f", v))
        ).alias("dbl"),
        F.to_json("hot").alias("hot"),
    )


@query(
    "kql_scalar_toolkit4",
    """
    WITH ev AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t,
             (event_id * 7919) % 2000000000 AS sz
      FROM events WHERE user_id % 199 = 0
    )
    SELECT event_id,
           date_trunc('day', t) - to_days(CAST(dayofweek(t) AS INT))
             AS sw,
           date_trunc('day', t) - to_days(CAST(dayofweek(t) AS INT))
             + INTERVAL 7 DAY - INTERVAL 1 MICROSECOND AS ew,
           CAST(dayofyear(t) AS INT) AS doy,
           printf('%.2f', sz / POWER(2.0,
             10 * (CASE WHEN sz >= 1073741824 THEN 3
                        WHEN sz >= 1048576 THEN 2
                        WHEN sz >= 1024 THEN 1 ELSE 0 END)))
             || ' ' ||
             (['Bytes', 'KB', 'MB', 'GB'])[
               (CASE WHEN sz >= 1073741824 THEN 3
                     WHEN sz >= 1048576 THEN 2
                     WHEN sz >= 1024 THEN 1 ELSE 0 END) + 1] AS fb,
           printf('%.1f', sz / 1048576.0) || ' MB' AS fbm,
           strftime(t, '%H:%M:%S') AS ft,
           to_json(struct_pack(
             Scheme := '',
             RootPath := '',
             DirectoryPath := '/data/dir_' || CAST(user_id % 7 AS VARCHAR),
             DirectoryName := 'dir_' || CAST(user_id % 7 AS VARCHAR),
             Filename := 'f_' || CAST(event_id AS VARCHAR) || '.txt',
             Extension := 'txt',
             AlternateDataStreamName := '')) AS pp
    FROM ev ORDER BY event_id
    """,
    doc="Kusto round-5 scalar batch: startofweek/endofweek (SUNDAY "
    "week start, unlike Spark's date_trunc), dayofyear, format_bytes "
    "(auto 1024-power unit via exact integer thresholds + fixed-unit "
    "form; precision >= 1 keeps dyadic values off the printf "
    "half-even/HALF_UP split), format_timespan over a day-time "
    "interval, parse_path property bag — all pure JVM expressions",
)
def kql_scalar_toolkit4(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | where user_id % 199 == 0
        | extend sz = (event_id * 7919) % 2000000000
        | extend sw = startofweek(ts), ew = endofweek(ts),
                 doy = toint(dayofyear(ts)),
                 fb = format_bytes(sz, 2),
                 fbm = format_bytes(sz, 1, 'MB'),
                 ft = format_timespan(ts - startofday(ts), 'hh:mm:ss'),
                 pp = parse_path(strcat('/data/dir_',
                    tostring(user_id % 7), '/f_',
                    tostring(event_id), '.txt'))
        | project event_id, sw, ew, doy, fb, fbm, ft, pp
        | order by event_id asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_find_search",
    """
    WITH a AS (
      SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal
      FROM customer
    ), b AS (
      SELECT s_suppkey AS key, s_name AS name, s_acctbal AS bal,
             s_nationkey AS nat
      FROM supplier
    )
    SELECT src, name, ROUND(bal, 2) AS bal FROM (
      SELECT 'A' AS src, name, bal FROM a WHERE bal > 9000
      UNION ALL
      SELECT 'B' AS src, name, bal FROM b WHERE bal > 9000
    ) ORDER BY src, name
    """,
    doc="KQL find operator: cross-table search with withsource tag "
    "and projected columns — union-by-name with null-filled missing "
    "columns, one filter; the union is plan-level only (predicate "
    "and projection push into every branch, no shuffle)",
)
def kql_find_search(spark, sf_dir):
    tabs = _tables(spark, sf_dir, "customer", "supplier")
    tabs["A"] = tabs["customer"].selectExpr(
        "c_custkey AS key", "c_name AS name", "c_acctbal AS bal"
    )
    tabs["B"] = tabs["supplier"].selectExpr(
        "s_suppkey AS key", "s_name AS name", "s_acctbal AS bal",
        "s_nationkey AS nat"
    )
    out = kql(
        spark,
        """
        find withsource=src in (A, B) where bal > 9000
            project name, bal
        | order by src asc, name asc
        """,
        tables=tabs,
    )
    return out.select("src", "name", F.round("bal", 2).alias("bal"))


@query(
    "kql_reduce_patterns",
    """
    WITH logs AS (
      SELECT 'user_' || CAST(user_id % 50 AS VARCHAR)
             || ' did ' || event_type
             || ' on host' || CAST(event_id % 7 AS VARCHAR) AS msg
      FROM events
    )
    SELECT regexp_replace(regexp_replace(regexp_replace(
             msg, '[0-9]+', '*', 'g'),
             '\\b[0-9a-fA-F*]{8,}\\b', '*', 'g'),
             '\\*{2,}', '*', 'g') AS Pattern,
           CAST(COUNT(*) AS BIGINT) AS Count,
           MIN(msg) AS Representative
    FROM logs GROUP BY 1 ORDER BY Count DESC, Pattern
    """,
    doc="KQL reduce operator: log-template clustering profile — "
    "digit runs and 8+-char hex runs fold to '*', one hash "
    "aggregation on the derived pattern key (map-side partials, no "
    "quadratic term); Representative = MIN(value) keeps the pick "
    "deterministic on both engines",
)
def kql_reduce_patterns(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | project msg = strcat('user_', tostring(user_id % 50),
            ' did ', event_type, ' on host', tostring(event_id % 7))
        | reduce by msg
        | order by Count desc, Pattern asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


def _geohash_oracle(p: int) -> str:
    """DuckDB twin of the unrolled geohash encode at literal
    precision ``p`` — the same fixed-point interleave the KQL
    lowering emits (see kql_parse geo_point_to_geohash)."""
    n = 5 * p
    lonbits, latbits = (n + 1) // 2, n // 2
    chars = []
    for i in range(p):
        terms = []
        for j in range(5):
            t = 5 * i + j
            if t % 2 == 0:
                src, sh = "lon_i", lonbits - 1 - t // 2
            else:
                src, sh = "lat_i", latbits - 1 - (t - 1) // 2
            terms.append(f"(({src} // {2 ** sh}) % 2) * {2 ** (4 - j)}")
        chars.append(
            "substring('0123456789bcdefghjkmnpqrstuvwxyz', "
            f"CAST({' + '.join(terms)} AS INT) + 1, 1)"
        )
    return (
        f"""
    WITH pts AS (
      SELECT doc_id,
             -180.0 + (doc_id % 3600) / 10.0 AS lon,
             -90.0 + (doc_id % 1800) / 10.0 AS lat
      FROM documents WHERE doc_id % 11 = 0
    ), ints AS (
      SELECT doc_id, lon, lat,
             LEAST(CAST(FLOOR((lon + 180.0) / 360.0 *
               {float(2 ** lonbits)!r}) AS BIGINT),
               {2 ** lonbits - 1}) AS lon_i,
             LEAST(CAST(FLOOR((lat + 90.0) / 180.0 *
               {float(2 ** latbits)!r}) AS BIGINT),
               {2 ** latbits - 1}) AS lat_i
      FROM pts
    )
    SELECT doc_id, {' || '.join(chars)} AS gh,
           ROUND(-180.0 + 360.0 * (lon_i + 0.5) /
                 {float(2 ** lonbits)!r}, 8) AS clon,
           ROUND(-90.0 + 180.0 * (lat_i + 0.5) /
                 {float(2 ** latbits)!r}, 8) AS clat
    FROM ints ORDER BY doc_id
    """
    )


@query(
    "kql_geo_geohash",
    _geohash_oracle(5),
    doc="Kusto geo_point_to_geohash / geo_geohash_to_central_point: "
    "the encode UNROLLS at translate time into plain fixed-point "
    "integer interleaving (no lambdas, no UDF — the oracle twin is "
    "the same arithmetic in DuckDB syntax); the decode folds base32 "
    "digits back and de-interleaves, center math exact dyadic so "
    "both engines agree bit-for-bit",
)
def kql_geo_geohash(spark, sf_dir):
    out = kql(
        spark,
        """
        documents
        | where doc_id % 11 == 0
        | extend lon = -180.0 + todouble(doc_id % 3600) / 10.0,
                 lat = -90.0 + todouble(doc_id % 1800) / 10.0
        | extend gh = geo_point_to_geohash(lon, lat, 5)
        | extend ctr = geo_geohash_to_central_point(gh)
        | project doc_id, gh, ctr
        | order by doc_id asc
        """,
        tables=_tables(spark, sf_dir, "documents"),
    )
    return out.select(
        "doc_id",
        "gh",
        F.round(
            F.get_json_object("ctr", "$.coordinates[0]").cast("double"), 8
        ).alias("clon"),
        F.round(
            F.get_json_object("ctr", "$.coordinates[1]").cast("double"), 8
        ).alias("clat"),
    )


@query(
    "kql_ipv6_toolkit",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id * 131) % 65536 AS hi,
             (doc_id * 977) % 65536 AS lo
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           '2001:0db8:0000:0000:0000:0000:' ||
             lpad(printf('%x', hi), 4, '0') || ':' ||
             lpad(printf('%x', lo), 4, '0') AS canon,
           CAST(CASE WHEN hi < 32768 THEN -1
                     WHEN hi > 32768 THEN 1
                     WHEN lo > 0 THEN 1 ELSE 0 END AS INT) AS cmp,
           (hi // 4096 = 1) AS inb
    FROM d ORDER BY doc_id
    """,
    doc="Kusto IPv6 toolkit: parse_ipv6 canonicalizes a messy spelling "
    "(uppercase, zero-compressed '::') to the full 8-group lowercase "
    "form; ipv6_compare orders against a pivot address; ipv6_is_match "
    "tests a /100 CIDR block.  All pure JVM string/array expressions "
    "(translate-time lowering, no UDF).  The oracle derives the "
    "canonical string and the comparisons ARITHMETICALLY from the "
    "generating integers — an independent derivation, not the same "
    "parser twice",
)
def kql_ipv6_toolkit(spark, sf_dir):
    return kql(
        spark,
        """
        documents
        | where doc_id % 7 == 0
        | extend hi = (doc_id * 131) % 65536, lo = (doc_id * 977) % 65536
        | extend ip = strcat('2001:DB8::', tohex(hi), ':', tohex(lo))
        | extend canon = parse_ipv6(ip),
                 cmp = ipv6_compare(ip, '2001:db8::8000:0'),
                 inb = ipv6_is_match(ip, '2001:db8::1000:0/100')
        | project doc_id, canon, cmp, inb
        | order by doc_id asc
        """,
        tables=_tables(spark, sf_dir, "documents"),
    )


@query(
    "kql_parse_kv",
    """
    SELECT doc_id, lang AS k_lang, n_chars AS k_n, source AS k_src
    FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id
    """,
    doc="KQL parse-kv operator: key=value extraction into typed "
    "columns via per-key JVM regexp_extract (lookahead-bounded "
    "values, first occurrence wins — robust to duplicate keys and "
    "repeated delimiters, unlike str_to_map), no UDF.  The round "
    "trip (strcat the kv string, parse it back) must reproduce the "
    "source columns exactly, which the oracle selects directly",
)
def kql_parse_kv(spark, sf_dir):
    return kql(
        spark,
        """
        documents
        | where doc_id % 13 == 0
        | extend msg = strcat('k_lang=', lang, ' k_n=',
                              tostring(n_chars), ' k_src=', source)
        | parse-kv msg as (k_lang: string, k_n: long, k_src: string)
          with (pair_delimiter=' ', kv_delimiter='=')
        | project doc_id, k_lang, k_n, k_src
        | order by doc_id asc
        """,
        tables=_tables(spark, sf_dir, "documents"),
    )


@query(
    "kql_join_hints",
    """
    SELECT n.n_name,
           COUNT(*) AS suppliers,
           CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    ORDER BY n_name
    """,
    doc="KQL execution hints HONORED (round 6): hint.strategy="
    "broadcast lowers to F.broadcast on the left (Kusto's small-side "
    "contract) and hint.shufflekey pre-repartitions the summarize "
    "input — the plan flips (pinned in test_plans."
    "test_kql_join_hints_steer_the_plan) while the values hash-match "
    "the unhinted oracle exactly",
)
def kql_join_hints(spark, sf_dir):
    return kql(
        spark,
        """
        nation
        | project n_nationkey, n_name
        | join kind=inner hint.strategy=broadcast (
            supplier | project s_nationkey, s_acctbal
            | project-rename n_nationkey = s_nationkey
          ) on n_nationkey
        | summarize hint.shufflekey=n_name
            suppliers = count(),
            bal_cents = sum(tolong(round(s_acctbal * 100))) by n_name
        | project n_name, suppliers, bal_cents
        | order by n_name asc
        """,
        tables=_tables(spark, sf_dir, "nation", "supplier"),
    )


@query(
    "kql_scalar_toolkit5",
    """
    SELECT p_partkey,
           ROUND(atan2(CAST(p_size AS DOUBLE), 7.0), 6) AS a2,
           ROUND(cot(CAST(p_size AS DOUBLE) / 10 + 0.1), 6) AS ct,
           ROUND(degrees(CAST(p_size AS DOUBLE) / 50), 6) AS dg,
           ROUND(log10(CAST(p_size AS DOUBLE) + 1), 6) AS l10,
           ROUND(log2(CAST(p_size AS DOUBLE) + 1), 6) AS l2,
           dayofyear(DATE '1995-01-01'
                     + CAST(p_size AS BIGINT) * INTERVAL 3 DAY) AS doy,
           '{"Query Parameters":{"a":"' || CAST(p_size AS VARCHAR)
               || '","b":"' || CAST(p_partkey AS VARCHAR) || '"}}'
               AS urlq,
           CAST(
             10 * 16777216 + (p_size % 256) * 65536
             + ((p_partkey % 256) * 256 + 7) // 256 * 256
             AS BIGINT) AS ipmask,
           '{"sz":' || CAST(p_size AS VARCHAR) || ',"brand":"'
               || p_brand || '"}' AS bag,
           make_timestamp(p_partkey * 1000000) AS ts
    FROM part WHERE p_partkey <= 400
    ORDER BY p_partkey
    """,
    doc="KQL scalar batch 5 (round 8): atan2/cot/degrees/log10/log2/"
    "dayofyear pass through to Spark's own functions; parse_urlquery "
    "(Kusto's Query Parameters bag via str_to_map), parse_ipv4_mask "
    "(prefix-masked 32-bit value), pack_dictionary (bag from pairs), "
    "unixtime_nanoseconds_todatetime — each re-derived arithmetically "
    "by the oracle",
)
def kql_scalar_toolkit5(spark, sf_dir):
    return kql(
        spark,
        """
        part
        | where p_partkey <= 400
        | project p_partkey,
            a2 = round(atan2(todouble(p_size), 7.0), 6),
            ct = round(cot(todouble(p_size) / 10 + 0.1), 6),
            dg = round(degrees(todouble(p_size) / 50), 6),
            l10 = round(log10(todouble(p_size) + 1), 6),
            l2 = round(log2(todouble(p_size) + 1), 6),
            doy = dayofyear(datetime(1995-01-01) + 3d * p_size),
            urlq = parse_urlquery(strcat('a=', tostring(p_size),
                                         '&b=', tostring(p_partkey))),
            ipmask = parse_ipv4_mask(
                strcat('10.', tostring(p_size % 256), '.',
                       tostring(p_partkey % 256), '.7'), 24),
            bag = pack_dictionary('sz', p_size, 'brand', p_brand),
            ts = unixtime_nanoseconds_todatetime(
                p_partkey * 1000000000)
        | order by p_partkey asc
        """,
        tables=_tables(spark, sf_dir, "part"),
    )


@query(
    "kql_percentilew",
    """
    WITH t AS (
      SELECT l_returnflag g, l_extendedprice x,
             CAST(l_quantity AS BIGINT) w
      FROM lineitem WHERE l_orderkey <= 20000
    ),
    s AS (
      SELECT g, x, w,
             SUM(w) OVER (PARTITION BY g ORDER BY x
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY g) AS tw
      FROM t
    ),
    j AS (
      SELECT s.g, s.x, s.cw, pr.p, pr.p * (s.tw - 1) AS r
      FROM s CROSS JOIN (SELECT UNNEST([0.50, 0.90]) AS p) pr
    ),
    q AS (
      SELECT g, p,
             MIN(x) FILTER (WHERE cw > FLOOR(r)) AS lo,
             MIN(x) FILTER (WHERE cw > CEIL(r))  AS hi,
             ANY_VALUE(r) AS r
      FROM j GROUP BY g, p
    )
    SELECT g AS l_returnflag,
           ROUND(MAX(CASE WHEN p = 0.50
                 THEN lo + (r - FLOOR(r)) * (hi - lo) END), 4) AS p50w,
           ROUND(MAX(CASE WHEN p = 0.90
                 THEN lo + (r - FLOOR(r)) * (hi - lo) END), 4) AS p90w
    FROM q GROUP BY g ORDER BY g
    """,
    doc="KQL percentilew (weighted percentile): lowers to Spark's "
    "exact percentile(expr, frac, frequency) single-pass aggregate — "
    "no row explosion.  The oracle re-derives the expanded-multiset "
    "continuous quantile with cumulative-weight window math (lo/hi = "
    "first values past floor/ceil of p*(W-1), linear interpolation) "
    "— the exact definition Spark's frequency argument implements",
)
def kql_percentilew(spark, sf_dir):
    return kql(
        spark,
        """
        lineitem
        | where l_orderkey <= 20000
        | summarize p50w = round(percentilew(l_extendedprice,
                                 tolong(l_quantity), 50), 4),
                    p90w = round(percentilew(l_extendedprice,
                                 tolong(l_quantity), 90), 4)
          by l_returnflag
        | order by l_returnflag asc
        """,
        tables=_tables(spark, sf_dir, "lineitem"),
    )


@query(
    "kql_active_users_count",
    """
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP)
                  - TIMESTAMP '2024-01-03') / 86400) AS BIGINT) AS p
      FROM events
      WHERE event_type = 'click'
        AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-03'
        AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-17'
    ), grid AS (
      SELECT CAST(g AS BIGINT) AS k,
             TIMESTAMP '2024-01-03' + CAST(g AS BIGINT) * INTERVAL 1 DAY
               AS Timeline
      FROM generate_series(0, 14) s(g)
    ), sticky AS (
      SELECT g.k, e.user_id
      FROM grid g JOIN ev e
        ON e.t <= g.Timeline AND e.t > g.Timeline - INTERVAL 7 DAY
      GROUP BY g.k, e.user_id
      HAVING COUNT(DISTINCT e.p) >= 3
    )
    SELECT g.Timeline,
           CAST(COUNT(s.user_id) AS BIGINT) AS dcount
    FROM grid g LEFT JOIN sticky s ON s.k = g.k
    GROUP BY g.Timeline
    ORDER BY g.Timeline
    """,
    doc="KQL active_users_count plugin (round 8): per daily grid "
    "point, distinct users active on >= 3 DISTINCT days of the "
    "trailing 7 — Kusto's stickiness dcount.  Engine shape: bounded "
    "per-event bin explode (x lookback/period) then two hash "
    "aggregations, no bins-to-events range join; the oracle "
    "re-derives it with an explicit grid join",
)
def kql_active_users_count(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | where event_type == 'click'
        | evaluate active_users_count(user_id, ts,
            datetime(2024-01-03), datetime(2024-01-17), 7d, 1d, 3)
        | order by Timeline asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_funnel_completion",
    """
    WITH e AS (
      SELECT user_id AS id, CAST(ts AS TIMESTAMP) AS t,
             event_type AS s
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-02-01'
    ),
    s1 AS (SELECT id, MIN(t) AS t1 FROM e WHERE s = 'view' GROUP BY id),
    s2 AS (SELECT e.id, s1.t1, MIN(e.t) AS t2
           FROM e JOIN s1 ON e.id = s1.id
           WHERE e.s = 'click' AND e.t > s1.t1 GROUP BY e.id, s1.t1),
    s3 AS (SELECT e.id, s2.t1, MIN(e.t) AS t3
           FROM e JOIN s2 ON e.id = s2.id
           WHERE e.s = 'purchase' AND e.t > s2.t2
           GROUP BY e.id, s2.t1),
    binned AS (
      SELECT 'view' AS StateSequence, id,
             t1 AS tl, t1 FROM s1
      UNION ALL
      SELECT 'view, click', id, t2, t1 FROM s2
        WHERE t2 - t1 <= INTERVAL 3 DAY
      UNION ALL
      SELECT 'view, click, purchase', id, t3, t1 FROM s3
        WHERE t3 - t1 <= INTERVAL 7 DAY
    )
    SELECT TIMESTAMP '2024-01-01'
             + CAST(FLOOR(EPOCH(t1 - TIMESTAMP '2024-01-01') / 86400)
               AS BIGINT) * INTERVAL 1 DAY AS Timeline,
           StateSequence,
           CAST(COUNT(DISTINCT id) AS BIGINT) AS dcount
    FROM binned
    GROUP BY 1, 2 ORDER BY Timeline, StateSequence
    """,
    doc="KQL funnel_sequence_completion plugin (round 8): per "
    "funnel-START day and sequence prefix (view -> click -> "
    "purchase), distinct users whose earliest-completion prefix "
    "finished within its max window (1d/3d/7d from the first step). "
    "Engine shape: L-1 id-keyed aggregate-join rounds, no global "
    "window; the oracle hand-unrolls the same earliest-completion "
    "recurrence",
)
def kql_funnel_completion(spark, sf_dir):
    return kql(
        spark,
        """
        events
        | evaluate funnel_sequence_completion(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), 1d,
            event_type, dynamic(['view', 'click', 'purchase']),
            dynamic(['1d', '3d', '7d']))
        | order by Timeline asc, StateSequence asc
        """,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "kql_basket",
    """
    WITH src AS (
      SELECT o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey <= 30000
    ),
    agg AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p,
             COUNT(*) AS cnt,
             GROUPING(o_orderstatus) AS gs,
             GROUPING(o_orderpriority) AS gp
      FROM src
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                              (o_orderstatus, o_orderpriority), ())
    ),
    tot AS (SELECT cnt AS t FROM agg WHERE gs = 1 AND gp = 1),
    pat AS (
      SELECT s, p, cnt FROM agg, tot
      WHERE NOT (gs = 1 AND gp = 1)
        AND (gs = 1 OR s IS NOT NULL)
        AND (gp = 1 OR p IS NOT NULL)
        AND cnt >= t * 0.05
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC,
                 s ASC NULLS LAST, p ASC NULLS LAST) - 1 AS INT)
               AS SegmentId,
           CAST(cnt AS BIGINT) AS Count,
           ROUND(cnt * 100.0 / (SELECT t FROM tot), 2) AS Percent,
           s AS o_orderstatus, p AS o_orderpriority
    FROM pat ORDER BY SegmentId
    """,
    doc="KQL basket plugin (round 8): frequent attribute patterns "
    "(Apriori's output) over order status x priority at the default "
    "0.05 threshold — one CUBE-style grouping-sets pass, threshold "
    "and ranking on the tiny pattern table; null attribute = "
    "wildcard.  Oracle re-derives the identical lattice in DuckDB",
)
def kql_basket(spark, sf_dir):
    return kql(
        spark,
        """
        orders
        | where o_orderkey <= 30000
        | project o_orderstatus, o_orderpriority
        | evaluate basket()
        | order by SegmentId asc
        """,
        tables=_tables(spark, sf_dir, "orders"),
    )
