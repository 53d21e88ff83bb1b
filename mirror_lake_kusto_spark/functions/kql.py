"""KQL-flavored fluent facade over DataFrames.

The reference's entire query capability is *emitted KQL strings*
executed by Kusto (SURVEY §0.3) — `project`, `extend`, `where`,
`summarize … by`, `arg_max`, `order by`, `count`, `take`, `union`,
`externaldata`.  This module reifies that surface as a thin wrapper so
a reference user can express the same pipelines verbatim; every verb
lowers to the equivalent DataFrame op (declared in SURVEY §2's "Spark
mapping" column) and therefore optimizes through Catalyst like any
other plan — the facade adds zero execution machinery.

    KqlFrame(df).where("l_returnflag == 'R'")
                .extend(net="l_extendedprice * (1 - l_discount)")
                .summarize(by=["l_orderkey"], revenue="sum(net)")
                .order_by("revenue desc")
                .take(10)

Verb ↔ reference citation:
  project   BlobStagingOrchestration.cs:331 (B1)
  extend    BlobAnalysisOrchestration.cs:215 (B2)
  where     DeltaTableOrchestration.cs:234 (B3-B6)
  summarize BlobStagingOrchestration.cs:218-223 (D2)
  arg_max   Kusto/DatabaseGateway.cs:93 (D3)
  order by  DatabaseGateway.cs:94 (F1)
  count     DeltaTableOrchestration.cs:233-235 (D1)
  union     BlobAnalysisOrchestration.cs:214 (G1)
  take      (engine extension; Kusto built-in)
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _expr(e: "str | Column") -> Column:
    if isinstance(e, Column):
        return e
    # KQL uses ==; Spark SQL accepts = / ==; KQL 'and'/'or' are
    # lowercase like SQL.  The only rewrite needed is KQL's != / == on
    # strings with single quotes, which F.expr already accepts.
    return F.expr(e)


class KqlFrame:
    """Immutable fluent wrapper; ``.df`` unwraps to the DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- row ops ------------------------------------------------------------

    def where(self, predicate: "str | Column") -> "KqlFrame":
        return KqlFrame(self.df.filter(_expr(predicate)))

    def project(self, *cols: "str | Column", **renamed: "str | Column") -> "KqlFrame":
        """``project a, b, c=expr`` — selection + rename + computed."""
        sel = [F.col(c) if isinstance(c, str) else c for c in cols]
        sel += [_expr(e).alias(name) for name, e in renamed.items()]
        return KqlFrame(self.df.select(*sel))

    def project_away(self, *cols: str) -> "KqlFrame":
        return KqlFrame(self.df.drop(*cols))

    def extend(self, **exprs: "str | Column") -> "KqlFrame":
        out = self.df
        for name, e in exprs.items():
            out = out.withColumn(name, _expr(e))
        return KqlFrame(out)

    # -- aggregation --------------------------------------------------------

    def summarize(
        self, by: Iterable[str] = (), **aggs: "str | Column"
    ) -> "KqlFrame":
        """``summarize agg1=expr, … by k1, k2``; with no aggregates this
        is distinct grouping (D2)."""
        by = list(by)
        if not aggs:
            return KqlFrame(self.df.select(*by).distinct())
        cols = [_expr(e).alias(name) for name, e in aggs.items()]
        if by:
            return KqlFrame(self.df.groupBy(*by).agg(*cols))
        return KqlFrame(self.df.agg(*cols))

    def arg_max(self, arg: str, by: Iterable[str]) -> "KqlFrame":
        """``arg_max(arg, *) by k…`` — latest row per key (D3): lowered
        to groupBy + max_by(struct(*)) — single shuffle, no window sort
        (the plan test pins this)."""
        by = list(by)
        others = [c for c in self.df.columns if c not in by]
        packed = (
            self.df.groupBy(*by)
            .agg(F.max_by(F.struct(*others), F.col(arg)).alias("_m"))
        )
        return KqlFrame(packed.select(*by, *[F.col(f"_m.{c}").alias(c) for c in others]))

    def count(self) -> "KqlFrame":
        return KqlFrame(self.df.agg(F.count("*").alias("count_")))

    # -- ordering / limiting ------------------------------------------------

    _ORD = re.compile(r"^\s*(\S+)\s*(asc|desc)?\s*$", re.IGNORECASE)

    def order_by(self, *specs: str) -> "KqlFrame":
        cols = []
        for s in specs:
            m = self._ORD.match(s)
            name, direction = m.group(1), (m.group(2) or "asc").lower()
            cols.append(F.col(name).desc() if direction == "desc" else F.col(name).asc())
        return KqlFrame(self.df.orderBy(*cols))

    # KQL `sort by` is an alias of `order by`
    sort_by = order_by

    def distinct(self, *cols: str) -> "KqlFrame":
        """``distinct *`` / ``distinct c1, c2`` (KQL distinct)."""
        if cols:
            return KqlFrame(self.df.select(*cols).distinct())
        return KqlFrame(self.df.distinct())

    def mv_expand(
        self,
        col: str,
        alias: str | None = None,
        index_alias: str | None = None,
    ) -> "KqlFrame":
        """``mv-expand [with_itemindex=ix] col`` / ``mv-expand alias =
        col`` — one output row per array element (explode_outer:
        empty/null arrays keep a row with null, KQL parity).  The
        element replaces the array; ``with_itemindex`` adds the
        0-based element index (posexplode, null arrays index -1 is
        Kusto's shape for the kept row — here the index is null,
        documented deviation)."""
        if index_alias is None:
            out = self.df.withColumn(
                alias or col, F.explode_outer(F.col(col))
            )
            if alias is not None and alias != col:
                out = out.drop(col)
            return KqlFrame(out)
        exploded = self.df.select(
            *[F.col(c) for c in self.df.columns],
            F.posexplode_outer(F.col(col)).alias(
                index_alias, "__mlk_elem"
            ),
        )
        target = alias or col
        out = exploded.withColumn(target, F.col("__mlk_elem")).drop(
            "__mlk_elem"
        )
        if alias is not None and alias != col:
            out = out.drop(col)
        return KqlFrame(out)

    def where_has(self, col: str, term: str) -> "KqlFrame":
        """KQL ``col has 'term'`` — whole-term, case-insensitive match
        (term boundaries, not substring; B6 in the reference's emitted
        KQL, Kusto/KustoClusterGateway.cs:73)."""
        import re as _re

        pat = r"(?i)(^|[^a-z0-9_])" + _re.escape(term) + r"($|[^a-z0-9_])"
        return KqlFrame(self.df.filter(F.col(col).rlike(pat)))

    def take(self, n: int) -> "KqlFrame":
        return KqlFrame(self.df.limit(n))

    def top(self, n: int, by: str) -> "KqlFrame":
        """``top n by col [desc]`` — lowers to orderBy+limit, which
        Spark executes as TakeOrderedAndProject (no global sort)."""
        return self.order_by(by if " " in by else f"{by} desc").take(n)

    # -- multi-table --------------------------------------------------------

    def union(self, *others: "KqlFrame") -> "KqlFrame":
        out = self.df
        for o in others:
            out = out.unionByName(o.df, allowMissingColumns=True)
        return KqlFrame(out)

    def join(
        self, other: "KqlFrame", on: Iterable[str], kind: str = "inner"
    ) -> "KqlFrame":
        """KQL join kinds -> Spark.  ``innerunique`` (Kusto's default)
        deduplicates the LEFT side to one row per key before the inner
        join — Kusto keeps an arbitrary left row per key, mirrored here
        by dropDuplicates.  ``rightsemi``/``rightanti`` (no native
        Spark twin) swap sides and run the left_ variant; output
        columns are the right table's, as in Kusto."""
        on = list(on)
        kusto_to_spark = {
            "inner": "inner",
            "leftouter": "left",
            "rightouter": "right",
            "fullouter": "full",
            "leftsemi": "left_semi",
            "leftanti": "left_anti",
            "anti": "left_anti",
        }
        if kind == "innerunique":
            return KqlFrame(
                self.df.dropDuplicates(on).join(other.df, on, "inner")
            )
        if kind in ("rightsemi", "rightanti"):
            return KqlFrame(
                other.df.join(
                    self.df, on, "left_semi" if kind == "rightsemi" else "left_anti"
                )
            )
        return KqlFrame(self.df.join(other.df, on, kusto_to_spark[kind]))

    # -- terminal -----------------------------------------------------------

    def to_df(self) -> DataFrame:
        return self.df

    def collect(self):
        return self.df.collect()
