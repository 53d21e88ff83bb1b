from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

registry: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    """One named, testable operator/query from SURVEY.md §2 (or §7 ext).

    ``oracle`` is the DuckDB-runnable ANSI SQL producing the same result
    on the same parquet tables (column names must match exactly — the
    driver's compare sorts columns by name and hashes values).  ``None``
    means not SQL-expressible: the driver records a rows-only check.
    """

    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


def query(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as Query ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in registry:
            raise ValueError(f"duplicate query name {name!r}")
        registry[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap
