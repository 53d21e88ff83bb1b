"""The engine's named-query registry — SURVEY.md §2's operator inventory
(and the north-star extensions) as executable, oracle-checked queries.

Every entry is a ``Query``: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` plus (where SQL-expressible) an equivalent ANSI-SQL string a
DuckDB oracle runs on the same parquet tables.  ``__spark_entry__.py``
exposes this registry to the driver.
"""

from __future__ import annotations

from .base import Query, registry


def all_queries() -> dict[str, Query]:
    # Import for side effects: each module registers its queries.
    from . import extensions, mirror, relational, streaming, tpch  # noqa: F401

    return dict(registry)
