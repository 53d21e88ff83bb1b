"""Every registry query vs the DuckDB oracle at sf0.001 (fast smoke of
the same comparison the driver runs at sf0.01): row count, column set,
order-insensitive value hash."""

from __future__ import annotations

import pytest

from mirror_lake_kusto_spark.queries import all_queries
from tests.conftest import SF_DIR
from tools.verify_local import value_hash

REGISTRY = all_queries()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if q.oracle is None:
        # rows-only contract: runs and returns a stable schema
        assert isinstance(scols, list) and scols
        return
    cur = duck.execute(q.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), f"rowcount spark={len(srows)} duck={len(orows)}"
    assert sorted(scols) == sorted(ocols)
    sh = value_hash(scols, [[r[c] for c in scols] for r in srows])
    oh = value_hash(ocols, orows)
    assert sh == oh, "value-hash mismatch"
