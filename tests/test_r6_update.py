"""Round-6: ``DeltaSink.update`` — copy-on-write UPDATE ... SET.

Rewrites only the files containing matching rows; all assignment
right-hand sides see the PRE-update row (SQL semantics); generated
columns recompute; CHECK constraints re-validate before any rewrite;
CDF stages update_preimage/update_postimage pairs; row tracking keeps
every row's id and moves updated rows' commit version to the UPDATE's
commit.  The reference never updates in place (K6 is delete-only,
DeltaTableOrchestration.cs:85-133).
"""

from __future__ import annotations

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def test_update_basic_and_file_scoping(spark, tmp_path):
    path = str(tmp_path / "u")
    sink = DeltaSink(spark, path, partition_by=["p"])
    sink.append(
        spark.sql(
            "select id, id % 2 as p, cast(id as double) as v from range(10)"
        )
    )
    sink.update("id >= 6", {"v": "v * 10 + id"})
    rows = sorted((r.id, r.v) for r in DL.read_snapshot(spark, path).collect())
    assert rows == [
        (i, float(i * 11) if i >= 6 else float(i)) for i in range(10)
    ]
    # a no-match update writes no commit
    head = DL.list_commit_versions(path)[-1]
    sink.update("id > 1000", {"v": "0.0"})
    assert DL.list_commit_versions(path)[-1] == head


def test_update_rhs_sees_pre_update_row(spark, tmp_path):
    """UPDATE SET a=b, b=a must SWAP, not cascade."""
    path = str(tmp_path / "uswap")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select 1 as a, 2 as b"))
    sink.update("a = 1", {"a": "b", "b": "a"})
    r = DL.read_snapshot(spark, path).collect()[0]
    assert (r.a, r.b) == (2, 1)


def test_update_refusals(spark, tmp_path):
    path = str(tmp_path / "uref")
    sink = DeltaSink(spark, path, partition_by=["p"])
    sink.append(spark.sql("select id, id % 2 as p from range(4)"))
    with pytest.raises(ValueError, match="partition column"):
        sink.update("id = 1", {"p": "5"})
    with pytest.raises(ValueError, match="unknown column"):
        sink.update("id = 1", {"nope": "5"})


def test_update_generated_columns_recompute(spark, tmp_path):
    path = str(tmp_path / "ugen")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as double) as v from range(4)"))
    sink.add_generated_column("v2", "double", "v * 2")
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(10, 12)")
    )
    with pytest.raises(ValueError, match="generated"):
        sink.update("id = 10", {"v2": "99.0"})
    sink.update("id = 10", {"v": "100.0"})
    got = {
        r.id: (r.v, r.v2)
        for r in DL.read_snapshot(spark, path).filter("id >= 10").collect()
    }
    assert got[10] == (100.0, 200.0)   # recomputed from the NEW v
    assert got[11] == (11.0, 22.0)


def test_update_check_constraint_blocks(spark, tmp_path):
    path = str(tmp_path / "uchk")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id+1 as long) as v from range(4)"))
    sink.add_constraint("pos", "v > 0")
    head = DL.list_commit_versions(path)[-1]
    with pytest.raises(ValueError, match="CHECK constraint"):
        sink.update("id = 2", {"v": "-5"})
    # nothing committed, nothing rewritten
    assert DL.list_commit_versions(path)[-1] == head
    assert sorted(
        r.v for r in DL.read_snapshot(spark, path).collect()
    ) == [1, 2, 3, 4]


def test_update_cdf_pre_and_postimage(spark, tmp_path):
    path = str(tmp_path / "ucdf")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as long) as v from range(6)"))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    vu = sink.update("id >= 4", {"v": "v + 100"})
    ch = DL.read_changes(spark, path, vu - 1).filter(
        f"_commit_version = {vu}"
    )
    got = sorted((r.id, r.v, r._change_type) for r in ch.collect())
    assert got == [
        (4, 4, "update_preimage"),
        (4, 104, "update_postimage"),
        (5, 5, "update_preimage"),
        (5, 105, "update_postimage"),
    ]


def test_update_preserves_row_ids_and_bumps_rcv(spark, tmp_path):
    path = str(tmp_path / "urt")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as long) as v from range(6)"))
    sink.set_properties({"delta.enableRowTracking": "true"})
    before = {
        r.id: r._row_id
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }
    vu = sink.update("id >= 4", {"v": "v + 100"})
    after = {
        r.id: (r._row_id, r._row_commit_version)
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }
    assert all(after[i][0] == before[i] for i in range(6))  # ids stable
    assert all(after[i][1] == vu for i in (4, 5))  # updated rows -> vu
    assert all(after[i][1] != vu for i in range(4))  # untouched keep
