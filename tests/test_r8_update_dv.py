"""Round-8: ``DeltaSink.update_dv`` — merge-on-read UPDATE ... SET.

Matched rows join each affected file's deletion vector; post-update
rows append as new files.  Semantics contract = tests/test_r6_update.py
(copy-on-write ``update``): RHS sees the PRE-update row, generated
columns recompute, CHECK constraints re-validate before anything
lands, CDF stages update_preimage/update_postimage, row tracking keeps
ids and moves updated rows' commit version.  Scale contract on top:
the touched data files are NOT rewritten (same path re-added with a
DV), rows already deletion-vectored never match, and REORG purges the
update DVs like any other.
"""

from __future__ import annotations

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _snap_files(path):
    return {
        f["path"]: f
        for f in DL.snapshot_files.__wrapped__(None, path)
    } if hasattr(DL.snapshot_files, "__wrapped__") else None


def test_update_dv_basic_values_and_no_rewrite(spark, tmp_path):
    """Values match copy-on-write UPDATE, and the touched file is
    re-added UNDER ITS OWN PATH with a deletion vector — the bytes of
    the original file are never rewritten (the 100 TB contract)."""
    path = str(tmp_path / "u")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql(
            "select id, cast(id as double) as v from range(10)"
        ).coalesce(1)
    )
    before = {
        f["path"]: f["size"]
        for f in DL.snapshot_files(spark, path)
    }
    assert len(before) == 1
    (orig_path, orig_size), = before.items()
    sink.update_dv("id >= 6", {"v": "v * 10 + id"})
    rows = sorted((r.id, r.v) for r in DL.read_snapshot(spark, path).collect())
    assert rows == [
        (i, float(i * 11) if i >= 6 else float(i)) for i in range(10)
    ]
    after = {f["path"]: f for f in DL.snapshot_files(spark, path)}
    # original file survives byte-identical, now carrying a DV of the
    # 4 updated rows; plus one new (small) add with the updated rows
    assert orig_path in after
    assert after[orig_path]["size"] == orig_size
    assert after[orig_path]["deletionVector"]["cardinality"] == 4
    assert len(after) == 2


def test_update_dv_no_match_writes_no_commit(spark, tmp_path):
    path = str(tmp_path / "unm")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as double) as v from range(4)"))
    head = DL.list_commit_versions(path)[-1]
    sink.update_dv("id > 1000", {"v": "0.0"})
    assert DL.list_commit_versions(path)[-1] == head


def test_update_dv_rhs_sees_pre_update_row(spark, tmp_path):
    """UPDATE SET a=b, b=a must SWAP, not cascade."""
    path = str(tmp_path / "uswap")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select 1 as a, 2 as b"))
    sink.update_dv("a = 1", {"a": "b", "b": "a"})
    r = DL.read_snapshot(spark, path).collect()[0]
    assert (r.a, r.b) == (2, 1)


def test_update_dv_refusals(spark, tmp_path):
    path = str(tmp_path / "uref")
    sink = DeltaSink(spark, path, partition_by=["p"])
    sink.append(spark.sql("select id, id % 2 as p from range(4)"))
    with pytest.raises(ValueError, match="partition column"):
        sink.update_dv("id = 1", {"p": "5"})
    with pytest.raises(ValueError, match="unknown column"):
        sink.update_dv("id = 1", {"nope": "5"})


def test_update_dv_partitioned_scoping(spark, tmp_path):
    """Only the matching partition's files gain DVs; postimage rows
    land back in their own partition directories."""
    path = str(tmp_path / "upart")
    sink = DeltaSink(spark, path, partition_by=["p"])
    sink.append(
        spark.sql(
            "select id, id % 2 as p, cast(id as double) as v from range(10)"
        ).coalesce(1)  # one multi-row file per partition dir
    )
    sink.update_dv("p = 1 and id >= 5", {"v": "v + 100.0"})
    got = {r.id: (r.p, r.v) for r in DL.read_snapshot(spark, path).collect()}
    for i in range(10):
        expect_v = float(i + 100) if (i % 2 == 1 and i >= 5) else float(i)
        assert got[i] == (i % 2, expect_v)
    dvd = [
        f for f in DL.snapshot_files(spark, path)
        if (f.get("deletionVector") or {}).get("cardinality")
    ]
    assert dvd and all(f["partitionValues"] == {"p": "1"} for f in dvd)


def test_update_dv_already_deleted_rows_never_match(spark, tmp_path):
    """A row in an existing deletion vector is logically gone: it must
    not resurrect as a postimage."""
    path = str(tmp_path / "udead")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(8)")
        .coalesce(1)
    )
    sink.delete_dv("id < 3")
    sink.update_dv("id < 6", {"v": "v + 100.0"})
    rows = sorted((r.id, r.v) for r in DL.read_snapshot(spark, path).collect())
    assert rows == [
        (3, 103.0), (4, 104.0), (5, 105.0), (6, 6.0), (7, 7.0)
    ]


def test_update_dv_twice_merges_vectors(spark, tmp_path):
    path = str(tmp_path / "utwice")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(6)")
        .coalesce(1)
    )
    sink.update_dv("id = 0", {"v": "100.0"})
    sink.update_dv("id = 1", {"v": "200.0"})
    rows = sorted((r.id, r.v) for r in DL.read_snapshot(spark, path).collect())
    assert rows == [
        (0, 100.0), (1, 200.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0)
    ]


def test_update_dv_full_file_becomes_plain_remove(spark, tmp_path):
    """Every live row of a file updated -> the file is plainly removed
    (a DV covering 100% of rows is log churn)."""
    path = str(tmp_path / "ufull")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(4)")
        .coalesce(1)
    )
    sink.update_dv("id >= 0", {"v": "v + 1.0"})
    files = DL.snapshot_files(spark, path)
    assert all(
        not (f.get("deletionVector") or {}).get("cardinality")
        for f in files
    )
    rows = sorted(r.v for r in DL.read_snapshot(spark, path).collect())
    assert rows == [1.0, 2.0, 3.0, 4.0]


def test_update_dv_generated_columns_recompute(spark, tmp_path):
    path = str(tmp_path / "ugen")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as double) as v from range(4)"))
    sink.add_generated_column("v2", "double", "v * 2")
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(10, 12)")
    )
    with pytest.raises(ValueError, match="generated"):
        sink.update_dv("id = 10", {"v2": "99.0"})
    sink.update_dv("id = 10", {"v": "100.0"})
    got = {
        r.id: (r.v, r.v2)
        for r in DL.read_snapshot(spark, path).filter("id >= 10").collect()
    }
    assert got[10] == (100.0, 200.0)
    assert got[11] == (11.0, 22.0)


def test_update_dv_check_constraint_blocks(spark, tmp_path):
    path = str(tmp_path / "uchk")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id+1 as long) as v from range(4)"))
    sink.add_constraint("pos", "v > 0")
    head = DL.list_commit_versions(path)[-1]
    with pytest.raises(ValueError, match="CHECK constraint"):
        sink.update_dv("id = 2", {"v": "-5"})
    assert DL.list_commit_versions(path)[-1] == head
    assert sorted(
        r.v for r in DL.read_snapshot(spark, path).collect()
    ) == [1, 2, 3, 4]


def test_update_dv_cdf_pre_and_postimage(spark, tmp_path):
    path = str(tmp_path / "ucdf")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as long) as v from range(6)"))
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    vu = sink.update_dv("id >= 4", {"v": "v + 100"})
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


def test_update_dv_preserves_row_ids_and_bumps_rcv(spark, tmp_path):
    path = str(tmp_path / "urt")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as long) as v from range(6)"))
    sink.set_properties({"delta.enableRowTracking": "true"})
    before = {
        r.id: r._row_id
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }
    vu = sink.update_dv("id >= 4", {"v": "v + 100"})
    after = {
        r.id: (r._row_id, r._row_commit_version)
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }
    assert all(after[i][0] == before[i] for i in range(6))  # ids stable
    assert all(after[i][1] == vu for i in (4, 5))  # updated -> vu
    assert all(after[i][1] != vu for i in range(4))  # untouched keep


def test_update_dv_then_reorg_purges(spark, tmp_path):
    """REORG APPLY PURGE materializes update DVs like delete DVs: the
    vectors disappear, values survive, and copy-on-write paths work
    again."""
    path = str(tmp_path / "ureorg")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(10)")
        .coalesce(1)
    )
    sink.update_dv("id >= 6", {"v": "v + 100.0"})
    assert any(
        (f.get("deletionVector") or {}).get("cardinality")
        for f in DL.snapshot_files(spark, path)
    )
    sink.reorg()
    assert not any(
        (f.get("deletionVector") or {}).get("cardinality")
        for f in DL.snapshot_files(spark, path)
    )
    rows = sorted((r.id, r.v) for r in DL.read_snapshot(spark, path).collect())
    assert rows == [
        (i, float(i + 100) if i >= 6 else float(i)) for i in range(10)
    ]
    sink.delete("id = 0")  # copy-on-write works again post-purge
    assert sorted(
        r.id for r in DL.read_snapshot(spark, path).collect()
    ) == list(range(1, 10))


# -- merge_dv: DV-writing MERGE ----------------------------------------------


def test_merge_dv_upsert_values_and_no_rewrite(spark, tmp_path):
    path = str(tmp_path / "m")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(8)")
        .coalesce(1)
    )
    (orig_path,) = [f["path"] for f in DL.snapshot_files(spark, path)]
    src = spark.sql(
        "select id, cast(id * 100 as double) as v from range(6, 10)"
    )
    sink.merge_dv(src, ["id"])
    rows = sorted((r.id, r.v) for r in DL.read_snapshot(spark, path).collect())
    assert rows == [
        (i, float(i * 100) if i >= 6 else float(i)) for i in range(10)
    ]
    after = {f["path"]: f for f in DL.snapshot_files(spark, path)}
    # original file survives with a DV of the 2 matched rows (6, 7)
    assert after[orig_path]["deletionVector"]["cardinality"] == 2


def test_merge_dv_duplicate_source_keys_raise(spark, tmp_path):
    path = str(tmp_path / "mdup")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as double) as v from range(4)"))
    dup = spark.sql(
        "select cast(1 as long) as id, cast(9 as double) as v "
        "union all select cast(1 as long), cast(8 as double)"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        sink.merge_dv(dup, ["id"])


def test_merge_dv_delete_keys(spark, tmp_path):
    path = str(tmp_path / "mdel")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(6)")
        .coalesce(1)
    )
    src = spark.sql("select cast(0 as long) as id, cast(50 as double) as v")
    dels = spark.sql("select cast(5 as long) as id")
    sink.merge_dv(src, ["id"], delete_keys=dels)
    rows = sorted((r.id, r.v) for r in DL.read_snapshot(spark, path).collect())
    assert rows == [(0, 50.0), (1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]


def test_merge_dv_dead_rows_insert_instead_of_match(spark, tmp_path):
    """A key whose only target row is already deletion-vectored is NOT
    matched: the source row inserts (the DV'd row stays logically
    gone, no resurrection double-count)."""
    path = str(tmp_path / "mdead")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as double) as v from range(4)")
        .coalesce(1)
    )
    sink.delete_dv("id = 2")
    src = spark.sql("select cast(2 as long) as id, cast(99 as double) as v")
    sink.merge_dv(src, ["id"])
    rows = sorted((r.id, r.v) for r in DL.read_snapshot(spark, path).collect())
    assert rows == [(0, 0.0), (1, 1.0), (2, 99.0), (3, 3.0)]


def test_merge_dv_cdf_change_types(spark, tmp_path):
    path = str(tmp_path / "mcdf")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as long) as v from range(4)")
        .coalesce(1)
    )
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    src = spark.sql(
        "select id, cast(id + 100 as long) as v from range(3, 6)"
    )
    dels = spark.sql("select cast(0 as long) as id")
    vm = sink.merge_dv(src, ["id"], delete_keys=dels)
    ch = DL.read_changes(spark, path, vm - 1).filter(
        f"_commit_version = {vm}"
    )
    got = sorted((r.id, r.v, r._change_type) for r in ch.collect())
    assert got == [
        (0, 0, "delete"),
        (3, 3, "update_preimage"),
        (3, 103, "update_postimage"),
        (4, 104, "insert"),
        (5, 105, "insert"),
    ]


def test_merge_dv_row_tracking(spark, tmp_path):
    path = str(tmp_path / "mrt")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql("select id, cast(id as long) as v from range(4)")
        .coalesce(1)
    )
    sink.set_properties({"delta.enableRowTracking": "true"})
    before = {
        r.id: r._row_id
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }
    src = spark.sql("select id, cast(id + 100 as long) as v from range(2, 6)")
    vm = sink.merge_dv(src, ["id"])
    after = {
        r.id: (r._row_id, r._row_commit_version)
        for r in DL.read_snapshot(spark, path, row_ids=True).collect()
    }
    # updated rows (2, 3) keep their ids and move to this commit;
    # inserts (4, 5) mint fresh ids
    assert after[2][0] == before[2] and after[3][0] == before[3]
    assert after[2][1] == vm and after[3][1] == vm
    assert after[0][0] == before[0] and after[0][1] != vm
    fresh = {after[4][0], after[5][0]}
    assert fresh.isdisjoint(set(before.values()))


def test_merge_dv_txn_idempotence(spark, tmp_path):
    path = str(tmp_path / "mtxn")
    sink = DeltaSink(spark, path)
    sink.append(spark.sql("select id, cast(id as double) as v from range(4)"))
    src = spark.sql("select cast(1 as long) as id, cast(9 as double) as v")
    sink.merge_dv(src, ["id"], txn=("app", 7))
    assert DL.last_txn_version(spark, path, "app") == 7
