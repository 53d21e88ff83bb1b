"""Round-13: explicit resource lifecycle + _concurrent_stage invariant.

1. The DV-descriptor ``sc.broadcast`` dict built per DV DML
   (`_old_dv_desc_df`) is DESTROYED as soon as `_pack_merged_dvs`'s
   collect — its only consumer — returns: repeated DML on a
   heavily-DV'd table must not accrue broadcast blocks between driver
   GCs (r12 VERDICT item 6 / ADVICE).
2. Many DML commits in ONE session leave no cached RDDs behind
   (`matched.persist()` is released in the DML's ``finally``).
3. `_concurrent_stage`'s thread-safety rests on the invariant that NO
   sink staging code sets job groups / local properties (those are
   thread-local and would silently race across the staging pool).
   This test FAILS if anyone adds such a call (r12 VERDICT item 7).
"""

from __future__ import annotations

import pyspark
import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def _dv_table(spark, path, rows=40):
    """A small table that already carries deletion vectors (so every
    subsequent DV DML builds a descriptor broadcast)."""
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql(
            f"select id, cast(id as double) as v from range({rows})"
        ).coalesce(2)
    )
    sink.delete_dv("id % 10 = 0")  # seed DVs on both files
    return sink


def test_dv_descriptor_broadcast_destroyed_after_dml(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "bc")
    sink = _dv_table(spark, path)

    captured = []
    orig = DeltaSink._old_dv_desc_df

    def spy(self, files):
        out = orig(self, files)
        if isinstance(out, pyspark.broadcast.Broadcast):
            captured.append(out)
        return out

    monkeypatch.setattr(DeltaSink, "_old_dv_desc_df", spy)
    sink.update_dv("id % 10 = 1", {"v": "v + 100"})
    sink.delete_dv("id % 10 = 2")
    assert len(captured) == 2  # both DMLs saw existing DVs
    for bc in captured:
        # private[spark] isValid is public in bytecode; False once the
        # pack's finally destroyed the broadcast
        assert bc._jbroadcast.isValid() is False
    # ...and the table still reads correctly after the destroys
    vals = sorted(
        r.id for r in DL.read_snapshot(spark, path).collect()
    )
    assert vals == [
        i for i in range(40) if i % 10 not in (0, 2)
    ]


def test_no_cache_or_broadcast_accrual_across_dml_commits(
    spark, tmp_path, monkeypatch
):
    """40 DV DML commits in one session: zero persisted RDDs remain
    and every descriptor broadcast is destroyed (linear accrual would
    show after the very first commit; 40 commits pin the property)."""
    path = str(tmp_path / "accrual")
    sink = _dv_table(spark, path, rows=400)
    # session is shared across the suite: other tests may hold their
    # own persists — assert NO GROWTH, not absolute zero
    rdds_before = spark.sparkContext._jsc.getPersistentRDDs().size()

    captured = []
    orig = DeltaSink._old_dv_desc_df

    def spy(self, files):
        out = orig(self, files)
        if isinstance(out, pyspark.broadcast.Broadcast):
            captured.append(out)
        return out

    monkeypatch.setattr(DeltaSink, "_old_dv_desc_df", spy)
    for i in range(40):
        if i % 2 == 0:
            sink.delete_dv(f"id = {i * 7 + 1}")
        else:
            sink.update_dv(f"id = {i * 7 + 2}", {"v": "v + 1"})
    assert len(captured) == 40
    assert all(bc._jbroadcast.isValid() is False for bc in captured)
    # no DML leaves a persisted RDD behind (matched.persist is
    # released in the finally; nothing else persists)
    rdds_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert rdds_after <= rdds_before


def test_concurrent_stage_sets_no_jobgroup_or_local_properties(
    spark, tmp_path, monkeypatch
):
    """Staging thunks run on a plain thread pool; job groups / local
    properties / job descriptions are JVM-thread-local, so ANY such
    call inside sink DML could cross-tag or cancel a sibling staging
    job.  Nothing in the sink sets them today — pin that."""
    calls = []
    sc_cls = type(spark.sparkContext)
    for name in (
        "setJobGroup",
        "setLocalProperty",
        "setJobDescription",
        "setInterruptOnCancel",
    ):
        orig = getattr(sc_cls, name)

        def spy(self, *a, _n=name, _o=orig, **kw):
            calls.append((_n, a))
            return _o(self, *a, **kw)

        monkeypatch.setattr(sc_cls, name, spy)

    import pyspark.sql.functions as F

    path = str(tmp_path / "inv")
    sink = DeltaSink(spark, path)
    sink.append(
        spark.sql(
            "select id, cast(id as double) as v from range(30)"
        ).coalesce(2)
    )
    # CDF on -> every DML below stages change data concurrently with
    # its rewrites/appends, exercising the full _concurrent_stage fan
    sink.set_properties({"delta.enableChangeDataFeed": "true"})
    # copy-on-write paths (delete/update/merge) — all _concurrent_stage
    sink.update("id < 5", {"v": "v + 1"})
    sink.merge(
        spark.sql(
            "select id, cast(id as double) as v from range(25, 35)"
        ),
        ["id"],
    )
    sink.delete("id >= 33")
    # merge-on-read paths
    sink.update_dv("id < 3", {"v": "v + 1"})
    sink.delete_dv("id = 7")
    assert calls == [], (
        "sink DML set thread-local scheduler properties — this races "
        f"across _concurrent_stage's pool: {calls}"
    )
    n = DL.read_snapshot(spark, path).count()
    assert n == 32  # 30 + 5 inserts (30-34) - 2 deleted (33,34) - 1 (id=7)


def test_concurrent_stage_fails_fast_and_unstages_siblings(
    spark, tmp_path
):
    """When one staging thunk raises, _concurrent_stage must (a)
    propagate that exception, (b) cancel queued thunks instead of
    running the whole fan to completion, and (c) best-effort remove
    files already staged by completed siblings — they were moved into
    the table dir and the failed commit will never reference them
    (r12 ADVICE)."""
    import os
    import time as _time

    path = str(tmp_path / "failfast")
    os.makedirs(path)
    sink = DeltaSink(spark, path)

    staged_rel = "part-deadbeef.snappy.parquet"
    staged_abs = os.path.join(path, staged_rel)
    ran = [False] * 5

    def ok_thunk():
        ran[1] = True
        with open(staged_abs, "w") as f:
            f.write("orphan")
        _time.sleep(1.0)  # keep a worker busy past the failure
        return [{"add": {"path": staged_rel}}]

    def slow_ok():
        ran[2] = True
        _time.sleep(1.0)
        return []

    def boom():
        ran[0] = True
        _time.sleep(0.3)  # let the in-flight siblings start first
        raise RuntimeError("staging job died")

    def queued(i):
        def t():
            ran[i] = True
            return []

        return t

    with pytest.raises(RuntimeError, match="staging job died"):
        # 3 workers: boom/ok/slow_ok start at once; 3 and 4 are queued
        # and must be cancelled once boom surfaces
        sink._concurrent_stage(
            [boom, ok_thunk, slow_ok, queued(3), queued(4)]
        )
    assert ran[0] and ran[1] and ran[2]
    assert not ran[3] and not ran[4], (
        "queued staging thunks ran after a sibling already failed"
    )
    assert not os.path.exists(staged_abs), (
        "completed sibling's staged file was not cleaned up"
    )
    # success path unchanged: results come back in thunk order
    out = sink._concurrent_stage(
        [lambda: ["a"], lambda: ["b"], lambda: ["c"], lambda: ["d"]]
    )
    assert out == [["a"], ["b"], ["c"], ["d"]]
