"""Round-12 pins for the round-11 ADVICE.md findings.

1. prior_dv_descs' fail-loud posture is SYMMETRIC: when an older
   checkpoint exists but neither it nor the retained JSON witnesses a
   removed path's add, the leftover path raises the same ValueError
   the no-older-checkpoint branch does (it used to silently default to
   None — the full-bitmap-retract hazard).
2. UC conflict classification is structural: HTTP 409 or an error_code
   naming the conflict; free-text "already"/"conflict" in a 4xx body
   is a validation failure, and a 2xx with an error payload or a
   contradicting latest_table_version is not ratification (pinned in
   test_r11_review.py::test_uc_5xx_conflict_body_is_not_commit_conflict).
3. _partial_topk (argpartition + tie-widened lexsort) is byte-identical
   to the full np.lexsort((cids, -col))[:k] it replaced, at
   O(n + t log t) instead of O(n log n).
4. register_source propagates genuine registration failures instead of
   swallowing them behind "already registered".
"""

import json
import os

import numpy as np
import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


# ----------------------- 1: symmetric fail-loud past an older checkpoint


def test_prior_dv_descs_raises_when_older_checkpoint_lacks_witness(
    spark, tmp_path
):
    path = str(tmp_path / "nowit")
    s = DeltaSink(spark, path, checkpoint_interval=2)
    s.append(spark.range(10).toDF("n").coalesce(1))  # v0
    s.delete_dv("n = 1")                             # v1: rewrite + ckpt@1
    s.delete_dv("n = 3")                             # v2: rewrite
    log = os.path.join(path, "_delta_log")
    for v in (0, 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    # a path witnessed by checkpoint@1 still resolves (control) ...
    acts = [json.loads(l) for l in open(os.path.join(log, f"{2:020d}.json"))]
    rewritten = next(a["add"]["path"] for a in acts if a.get("add"))
    assert DL.prior_dv_descs(path, {rewritten}, 2)[rewritten] is not None
    # ... but a path in NEITHER the retained JSON nor checkpoint@1 is
    # an inconsistent log: it must raise, not default to None (which
    # would emit a full-bitmap retract of already-dead rows)
    with pytest.raises(ValueError, match="cannot resolve prior deletion"):
        DL.prior_dv_descs(path, {rewritten, "part-ghost.parquet"}, 2)


# ---------------------------- 3: tie-widened partial top-k equivalence


def test_partial_topk_matches_full_lexsort():
    from mirror_lake_kusto_spark.operators.similarity import _partial_topk

    rng = np.random.default_rng(7)
    for n, k, n_distinct in [
        (1, 1, 1),       # singleton
        (5, 10, 3),      # n < k: whole batch survives
        (40, 10, 40),    # all-distinct scores
        (400, 10, 5),    # heavy ties straddling the k-th score
        (400, 10, 1),    # EVERY candidate tied
        (4096, 50, 17),  # argpartition path (n > 4k) with tie groups
    ]:
        col = np.round(
            rng.choice(rng.standard_normal(n_distinct), size=n), 6
        )
        cids = rng.permutation(n).astype(np.int64)
        want = np.lexsort((cids, -col))[: min(k, n)]
        got = _partial_topk(col, cids, k)
        np.testing.assert_array_equal(got, want)


# --------------------------- 4: registration failures are not swallowed


def test_register_source_propagates_genuine_failures():
    from mirror_lake_kusto_spark.streaming.delta_source import (
        register_source,
    )

    class Broken:
        class dataSource:
            @staticmethod
            def register(_cls):
                raise RuntimeError("API mismatch: no such method")

    with pytest.raises(RuntimeError, match="API mismatch"):
        register_source(Broken())


def test_register_source_is_idempotent(spark):
    from mirror_lake_kusto_spark.streaming.delta_source import (
        register_source,
    )

    register_source(spark)
    assert getattr(spark, "_mlk_delta_registered", False)
    register_source(spark)  # second call: no-op, no replace-WARN
