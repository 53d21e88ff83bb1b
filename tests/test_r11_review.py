"""Round-11 code-review pins (the review of the round diff found six
defects; each fix is pinned here or in the suite it amended).

1. KELVIN SIGN soundness: U+212A is the ONLY non-ASCII codepoint that
   compares equal to an ASCII char under Spark's UTF8_LCASE (verified
   by an exhaustive U+0080..U+2FFFF x ASCII probe), so 'k'-bearing
   literals must not prune — a file holding the Kelvin spelling sorts
   far above both ASCII case-variant hulls.
2. prior_dv_descs consults the newest on-disk checkpoint OLDER than
   the classified commit, not just the _last_checkpoint pointer — a
   newer checkpoint alongside an older usable one must not fail loud.
3. UC REST conflict classification: 5xx is never an arbitration
   verdict; 4xx 'already' bodies are.
4. StreamReplica fails loud when its txn ledger is strictly ahead of
   the delivered epoch (reset/foreign checkpoint — every batch would
   otherwise be silently skipped while the query reports progress).
"""

import json
import os

import pytest

from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from mirror_lake_kusto_spark.sources.skipping import (
    parse_conjuncts,
    prune_files,
)
from pyspark.sql.types import StringType, StructField, StructType

_SCHEMA = StructType([StructField("s", StringType())])
_LCASE = {"s": "SPARK.UTF8_LCASE"}


def _fake_file(lo, hi, n=5):
    return {
        "path": f"f_{lo}_{hi}.parquet",
        "partitionValues": {},
        "stats": json.dumps(
            {
                "numRecords": n,
                "minValues": {"s": lo},
                "maxValues": {"s": hi},
                "nullCount": {"s": 0},
            }
        ),
    }


# --------------------------------------------------- 1: KELVIN SIGN


def test_k_literals_never_prune():
    # the Kelvin spelling 'aK' (U+212A) of literal 'ak' sorts above
    # both ASCII hulls — pruning on any k-bearing literal is unsound
    for pred in ("s = 'kelvin'", "s = 'aK'", "s IN ('ok', 'no')"):
        assert parse_conjuncts(pred, _SCHEMA, _LCASE) == []
    kelvin = "aK"  # binary 0x61 0xE2 0x84 0xAA
    files = [_fake_file(kelvin, kelvin)]
    kept = prune_files(files, "s = 'ak'", _SCHEMA, collations=_LCASE)
    assert len(kept) == 1  # would have been wrongly skipped pre-fix


def test_kelvin_sign_matches_under_lcase_end_to_end(spark, tmp_path):
    """Pins the Spark semantics the guard is built on: if a future
    Spark changes UTF8_LCASE's fold set, this fails and the exception
    list in _collation_mode must be re-derived."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("aK",), ("ak",), ("zz",)], "s string")
    n = df.filter(
        F.expr("collate(s, 'UTF8_LCASE') = collate('ak', 'UTF8_LCASE')")
    ).count()
    assert n == 2
    # and İ does NOT fold to plain i (full mapping emits i + U+0307)
    m = spark.createDataFrame([("İ",)], "s string").filter(
        F.expr("collate(s, 'UTF8_LCASE') = collate('i', 'UTF8_LCASE')")
    ).count()
    assert m == 0


def test_k_free_literals_still_prune():
    files = [_fake_file("aaa", "apple"), _fake_file("MANGO", "Mango")]
    kept = prune_files(files, "s = 'mango'", _SCHEMA, collations=_LCASE)
    assert [f["path"] for f in kept] == ["f_MANGO_Mango.parquet"]


# ------------------------------- 2: older checkpoint still witnesses


def test_prior_dv_descs_uses_older_checkpoint_not_just_newest(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    s = DeltaSink(spark, path, checkpoint_interval=2)
    s.append(spark.range(10).toDF("n").coalesce(1))  # v0
    s.delete_dv("n = 1")                             # v1: rewrite + ckpt@1
    s.delete_dv("n = 3")                             # v2: rewrite
    s.delete_dv("n = 5")                             # v3: rewrite + ckpt@3
    log = os.path.join(path, "_delta_log")
    assert DL.list_checkpoint_versions(path) == [1, 3]
    acts = [json.loads(l) for l in open(os.path.join(log, "%020d.json" % 2))]
    rewritten = next(a["add"]["path"] for a in acts if a.get("add"))
    # metadata cleanup removes JSON below the OLDER checkpoint; the
    # NEWEST checkpoint (3) is past the classified commit (2), but
    # checkpoint 1 witnesses v1's descriptor — must resolve, not raise
    for v in (0, 1):
        os.unlink(os.path.join(log, "%020d.json" % v))
    desc = DL.prior_dv_descs(path, {rewritten}, 2)[rewritten]
    assert desc is not None and int(desc["cardinality"]) == 1


# --------------------------------------- 3: UC conflict classification


def test_uc_5xx_conflict_body_is_not_commit_conflict(tmp_path):
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from mirror_lake_kusto_spark.sources import coordinator as COORD
    from mirror_lake_kusto_spark.sources.uc_catalog import (
        UCRestCommitCoordinator,
    )

    class H(BaseHTTPRequestHandler):
        code = 503
        body = b'{"error": "internal conflict resolving replica"}'

        def log_message(self, *a):
            pass

        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            self.send_response(type(self).code)
            self.send_header("Content-Length", str(len(type(self).body)))
            self.end_headers()
            self.wfile.write(type(self).body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        uc = UCRestCommitCoordinator(
            f"http://127.0.0.1:{srv.server_address[1]}"
        )
        uc.bind_table(str(tmp_path / "t"), "tid")
        # 503 with 'conflict' in the body: a server fault, NOT an
        # arbitration verdict — must not be treated as lost-the-race
        with pytest.raises(RuntimeError, match="HTTP 503"):
            uc.commit(str(tmp_path / "t"), 1, "_commits/x.json")
        # 400 with free-text 'already' in the body is a VALIDATION
        # failure ("token already expired", "table already exists"),
        # not a lost arbitration — round-12 advice: only HTTP 409 or a
        # structured error_code may classify as CommitConflict
        H.code, H.body = 400, b'{"error": "token already expired"}'
        with pytest.raises(RuntimeError, match="HTTP 400"):
            uc.commit(str(tmp_path / "t"), 1, "_commits/x.json")
        # structured arbitration verdict without a 409
        H.code = 400
        H.body = b'{"error_code": "COMMIT_CONFLICT", "message": "v1 taken"}'
        with pytest.raises(COORD.CommitConflict):
            uc.commit(str(tmp_path / "t"), 1, "_commits/x.json")
        # plain 409 is always arbitration
        H.code, H.body = 409, b'{"message": "version 1 ratified"}'
        with pytest.raises(COORD.CommitConflict):
            uc.commit(str(tmp_path / "t"), 1, "_commits/x.json")
        # 2xx carrying an error payload must not read as ratified
        H.code = 200
        H.body = b'{"error_code": "INTERNAL", "error": "store failed"}'
        with pytest.raises(RuntimeError, match="error payload"):
            uc.commit(str(tmp_path / "t"), 1, "_commits/x.json")
        # 2xx whose echo contradicts the posted version fails loud
        H.code, H.body = 200, b'{"latest_table_version": 0}'
        with pytest.raises(RuntimeError, match="not ratified"):
            uc.commit(str(tmp_path / "t"), 1, "_commits/x.json")
    finally:
        srv.shutdown()
        srv.server_close()


# --------------------------------- 4: reset checkpoint fails loud


def test_replica_reset_checkpoint_fails_loud(spark, tmp_path):
    from mirror_lake_kusto_spark.pipeline.stream_replica import StreamReplica

    src = str(tmp_path / "src")
    s = DeltaSink(spark, src)
    s.append(spark.range(5).toDF("n").coalesce(1))
    s.delete_dv("n = 2")
    rep = StreamReplica(
        spark, src, str(tmp_path / "rep"), str(tmp_path / "ck")
    )
    rep.run_until_idle()                 # epoch 0
    s.append(spark.range(5, 8).toDF("n").coalesce(1))
    rep.run_until_idle()                 # epoch 1 (same checkpoint)
    last = DL.last_txn_version(spark, rep.sink.path, rep.app_id)
    assert last is not None and last >= 1
    # a reset checkpoint restarts epochs at 0 against the same target:
    # silently skipping every batch would freeze the replica forever
    stale = spark.createDataFrame(
        [(99, "insert", 9, "f", 0)],
        "n long, _change_type string, _commit_version long, "
        "_mlk_src_file string, _mlk_src_row_idx long",
    )
    with pytest.raises(ValueError, match="checkpoint was reset"):
        rep._apply_batch(stale, 0)
