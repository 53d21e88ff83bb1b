"""Round-11 ask #6: a Unity-Catalog-shaped REST commit-coordinator
client behind the round-10 catalog binding API, integration-tested
against a local HTTP double implementing the OSS UC commits resource
(GET/POST /api/2.1/unity-catalog/delta/preview/commits, first-wins
arbitration, 409 on conflict).  Unknown catalogs keep failing closed
(test_r10_catalog_managed)."""

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from mirror_lake_kusto_spark.sources import coordinator as COORD
from mirror_lake_kusto_spark.sources import delta_log as DL
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink
from mirror_lake_kusto_spark.sources.uc_catalog import (
    COMMITS_ENDPOINT,
    UCRestCommitCoordinator,
)


class _UCDouble(BaseHTTPRequestHandler):
    """In-memory UC commits resource: {(table_id, version): file_name},
    first staged candidate wins, duplicates get HTTP 409."""

    store: dict = {}
    key_style = "file_name"  # or "fileName" (the spec examples differ)

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code: int, body: dict) -> None:
        raw = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def do_GET(self):
        u = urlparse(self.path)
        if u.path != COMMITS_ENDPOINT:
            return self._send(404, {"error": "not found"})
        q = parse_qs(u.query)
        tid = q["table_id"][0]
        start = int(q.get("start_version", ["0"])[0])
        commits = [
            {"version": v, type(self).key_style: rel}
            for (t, v), rel in sorted(type(self).store.items())
            if t == tid and v >= start
        ]
        self._send(200, {"commits": commits})

    def do_POST(self):
        u = urlparse(self.path)
        if u.path != COMMITS_ENDPOINT:
            return self._send(404, {"error": "not found"})
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        tid = body["table_id"]
        info = body["commit_info"]
        key = (tid, int(info["version"]))
        if key in type(self).store:
            return self._send(
                409,
                {
                    "error": f"version {info['version']} already "
                    f"ratified as {type(self).store[key]}"
                },
            )
        type(self).store[key] = info["file_name"]
        self._send(200, {})


@pytest.fixture()
def uc_server():
    _UCDouble.store = {}
    _UCDouble.key_style = "file_name"
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _UCDouble)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


def _bound_client(uc_server, path):
    uc = UCRestCommitCoordinator(uc_server)
    uc.bind_table(path, table_id=f"tid-{uuid.uuid4().hex[:8]}")
    return uc


def test_uc_catalog_managed_write_read_roundtrip(spark, tmp_path, uc_server):
    """The full catalogManaged loop through REST: staged commits are
    ratified by the UC double, and the reader splices the ratified
    tail via the same client."""
    path = str(tmp_path / "t")
    uc = _bound_client(uc_server, path)
    name = f"uc-{tmp_path.name}"
    COORD.register_commit_coordinator(name, uc)
    COORD.register_catalog_table(path, name)
    try:
        sink = DeltaSink(spark, path, catalog_managed=True)
        sink.append(spark.range(5).toDF("n"))          # v0 plain bootstrap
        sink.append(spark.range(5, 9).toDF("n"))       # v1 staged+ratified
        sink.append(spark.range(9, 12).toDF("n"))      # v2 staged+ratified
        got = sorted(r["n"] for r in DL.read_snapshot(spark, path).collect())
        assert got == list(range(12))
        # the ratifications really live on the server
        assert sorted(v for (_, v) in _UCDouble.store) == [1, 2]
        # and the reader consults them: a FRESH client over the same
        # server (simulating another process) serves the same tail
        uc2 = _bound_client(uc_server, path)
        uc2._table_ids = dict(uc._table_ids)
        assert set(uc2.get_commits(path, 1)) == {1, 2}
    finally:
        COORD.unregister_catalog_table(path)
        COORD.unregister_commit_coordinator(name)


def test_uc_conflict_maps_to_commit_conflict(tmp_path, uc_server):
    path = str(tmp_path / "t")
    uc = _bound_client(uc_server, path)
    uc.commit(path, 7, "_commits/x.json")
    with pytest.raises(COORD.CommitConflict):
        uc.commit(path, 7, "_commits/y.json")


def test_uc_camel_case_response_accepted(tmp_path, uc_server):
    _UCDouble.key_style = "fileName"
    path = str(tmp_path / "t")
    uc = _bound_client(uc_server, path)
    uc.commit(path, 3, "_commits/a.json")
    assert uc.get_commits(path, 0) == {3: "_commits/a.json"}


def test_uc_unbound_table_raises(tmp_path, uc_server):
    uc = UCRestCommitCoordinator(uc_server)
    with pytest.raises(ValueError, match="no bound Unity Catalog"):
        uc.get_commits(str(tmp_path / "t"), 0)


def test_uc_server_error_is_loud(tmp_path, uc_server):
    path = str(tmp_path / "t")
    uc = UCRestCommitCoordinator(uc_server + "/bogus-prefix")
    uc.bind_table(path, "tid-x")
    with pytest.raises(RuntimeError, match="HTTP 404"):
        uc.get_commits(path, 0)


def test_uc_unreachable_is_loud(tmp_path):
    uc = UCRestCommitCoordinator("http://127.0.0.1:1")  # nothing listens
    uc.bind_table(str(tmp_path / "t"), "tid-x")
    with pytest.raises(RuntimeError, match="unreachable"):
        uc.get_commits(str(tmp_path / "t"), 0)
