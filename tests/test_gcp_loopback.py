"""Loopback-socket tests for the GCP REST clients (r4 verdict missing #1).

Every other gcp.py test injects a stubbed transport; these run
``DataprocClient``/``GcsClient`` with their DEFAULT ``urllib_transport``
against an in-process ``http.server`` on 127.0.0.1 — real sockets, real
HTTP framing, real urllib error paths (an HTTPError body for 503s), no
external network. The server scripts the same scenarios the
state-machine tests assert offline: submit → PENDING → RUNNING →
mid-poll 503 → DONE, a media upload echoing the bytes, a 2-page
listing, and deletes.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from gomrjob_spark.gcp import DataprocClient, GcsClient
from gomrjob_spark.submit import SubmitConfig


class _FakeGcp(BaseHTTPRequestHandler):
    """Scripted Dataproc + GCS endpoints. State lives on the server."""

    def log_message(self, *a):  # keep pytest output clean
        pass

    def _send(self, status: int, payload=None):
        body = json.dumps(payload).encode() if payload is not None else b""
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        srv = self.server
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        srv.requests.append(("POST", self.path, body, dict(self.headers)))
        if "/jobs:submit" in self.path:
            srv.job_polls = 0
            self._send(200, {"reference": {"jobId": "job-loopback-1"}})
        elif self.path.startswith("/upload/"):
            q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            name = q["name"][0]
            srv.objects[name] = body
            self._send(200, {"name": name, "size": str(len(body))})
        else:
            self._send(404, {"error": "unknown POST"})

    def do_GET(self):
        srv = self.server
        srv.requests.append(("GET", self.path, None, dict(self.headers)))
        if "/jobs/" in self.path:
            srv.job_polls += 1
            # PENDING, RUNNING, then a genuine 503 HTTP response (urllib
            # surfaces it as HTTPError -> transport returns (503, body)),
            # then DONE
            if srv.job_polls == 1:
                self._send(200, {"status": {"state": "PENDING"}})
            elif srv.job_polls == 2:
                self._send(200, {"status": {"state": "RUNNING"}})
            elif srv.job_polls == 3:
                self._send(503, {"error": "backend unavailable"})
            else:
                self._send(200, {"status": {"state": "DONE"}})
        elif "/o?" in self.path or self.path.endswith("/o"):
            q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            prefix = q.get("prefix", [""])[0]
            names = sorted(n for n in srv.objects if n.startswith(prefix))
            # two pages: first item, then the rest
            if "pageToken" not in q:
                page = {"items": [{"name": n} for n in names[:1]]}
                if len(names) > 1:
                    page["nextPageToken"] = "P2"
                self._send(200, page)
            else:
                assert q["pageToken"] == ["P2"]
                self._send(200, {"items": [{"name": n} for n in names[1:]]})
        else:
            self._send(404, {"error": "unknown GET"})

    def do_DELETE(self):
        srv = self.server
        srv.requests.append(("DELETE", self.path, None, dict(self.headers)))
        name = urllib.parse.unquote(self.path.rsplit("/o/", 1)[1])
        if name in srv.objects:
            del srv.objects[name]
            self._send(204)
        else:
            self._send(404, {"error": "no such object"})


@pytest.fixture()
def gcp_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeGcp)
    srv.requests = []
    srv.objects = {}
    srv.job_polls = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_dataproc_submit_and_wait_over_real_socket(gcp_server):
    """submit → poll(PENDING, RUNNING, 503-retry, DONE) through the
    default urllib transport: the offline state machine's assertions
    hold over a real HTTP connection, including the 503 arriving as an
    HTTPError whose body urllib must drain."""
    srv, base = gcp_server
    c = DataprocClient(
        "proj", "region1", token_provider=lambda: "tok", api_base=base
    )
    cfg = SubmitConfig(app_file="app.py", app_args=["--x"])
    job_id = c.submit(cfg, cluster="c1")
    assert job_id == "job-loopback-1"
    state = c.wait(job_id, sleep=lambda s: None)
    assert state == "DONE"
    assert srv.job_polls == 4  # 503 retried within the poll loop
    # bearer token actually crossed the socket
    auths = {h.get("Authorization") for _, _, _, h in srv.requests}
    assert auths == {"Bearer tok"}
    # the submit body was the built Dataproc job resource
    post = next(r for r in srv.requests if r[0] == "POST")
    body = json.loads(post[2])
    assert body["job"]["pysparkJob"]["mainPythonFileUri"].endswith("app.py")


def test_gcs_upload_paginate_delete_over_real_socket(gcp_server):
    """Media upload (bytes preserved end-to-end), 2-page nextPageToken
    listing, and delete_prefix's list-then-delete ordering — all through
    real sockets."""
    srv, base = gcp_server
    c = GcsClient(
        token_provider=lambda: "tok",
        api_base=f"{base}/storage/v1",
        upload_base=f"{base}/upload/storage/v1",
    )
    payload = bytes(range(256)) * 4  # binary-safe round trip
    resp = c.put_object("bkt", "tmp/a.bin", payload, content_type="application/octet-stream")
    assert resp["name"] == "tmp/a.bin" and int(resp["size"]) == len(payload)
    assert srv.objects["tmp/a.bin"] == payload
    c.put_object("bkt", "tmp/b.bin", b"second")
    c.put_object("bkt", "keep/c.bin", b"outside prefix")

    names = [o["name"] for o in c.list_objects("bkt", "tmp/")]
    assert names == ["tmp/a.bin", "tmp/b.bin"]
    list_gets = [p for m, p, _, _ in srv.requests if m == "GET" and "/o?" in p]
    assert any("pageToken=P2" in p for p in list_gets)  # pagination happened

    assert c.delete_prefix("bkt", "tmp/") == 2
    assert set(srv.objects) == {"keep/c.bin"}
    # materialized-listing order: both listing GETs precede the deletes
    kinds = [m for m, p, _, _ in srv.requests if m == "DELETE" or ("/o?" in p and "prefix=tmp" in p)]
    assert kinds == ["GET", "GET", "GET", "GET", "DELETE", "DELETE"]  # 2 for list_objects call + 2 for delete_prefix


def test_gcs_404_surfaces_error_body_over_real_socket(gcp_server):
    srv, base = gcp_server
    c = GcsClient(token_provider=lambda: "tok", api_base=f"{base}/storage/v1")
    with pytest.raises(RuntimeError, match="404"):
        c.delete_object("bkt", "missing.bin")
