"""Real-socket smoke test for the transport seams (U1/S3).

Every other transport test injects a fake opener; this one runs a
stdlib http.server on 127.0.0.1 (loopback only — the no-egress default
is untouched) so HttpFetcher and LLMClient each execute their real
urllib path at least once: request construction, header transmission,
timeout plumbing, response decode, and per-URL error absorption.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from leadsight_sales_agent_spark.functions.transport import HttpFetcher, LLMClient

PAGE_BODY = "<html><body><h1>Acme Corp</h1><p>About us: founded 1999.</p></body></html>"
CHAT_CONTENT = "Acme Corp builds anvils."


class _Handler(BaseHTTPRequestHandler):
    seen: list[dict] = []

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path == "/missing":
            self.send_error(404)
            return
        body = PAGE_BODY.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        type(self).seen.append(
            {
                "path": self.path,
                "auth": self.headers.get("Authorization"),
                "body": json.loads(raw.decode()),
            }
        )
        out = json.dumps(
            {"choices": [{"message": {"content": f"  {CHAT_CONTENT}  "}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture(scope="module")
def loopback_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    t.join(5)


class TestHttpFetcherLoopback:
    def test_fetch_batch_over_real_socket(self, loopback_server):
        f = HttpFetcher(timeout_s=5.0, max_workers=4)
        got = f.fetch_batch(
            [
                f"{loopback_server}/page-a",
                f"{loopback_server}/missing",  # 404 → absorbed to None
                None,  # non-URL input → None without touching the socket
                f"{loopback_server}/page-b",
            ]
        )
        assert got == [PAGE_BODY, None, None, PAGE_BODY]

    def test_connection_refused_absorbed(self):
        # A loopback port nothing listens on: the real urllib error path.
        f = HttpFetcher(timeout_s=1.0)
        assert f.fetch_batch(["http://127.0.0.1:9/nothing"]) == [None]


class TestLLMClientLoopback:
    def test_complete_round_trip(self, loopback_server):
        _Handler.seen.clear()
        c = LLMClient(
            api_key="test-key-123",
            model="test-model",
            timeout_s=5.0,
            url=f"{loopback_server}/openai/v1/chat/completions",
        )
        assert c.is_configured
        got = c.complete("You are a sales analyst.", "Summarize Acme.")
        assert got == CHAT_CONTENT  # stripped, content extracted

        (req,) = _Handler.seen
        assert req["path"] == "/openai/v1/chat/completions"
        assert req["auth"] == "Bearer test-key-123"
        assert req["body"]["model"] == "test-model"
        assert req["body"]["temperature"] == 0.2
        assert [m["role"] for m in req["body"]["messages"]] == ["system", "user"]

    def test_server_error_degrades_to_none(self, loopback_server):
        c = LLMClient(
            api_key="test-key-123",
            model="test-model",
            timeout_s=1.0,
            url="http://127.0.0.1:9/openai/v1/chat/completions",
        )
        assert c.complete("s", "u") is None  # U2/U3: absorbed, null out
