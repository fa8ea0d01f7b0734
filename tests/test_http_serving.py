"""Loopback HTTP serving twin (streaming/serve.py): the three reference
routes execute over a real socket and the SSE stream is batch-equivalent
to the JobManager event log it serves. Stdlib client only; 127.0.0.1."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from leadsight_sales_agent_spark.streaming.jobs import DONE, RUNNING, JobManager
from leadsight_sales_agent_spark.streaming.serve import (
    MAX_DOWNLOAD_BYTES,
    ProgressServer,
)


def _get(port: int, path: str, timeout: float = 10.0):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout
    )


def _run_job(manager: JobManager, n_steps: int = 5) -> None:
    def job(m: JobManager) -> str:
        m.total = n_steps
        for i in range(n_steps):
            m.current = i + 1
            m.push_event("company_done", {"i": i})
            time.sleep(0.02)
        return "ok"

    t = manager.start(job)
    t.join(10)


class TestHTTPServing:
    def test_status_snapshot_idle_and_done(self):
        m = JobManager()
        srv = ProgressServer(m)
        port = srv.start()
        try:
            body = json.load(_get(port, "/status"))
            assert body["state"] == "idle"
            _run_job(m)
            body = json.load(_get(port, "/status"))
            assert body["state"] == DONE
            assert body["current"] == body["total"] == 5
            # start + 5 company_done + done
            assert body["n_events"] == 7
        finally:
            srv.stop()

    def test_progress_sse_replays_event_log_exactly(self):
        # Batch equivalence: the SSE frames (minus the close frame)
        # decode to exactly events_since(0) — the same pin the
        # data-shaped K3 analogue carries, now over a real socket.
        m = JobManager()
        _run_job(m)
        srv = ProgressServer(m)
        port = srv.start()
        try:
            raw = _get(port, "/progress").read().decode()
            frames = [f for f in raw.split("\n\n") if f.strip()]
            assert frames[-1].startswith("event: close")
            got = [json.loads(f.split("data: ", 1)[1]) for f in frames[:-1]]
            expected, _ = m.events_since(0)
            assert got == expected
            assert got[0]["type"] == "start"
            assert got[-1]["type"] == "done"
        finally:
            srv.stop()

    def test_progress_offset_resume(self):
        # A reconnecting client passes the offset it already consumed
        # and receives only the tail (reference server.py:340-355).
        m = JobManager()
        _run_job(m)
        srv = ProgressServer(m)
        port = srv.start()
        try:
            raw = _get(port, "/progress?offset=3").read().decode()
            frames = [f for f in raw.split("\n\n") if f.strip()][:-1]
            got = [json.loads(f.split("data: ", 1)[1]) for f in frames]
            expected, _ = m.events_since(3)
            assert got == expected
            assert len(got) == len(m.events) - 3
        finally:
            srv.stop()

    def test_progress_streams_live_job(self):
        # Events pushed AFTER the client connects still arrive: the
        # handler polls while state == RUNNING.
        m = JobManager()

        def slow_job(mm: JobManager) -> None:
            mm.total = 3
            for i in range(3):
                time.sleep(0.1)
                mm.current = i + 1
                mm.push_event("step", i)

        t = m.start(slow_job)
        srv = ProgressServer(m)
        port = srv.start()
        try:
            assert m.state == RUNNING
            raw = _get(port, "/progress").read().decode()
            t.join(5)
            frames = [f for f in raw.split("\n\n") if f.strip()][:-1]
            types = [json.loads(f.split("data: ", 1)[1])["type"] for f in frames]
            assert types == ["start", "step", "step", "step", "done"]
        finally:
            srv.stop()

    def test_download_attachment_and_404_when_empty(self):
        m = JobManager()
        srv = ProgressServer(m)  # no artifact yet
        port = srv.start()
        try:
            with pytest.raises(urllib.error.HTTPError) as ex:
                _get(port, "/download")
            assert ex.value.code == 404
        finally:
            srv.stop()
        payload = b"company,score\nacme,9\n"
        srv2 = ProgressServer(m, download_bytes=payload, download_name="leads.csv")
        port2 = srv2.start()
        try:
            resp = _get(port2, "/download")
            assert resp.read() == payload
            assert resp.headers["Content-Type"] == "text/csv"
            assert 'filename="leads.csv"' in resp.headers["Content-Disposition"]
        finally:
            srv2.stop()

    def test_download_size_guard(self):
        with pytest.raises(ValueError):
            ProgressServer(JobManager(), download_bytes=b"x" * (MAX_DOWNLOAD_BYTES + 1))

    def test_unknown_route_404(self):
        srv = ProgressServer(JobManager())
        port = srv.start()
        try:
            with pytest.raises(urllib.error.HTTPError) as ex:
                _get(port, "/nope")
            assert ex.value.code == 404
        finally:
            srv.stop()
