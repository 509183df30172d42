"""Custom Python streaming data source for the ``poll`` input form:
periodic HTTP GET with ETag change-suppression as offset bookkeeping
(reference src/input/poll.ts:106-189), driven against a local
ETag-aware HTTP server."""

from __future__ import annotations

import hashlib
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from cdp_spark.streaming.poll import stream_poll


class _State:
    def __init__(self) -> None:
        self.body = b'{"n":"poll.a","d":1}\n{"n":"poll.b","d":2}\n'
        self.hits = 0
        self.not_modified = 0


def _make_server(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            state.hits += 1
            etag = '"%s"' % hashlib.sha1(state.body).hexdigest()
            if self.headers.get("If-None-Match") == etag:
                state.not_modified += 1
                self.send_response(304)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("ETag", etag)
            self.send_header("Content-Length", str(len(state.body)))
            self.end_headers()
            self.wfile.write(state.body)

        def log_message(self, *args):  # silence
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


@pytest.fixture
def poll_server():
    state = _State()
    srv = _make_server(state)
    yield state, f"http://127.0.0.1:{srv.server_address[1]}/data"
    srv.shutdown()


def test_poll_source_etag_suppression(spark, poll_server):
    state, url = poll_server
    events = stream_poll(spark, url)
    q = (
        events.writeStream.format("memory").queryName("poll_out")
        .trigger(processingTime="300 milliseconds").start()
    )
    try:
        # Let several polls happen against the unchanged body.
        deadline = time.time() + 30
        while time.time() < deadline and state.not_modified < 2:
            time.sleep(0.2)
        rows = spark.sql("SELECT n, d FROM poll_out ORDER BY n").collect()
        # ETag suppression: many polls, exactly one batch of events.
        assert [(r.n, r.d) for r in rows] == [("poll.a", "1"), ("poll.b", "2")]
        assert state.not_modified >= 2

        # Change the payload — the next poll must pick it up once.
        state.body = b'{"n":"poll.c","d":3}\n'
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT * FROM poll_out").count() >= 3:
                break
            time.sleep(0.2)
        rows = spark.sql("SELECT n, d FROM poll_out ORDER BY n").collect()
        assert [(r.n, r.d) for r in rows] == [
            ("poll.a", "1"), ("poll.b", "2"), ("poll.c", "3"),
        ]
    finally:
        q.stop()


def test_poll_source_wrap_raw(spark, poll_server):
    state, url = poll_server
    state.body = b"plain line one\nplain line two\n"
    events = stream_poll(spark, url, wrap={"name": "polled.raw", "raw": True})
    q = (
        events.writeStream.format("memory").queryName("poll_raw_out")
        .trigger(processingTime="300 milliseconds").start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT * FROM poll_raw_out").count() >= 2:
                break
            time.sleep(0.2)
        rows = spark.sql("SELECT n, d FROM poll_raw_out ORDER BY d").collect()
        # d is the raw line as a JSON value (string, quoted).
        assert [(r.n, json.loads(r.d)) for r in rows] == [
            ("polled.raw", "plain line one"),
            ("polled.raw", "plain line two"),
        ]
    finally:
        q.stop()
