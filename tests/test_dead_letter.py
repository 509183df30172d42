"""Dead-letter forwarding to DEAD_LETTER_TARGET
(src/dead-letter.ts:19-32, src/conf.ts:109-139): invalid input lines
are POSTed as NDJSON to the configured URI with the configured method
and headers."""

from __future__ import annotations

import json
import threading

import pytest

from cdp_spark.dead_letter import dead_letter_config, ship_dead_letters
from cdp_spark.events import parse_lines


@pytest.fixture()
def capture_server():
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    hits: list[tuple[str, dict, bytes]] = []

    class Handler(BaseHTTPRequestHandler):
        def _handle(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            hits.append((self.command, dict(self.headers), body))
            self.send_response(200)
            self.end_headers()

        do_POST = _handle
        do_PUT = _handle
        do_PATCH = _handle

        def log_message(self, *a):  # noqa: N802
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield srv, hits
    finally:
        srv.shutdown()


def _dead_df(spark):
    lines = spark.createDataFrame(
        [('{"n": "ok", "d": 1}',), ("{nope",), ("also bad",)], "line string"
    )
    events, dead = parse_lines(lines, "line")
    assert events.count() == 1
    return dead


def test_ship_dead_letters_posts_ndjson(spark, capture_server):
    srv, hits = capture_server
    env = {"DEAD_LETTER_TARGET": f"http://127.0.0.1:{srv.server_address[1]}/dead"}
    assert ship_dead_letters(_dead_df(spark), env) is True
    got_lines = sorted(
        line for _m, _h, body in hits for line in body.decode().splitlines()
    )
    assert got_lines == ["also bad", "{nope"]
    method, headers, _ = hits[0]
    assert method == "POST"
    assert headers.get("X-CDP-Dead-Letter") == "true"
    assert headers.get("Content-Type") == "application/x-ndjson"


def test_ship_dead_letters_custom_method_headers(spark, capture_server):
    srv, hits = capture_server
    env = {
        "DEAD_LETTER_TARGET": f"http://127.0.0.1:{srv.server_address[1]}/d",
        "DEAD_LETTER_TARGET_METHOD": "put",
        "DEAD_LETTER_TARGET_HEADERS": json.dumps({"X-Token": 7, "X-Team": "cdp"}),
    }
    assert ship_dead_letters(_dead_df(spark), env) is True
    method, headers, _ = hits[0]
    assert method == "PUT"
    assert headers.get("X-Token") == "7"
    assert headers.get("X-Team") == "cdp"


def test_config_validation():
    # no target / malformed target -> disabled (conf.ts pattern check)
    assert dead_letter_config({}) is None
    assert dead_letter_config({"DEAD_LETTER_TARGET": "ftp://x"}) is None
    # invalid method falls back to POST; invalid headers ignored
    tgt, method, headers = dead_letter_config(
        {
            "DEAD_LETTER_TARGET": "http://h/x",
            "DEAD_LETTER_TARGET_METHOD": "delete",
            "DEAD_LETTER_TARGET_HEADERS": "[1]",
        }
    )
    assert (tgt, method, headers) == ("http://h/x", "POST", {})


def test_no_send_without_target(spark):
    assert ship_dead_letters(_dead_df(spark), {}) is False
    assert ship_dead_letters(None, {"DEAD_LETTER_TARGET": "http://h/x"}) is False
