"""expose-http ring-buffer + serving tests
(src/step-functions/expose-http.ts:101-291 semantics)."""

from __future__ import annotations

import json
import urllib.request
import urllib.error

import pytest
from pyspark.sql import functions as F

from cdp_spark.io.expose import ExposeBuffer, ExposeServer, response_etag
from cdp_spark.io.sinks import get_expose_buffer
from cdp_spark.pipeline import compile_pipeline, from_yaml
from tests.test_pipeline import events_input


# ---------------------------------------------------------------------------
# buffer semantics


def test_etag_stability_and_shape():
    # deterministic SHA-1 of the JSON-encoded body, unpadded base64url
    e1 = response_etag("a\nb\n")
    assert e1 == response_etag("a\nb\n")
    assert e1 != response_etag("a\nc\n")
    assert "=" not in e1 and "+" not in e1 and "/" not in e1
    assert len(e1) == 27  # 20-byte sha1 -> 27 base64url chars


def test_window_response_is_ndjson():
    buf = ExposeBuffer(2)
    buf.register_window(['{"n":"a"}', '{"n":"b"}'])
    resp = buf.get()
    assert resp.body == '{"n":"a"}\n{"n":"b"}\n'
    assert resp.content_type == "application/x-ndjson"
    assert resp.etag == response_etag(resp.body)


def test_value_responses_string_verbatim():
    buf = ExposeBuffer(2)
    buf.register_value('"plain text"')
    assert buf.get().body == "plain text"
    buf.register_value('{"k":1}')
    assert buf.get().body == '{"k":1}'
    assert buf.get().content_type is None


def test_ring_retention_and_eviction():
    buf = ExposeBuffer(3)
    keys = [buf.register_window([f'{{"w":{i}}}']) for i in range(5)]
    # latest is window 4; windows 0 and 1 evicted
    assert buf.get().body == '{"w":4}\n'
    assert buf.get(keys[0]) is None
    assert buf.get(keys[1]) is None
    for i in (2, 3, 4):
        assert buf.get(keys[i]).body == f'{{"w":{i}}}\n'


def test_link_paging_walks_backward():
    buf = ExposeBuffer(3)
    keys = [buf.register_window([f'{{"w":{i}}}']) for i in range(3)]
    latest = buf.get()
    assert latest.link_key == keys[1]
    middle = buf.get(keys[1])
    assert middle.link_key == keys[0]
    # the oldest entry's backward neighbor is the CURRENT slot — the
    # link is omitted to stop the walk (expose-http.ts:239-242)
    oldest = buf.get(keys[0])
    assert oldest.link_key is None


def test_single_slot_buffer_has_no_links():
    buf = ExposeBuffer(1)
    k1 = buf.register_window(['{"w":1}'])
    assert buf.get().link_key is None
    k2 = buf.register_window(['{"w":2}'])
    assert buf.get().body == '{"w":2}\n'
    assert buf.get(k1) is None  # evicted
    assert buf.get(k2).link_key is None


def test_empty_buffer_returns_none():
    assert ExposeBuffer(2).get() is None
    assert ExposeBuffer(2).get("nope") is None


def test_duplicate_window_reuses_etag():
    buf = ExposeBuffer(3)
    k1 = buf.register_window(['{"x":1}'])
    k2 = buf.register_window(['{"x":1}'])
    assert k1 == k2
    # key resolves to the newest copy; paging from it reaches the older
    assert buf.get(k1).body == '{"x":1}\n'


# ---------------------------------------------------------------------------
# HTTP serving layer


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return r.status, dict(r.headers), r.read().decode()


def test_server_serves_latest_by_etag_and_paging():
    buf = ExposeBuffer(3)
    keys = [buf.register_window([f'{{"w":{i}}}']) for i in range(3)]
    server = ExposeServer(buf, endpoint="/metrics", port=0).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        status, headers, body = _get(f"{base}/metrics")
        assert (status, body) == (200, '{"w":2}\n')
        assert headers["ETag"] == f'"{keys[2]}"'
        assert headers["Content-Type"] == "application/x-ndjson"
        assert f"/metrics/{keys[1]}/" in headers["Link"]
        assert 'rel="next"' in headers["Link"]

        status, headers, body = _get(f"{base}/metrics/{keys[1]}/")
        assert (status, body) == (200, '{"w":1}\n')
        assert f"/metrics/{keys[0]}/" in headers["Link"]

        status, headers, body = _get(f"{base}/metrics/{keys[0]}/")
        assert body == '{"w":0}\n'
        assert "Link" not in headers

        with pytest.raises(urllib.error.HTTPError) as err:
            _get(f"{base}/metrics/unknown-etag/")
        assert err.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as err:
            _get(f"{base}/other")
        assert err.value.code == 404
    finally:
        server.close()


def test_server_custom_headers_and_503():
    buf = ExposeBuffer(1)
    server = ExposeServer(
        buf, endpoint="/m", port=0, headers={"X-Custom": "yes"}
    ).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        with pytest.raises(urllib.error.HTTPError) as err:
            _get(f"{base}/m")
        assert err.value.code == 503
        buf.register_value('"body"')
        status, headers, body = _get(f"{base}/m")
        assert (status, body) == (200, "body")
        assert headers["X-Custom"] == "yes"
    finally:
        server.close()


# ---------------------------------------------------------------------------
# pipeline integration


def test_pipeline_expose_http_windows(spark):
    t = from_yaml(
        """
name: p
input: {stdin: }
steps:
  expose:
    window: {events: 2, seconds: 3600}
    reduce:
      expose-http:
        endpoint: /events
        responses: 10
"""
    )
    rows = [("a", "1"), ("b", "2"), ("c", "3")]
    result = compile_pipeline(spark, t, input_df=events_input(spark, rows), arrival_ts=1000.0)
    result.run_sinks()
    buf = get_expose_buffer("expose")
    assert buf is not None
    latest = buf.get()
    # sliding window of 2 with step 1: last full window is [b, c]...
    # whatever the window shape, the body must be NDJSON events
    names = [json.loads(line)["n"] for line in latest.body.strip().split("\n")]
    assert names and set(names) <= {"a", "b", "c"}
    # pass-through preserved
    assert result.output.count() == 3


def test_pipeline_expose_http_jsonnet_values(spark):
    t = from_yaml(
        """
name: p
input: {stdin: }
steps:
  prom:
    window: {events: 3, seconds: 3600}
    reduce:
      expose-http:
        endpoint: /metrics
        responses: 5
        jsonnet-expr: |-
          function(events)
            std.join("\\n", [e.n + " " + std.toString(e.d) for e in events]) + "\\n"
"""
    )
    rows = [("m1", "1"), ("m2", "2"), ("m3", "3")]
    result = compile_pipeline(spark, t, input_df=events_input(spark, rows), arrival_ts=1000.0)
    result.run_sinks()
    buf = get_expose_buffer("prom")
    assert buf.get().body == "m1 1\nm2 2\nm3 3\n"
    assert buf.get().content_type is None


def test_expose_buffer_accumulates_across_batches(spark):
    # the sink action runs once per (micro-)batch: the ring buffer
    # accumulates windows across runs instead of resetting
    yaml_text = """
name: p
input: {stdin: }
steps:
  acc:
    reduce:
      expose-http:
        endpoint: /e
        responses: 10
"""
    t = from_yaml(yaml_text)
    for batch in ([("a", "1")], [("b", "2")]):
        r = compile_pipeline(spark, t, input_df=events_input(spark, batch), arrival_ts=1000.0)
        r.run_sinks()
    buf = get_expose_buffer("acc")
    latest = buf.get()
    assert json.loads(latest.body.strip())["n"] == "b"
    older = buf.get(latest.link_key)
    assert json.loads(older.body.strip())["n"] == "a"


def test_composition_example_http_paging_walk(spark):
    """examples/composition/pipeline-third.yaml end-to-end: the debug
    step's jq formatter feeds the forward step's count-or-time window
    into expose-http, and a client walks the FULL ETag/Link paging
    chain over real HTTP (expose-http.ts:235-251): latest -> next ->
    ... until the Link header stops, newest-first, then 404 past the
    chain."""
    import os

    import yaml

    path = "/root/reference/examples/composition/pipeline-third.yaml"
    if not os.path.exists(path):
        pytest.skip("reference examples not available")
    doc = yaml.safe_load(open(path).read())
    doc["steps"]["forward"]["reduce"]["expose-http"]["port"] = 0  # ephemeral
    t = from_yaml(yaml.safe_dump(doc))

    # 250 events -> count-or-time windows of 100: [0..99], [100..199],
    # [200..249] (close truncation) -> 3 buffered responses
    rows = [(f"ev.{i}", str(i)) for i in range(250)]
    result = compile_pipeline(
        spark, t, input_df=events_input(spark, rows), arrival_ts=1000.0
    )
    result.run_sinks()

    from cdp_spark.io.sinks import get_expose_server

    server = get_expose_server("forward")
    assert server is not None
    try:
        base = f"http://127.0.0.1:{server.port}"
        pages = []
        url = f"{base}/events"
        while True:
            status, headers, body = _get(url)
            assert status == 200
            assert headers["Content-Type"] == "application/x-ndjson"
            names = [json.loads(ln)["n"] for ln in body.strip().split("\n")]
            etag = headers["ETag"].strip('"')
            assert etag == response_etag(body)
            pages.append(names)
            link = headers.get("Link")
            if not link:
                break
            next_path = link.split(">")[0].lstrip("<")
            assert next_path.startswith("/events/") and 'rel="next"' in link
            url = base + next_path
        # newest first: the truncated tail window, then the two full ones
        assert [len(p) for p in pages] == [50, 100, 100]
        assert pages[0][0] == "ev.200" and pages[0][-1] == "ev.249"
        assert pages[1][0] == "ev.100" and pages[2][0] == "ev.0"
        with pytest.raises(urllib.error.HTTPError) as err:
            _get(f"{base}/events/not-a-buffered-etag/")
        assert err.value.code == 404
    finally:
        server.close()
