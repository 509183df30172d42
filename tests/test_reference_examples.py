"""The reference's OWN example pipelines, run unmodified through our
YAML front-end — direct evidence that a user of the reference can
switch engines.  (The exposition example already runs in
test_jsonnet/test_lifecycle; these cover the jq-transform examples.)

The YAML files are read from the reference checkout as fixtures;
tests skip if it is absent.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cdp_spark.pipeline import compile_pipeline, from_yaml

EXAMPLES = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not available"
)


def _events_input(spark, rows):
    """rows: (n, d_json_text_or_None)"""
    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(rows)], "rn long, n string, d string"
    )
    return df.select(
        "n",
        "d",
        F.lit(None).cast("array<struct<i double, p string, h string>>").alias("t"),
        F.col("rn").cast("long").alias("_ord"),
    )


def test_basic_jq_transformations_pipeline(spark):
    """examples/basic-jq-transformations: duplicate each event with a
    '.given' suffix, plus a '.healthy' copy when the payload is
    non-null; one branch drops everything but healthy events."""
    yaml_text = open(f"{EXAMPLES}/basic-jq-transformations/pipeline.yaml").read()
    template = from_yaml(yaml_text)

    # the example's own test events, expanded the way the NDJSON
    # reader does (one event per object, arrays yield one per element)
    raw = open(f"{EXAMPLES}/basic-jq-transformations/test-events.ndjson").read()
    events = []
    for line in raw.splitlines():
        line = line.strip()
        if not line:
            continue
        v = json.loads(line)
        for e in v if isinstance(v, list) else [v]:
            if isinstance(e, dict) and "n" in e:
                d = e.get("d")
                events.append(
                    (e["n"], None if d is None else json.dumps(d, separators=(",", ":")))
                )

    result = compile_pipeline(spark, template, input_df=_events_input(spark, events))
    # jq emits an explicit d:null for payload-less events; our event
    # model stores that as JSON-text 'null' (absent d is SQL NULL) —
    # same meaning, normalize for comparison
    norm = lambda d: None if d in (None, "null") else d  # noqa: E731
    got = [(r["n"], norm(r["d"])) for r in result.output.collect()]

    # reference semantics, simulated: every event gains '.given'; the
    # ones with a payload also gain '.healthy'.  Terminal steps are
    # show-only-healthy (filtered to #.healthy) and show-all-names (a
    # pass-through sink), so the pipeline output is their union.
    key = lambda t: (t[0], t[1] or "")  # noqa: E731
    given = [(n + ".given", d) for n, d in events]
    healthy = [(n + ".healthy", d) for n, d in events if d is not None]
    expected = sorted((given + healthy) + healthy, key=key)
    assert sorted(got, key=key) == expected


def test_prometheus_post_processing_parse_and_square(spark):
    """examples/prometheus-post-processing: the federate-text parse
    step (capture/from_entries jq) and the metric-squaring step run
    unmodified; we inject raw metric lines the way the wrapped poll
    input would."""
    yaml_text = open(f"{EXAMPLES}/prometheus-post-processing/pipeline.yaml").read()
    template = from_yaml(yaml_text)

    lines = [
        "# TYPE prometheus_http_requests_total counter",
        'prometheus_http_requests_total{code="200",job="prometheus",instance="i1"} 42',
        'prometheus_http_requests_total{code="302",job="prometheus",instance="i1"} 3',
        "metric_without_labels 7",
        "",
    ]
    # poll with wrap {name: _, raw: true} emits one event per line,
    # named '_', payload = the raw line as a JSON string
    rows = [("_", json.dumps(line)) for line in lines]

    result = compile_pipeline(spark, template, input_df=_events_input(spark, rows))
    out = [(r["n"], json.loads(r["d"])) for r in result.output.collect() if r["d"]]

    # terminal steps: print (parsed events, pass-through sink) and
    # push (squared events, pass-through sink)
    parsed = {
        (n, d["v"], json.dumps(d["l"], sort_keys=True)) for n, d in out if d["v"] in (42, 3, 7)
    }
    squared = {
        (n, d["v"], json.dumps(d["l"], sort_keys=True)) for n, d in out if d["v"] in (1764, 9, 49)
    }
    assert parsed == {
        ("prometheus_http_requests_total", 42, '{"code": "200"}'),
        ("prometheus_http_requests_total", 3, '{"code": "302"}'),
        ("metric_without_labels", 7, "null"),
    }
    assert squared == {
        ("prometheus_http_requests_total", 1764, '{"code": "200"}'),
        ("prometheus_http_requests_total", 9, '{"code": "302"}'),
        ("metric_without_labels", 49, "null"),
    }


def test_stress_test_primality_pipeline(spark):
    """examples/stress-test: the jq-prelude (mulmod/expmod), pattern
    routing, chained count-or-time windows, wrap directives and
    fan-in all run unmodified; expectation simulated with exact
    integer arithmetic (the prelude exists to keep jq's doubles
    exact — small inputs keep both sides exact)."""
    yaml_text = open(f"{EXAMPLES}/stress-test/pipeline.yaml").read()
    template = from_yaml(yaml_text)

    nums = list(range(3, 120))
    rows = (
        # generator shape: most events named not.multiple.of.three
        [("not.multiple.of.three", str(n)) for n in nums]
        # routing check: these are dropped by match/drop "not.#"
        + [("mutiple.of.three", "999983")]
        # keep-when check: non-numeric payloads never enter the chain
        + [("not.multiple.of.three", '"not a number"')]
    )
    result = compile_pipeline(
        spark, template, input_df=_events_input(spark, rows), arrival_ts=1000.0
    )
    got = sorted(
        (r["n"], int(json.loads(r["d"]))) for r in result.output.collect()
    )

    survivors = [n for n in nums if n % 2 and n % 5 and n % 7]
    expected = sorted(
        [("candidate.fermat.31", n) for n in survivors if pow(31, n - 1, n) == 1]
        + [("candidate.fermat.73", n) for n in survivors if pow(73, n - 1, n) == 1]
    )
    assert got == expected
    # sanity: real primes survive the Fermat test (except the base
    # itself — a ≡ 0 mod n when n == a, so 31 can't certify 31)
    primes = {n for n in survivors if all(n % k for k in range(2, n))}
    assert primes - {31} <= {n for f, n in got if f == "candidate.fermat.31"}


def test_external_processing_pipeline(spark, capsys):
    """examples/external-processing: keep-when numeric filter, jq
    re-shaping, the send-receive-http jq-expr pre-transform (one
    request per produced value, body = JSON array of payloads), and
    the x-keyed jq merge — against two local stub 'rooter'/'siner'
    services."""
    import math
    import threading
    import yaml
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    def make_service(key, fn):
        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                vals = json.loads(body)  # [{x: v}, ...] — the map(.d) array
                # NDJSON response: one value per line -> one event each
                out = "\n".join(
                    json.dumps({**v, key: fn(v["x"])}) for v in vals
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, *a):  # noqa: N802
                pass

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv

    rooter = make_service("sqrt", lambda x: round(math.sqrt(x), 6))
    siner = make_service("sin", lambda x: round(math.sin(x), 6))
    try:
        doc = yaml.safe_load(open(f"{EXAMPLES}/external-processing/pipeline.yaml").read())
        doc["steps"]["square root"]["reduce"]["send-receive-http"]["target"] = (
            f"http://127.0.0.1:{rooter.server_address[1]}/calculate"
        )
        doc["steps"]["sine"]["reduce"]["send-receive-http"]["target"] = (
            f"http://127.0.0.1:{siner.server_address[1]}/calculate"
        )
        template = from_yaml(yaml.safe_dump(doc))

        nums = [1.0, 4.0, 9.0]
        rows = [("_", json.dumps(n)) for n in nums]  # stdin wrap: _
        result = compile_pipeline(
            spark, template, input_df=_events_input(spark, rows), arrival_ts=1000.0
        )
        got = [(r["n"], json.loads(r["d"])) for r in result.output.collect() if r["d"]]
        # the merge step is a stdout SINK: its jq-expr output is the
        # printed side-channel, the stream forwards events unchanged
        result.run_sinks()
        sink_lines = [
            json.loads(line)
            for line in capsys.readouterr().out.splitlines()
            if line.strip().startswith("{")
        ]
    finally:
        rooter.shutdown()
        siner.shutdown()

    # merge prints objects carrying both service results for one x
    merged = [d for d in sink_lines if isinstance(d, dict) and "sqrt" in d and "sin" in d]
    assert merged, sink_lines
    for d in merged:
        assert d["sqrt"] == round(math.sqrt(d["x"]), 6)
        assert d["sin"] == round(math.sin(d["x"]), 6)
    # and each branch produced wrapped response events for every x
    sqrts = {d["x"] for n, d in got if n == "square-root" and isinstance(d, dict)}
    sins = {d["x"] for n, d in got if n == "sine" and isinstance(d, dict)}
    assert sqrts == sins == set(nums)


def test_filebeat_opensearch_bulk_sink(spark):
    """examples/filebeat-opensearch: the send-http sink's jq-expr
    builds ONE OpenSearch _bulk NDJSON body per window (a jq STRING,
    which must be posted raw — one request per produced value)."""
    import threading
    import yaml
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            received.append((self.path, body.decode()))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):  # noqa: N802
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        doc = yaml.safe_load(open(f"{EXAMPLES}/filebeat-opensearch/pipeline.yaml").read())
        doc["steps"]["send to opensearch"]["reduce"]["send-http"]["target"] = (
            f"http://127.0.0.1:{srv.server_address[1]}/events/_bulk"
        )
        template = from_yaml(yaml.safe_dump(doc))

        # tail with wrap {name: nginx, raw: true}: one event per raw
        # log line, d = the line as a JSON string
        lines = ['1.2.3.4 - - "GET / HTTP/1.1" 200', '5.6.7.8 - - "POST /x HTTP/1.1" 503']
        rows = [("nginx", json.dumps(line)) for line in lines]
        result = compile_pipeline(
            spark, template, input_df=_events_input(spark, rows), arrival_ts=1000.0
        )
        result.run_sinks()
    finally:
        srv.shutdown()

    assert len(received) == 1  # one window -> one jq string -> ONE request
    path, body = received[0]
    assert path == "/events/_bulk"
    # raw NDJSON bulk body: action line, then the event, per event
    body_lines = [json.loads(l) for l in body.strip().splitlines()]
    assert body_lines[0] == {"index": {}} and body_lines[2] == {"index": {}}
    assert body_lines[1]["n"] == "nginx" and body_lines[1]["d"] == lines[0]
    assert body_lines[3]["d"] == lines[1]
    assert body.endswith("\n")


def test_persistence_with_hasura_pipeline(spark):
    """examples/persistence-with-hasura: the full persist → query-back
    → combine loop against a stub GraphQL engine.  Exercises jq
    routing with wrap, trace timestamps (.t[-1].i | todate), per-value
    JSON request bodies, and the send-receive-http jq-expr path."""
    import threading
    import yaml
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    store: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers.get("Content-Length", 0))))
            op = body.get("operationName")
            if op == "persistEvents":
                store.extend(body["variables"]["events"])
                out = {"data": {"insert_event": {"returning": []}}}
            else:  # getComplementary
                v = body["variables"]

                def latest(name):
                    hits = [e for e in store if e["name"] == name and e["timestamp"] <= v["upTo"]]
                    return (
                        [{"id": 1, "name": name, "data": hits[-1]["data"], "timestamp": hits[-1]["timestamp"]}]
                        if hits
                        else []
                    )

                out = {"data": {"x": latest(v["x"]), "y": latest(v["y"])}}
            payload = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # noqa: N802
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        doc = yaml.safe_load(
            open(f"{EXAMPLES}/persistence-with-hasura/pipeline.yaml").read()
        )
        url = f"http://127.0.0.1:{srv.server_address[1]}/v1/graphql"
        doc["steps"]["persist input"]["reduce"]["send-http"]["target"] = url
        doc["steps"]["assemble pair"]["reduce"]["send-receive-http"]["target"] = url
        doc["steps"]["persist result"]["reduce"]["send-http"]["target"] = url
        template = from_yaml(yaml.safe_dump(doc))

        # generator shape: n=_generated, d=float in [0,1); >=0.95 -> y
        vals = [0.5, 0.2, 0.96, 0.7]
        rows = [("_generated", json.dumps(v)) for v in vals]
        result = compile_pipeline(
            spark, template, input_df=_events_input(spark, rows), arrival_ts=1000.0
        )
        # batch analog of the reference's concurrent:1 ordering:
        # persist first, then collecting the output runs the
        # query-back transform against the populated store
        result.run_sinks()
        got = [(r["n"], r["d"]) for r in result.output.collect()]
    finally:
        srv.shutdown()

    xs = [e["data"] for e in store if e["name"] == "x"]
    ys = [e["data"] for e in store if e["name"] == "y"]
    assert sorted(xs) == [0.2, 0.5, 0.7] and ys == [0.96]
    sums = [json.loads(d) for n, d in got if n == "x-plus-y"]
    assert sums, got
    assert all(s == xs[-1] + ys[-1] for s in sums)


def test_composition_debug_formatter(spark):
    """examples/composition: the shared debug step's jq formatter
    (name, payload-or-placeholder, trace hop join) over our stamped
    events — the program every pipeline in that example uses."""
    import yaml

    doc = yaml.safe_load(open(f"{EXAMPLES}/composition/pipeline-first.yaml").read())
    # keep only the debug step: 'forward' appends to /shared/events,
    # which doesn't exist here (deployment glue, not semantics)
    doc["steps"].pop("forward")
    template = from_yaml(yaml.safe_dump(doc))

    rows = [("ev.one", '"hello"'), ("ev.two", None)]
    result = compile_pipeline(
        spark, template, input_df=_events_input(spark, rows), arrival_ts=1000.0
    )
    got = sorted((r["n"], r["d"]) for r in result.output.collect())
    assert got == [("ev.one", '"hello"'), ("ev.two", None)]


def test_basic_http_input_pipeline_end_to_end(spark, tmp_path, monkeypatch):
    """examples/basic-http-input: the reference's smallest pipeline —
    HTTP ingest straight into a send-stdout flatmap — run unmodified
    (port swapped to ephemeral) through the managed streaming runner:
    POST NDJSON, watch the events print, ordered close."""
    import io as _io
    import sys as _sys
    import time
    import urllib.request

    import yaml

    from cdp_spark.streaming import run_pipeline_managed

    doc = yaml.safe_load(open(f"{EXAMPLES}/basic-http-input/pipeline.yaml").read())
    doc["input"]["http"]["port"] = 0
    template = from_yaml(yaml.safe_dump(doc))

    captured = _io.StringIO()
    monkeypatch.setattr(_sys, "stdout", captured)
    runner = run_pipeline_managed(
        template,
        spark,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=0.5,
    )
    try:
        server = runner._input_closers[0].__self__
        body = '{"n":"hello.world","d":42}\n{"n":"bye","d":"x"}\n'
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/events",
            data=body.encode(),
            method="POST",
        )
        assert urllib.request.urlopen(req).status == 200
        deadline = time.time() + 60
        while time.time() < deadline:
            if captured.getvalue().count("\n") >= 2:
                break
            time.sleep(0.3)
    finally:
        runner.close()
        monkeypatch.undo()
    lines = [json.loads(l) for l in captured.getvalue().strip().splitlines()]
    assert [(e["n"], e["d"]) for e in lines] == [("hello.world", 42), ("bye", "x")]
    # events carry the pipeline trace stamped by the engine
    assert all(e["t"][-1]["p"] == "Basic HTTP input" for e in lines)
