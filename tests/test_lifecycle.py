"""Managed pipeline lifecycle: ordered drain, health monitor
(src/api.ts:318-441 contract)."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from cdp_spark.pipeline import from_yaml
from cdp_spark.streaming import PipelineRunner, run_pipeline_managed


def _post(url: str, body: str) -> int:
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.status


def _http_template(spool: str) -> str:
    return f"""
name: managed
input:
  http:
    endpoint: /events
    port: 0
    spool-dir: {spool}
steps:
  tag:
    reduce:
      rename: {{prepend: "m."}}
"""


def test_managed_http_pipeline_ordered_close(spark, tmp_path):
    from cdp_spark.io.sinks import get_expose_buffer  # noqa: F401  (import check)

    spool = str(tmp_path / "spool")
    batches: list[tuple[str, str]] = []
    template = from_yaml(_http_template(spool))
    runner = run_pipeline_managed(
        template,
        spark,
        on_batch=lambda df, epoch: batches.extend((r.n, r.d) for r in df.collect()),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=0.5,
    )
    try:
        assert runner.healthy()
        # find the server the runner owns (registered as its closer)
        server = runner._input_closers[0].__self__
        assert _post(f"http://127.0.0.1:{server.port}/events", '{"n":"a","d":1}') == 200
        deadline = time.time() + 60
        while not batches and time.time() < deadline:
            time.sleep(0.3)
        assert batches == [("m.a", "1")]
    finally:
        runner.close()
    # ordered drain: input server refuses first, then the query stops
    assert not runner.query.isActive
    assert not runner.healthy()
    with pytest.raises(urllib.error.URLError):
        _post(f"http://127.0.0.1:{server.port}/events", '{"n":"b","d":2}')
    # idempotent
    runner.close()


def test_health_monitor_triggers_drain(spark, tmp_path):
    spool = str(tmp_path / "spool")
    template = from_yaml(_http_template(spool))
    flag = {"ok": True}
    runner = run_pipeline_managed(
        template,
        spark,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=0.5,
        health_checks=[lambda: flag["ok"]],
        health_interval=0.3,
    )
    assert runner.healthy()
    flag["ok"] = False
    deadline = time.time() + 30
    while runner.query.isActive and time.time() < deadline:
        time.sleep(0.2)
    assert not runner.query.isActive  # monitor drained and stopped it


def test_runner_health_reflects_query_state(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.ndjson").write_text('{"n":"a","d":1}\n')
    template = from_yaml(
        f"""
name: p
input: {{tail: {src}}}
steps:
  t:
    reduce:
      rename: {{prepend: "x."}}
"""
    )
    runner = run_pipeline_managed(
        template, spark, checkpoint_dir=str(tmp_path / "ckpt"), available_now=True
    )
    runner.query.awaitTermination(120)
    # availableNow query self-terminates -> no longer healthy
    assert not runner.healthy()
    runner.close()
