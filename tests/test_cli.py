"""CLI (python -m cdp_spark) — parity with `cdp [OPTION]... PIPELINEFILE`
(src/index.ts:10-57).  Validation modes run in-process via main();
the full batch run is exercised once through a real subprocess."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from cdp_spark.__main__ import main

VALID = """
name: p
input: {stdin: }
steps:
  tag:
    reduce:
      rename: {prepend: "x."}
"""

INVALID = """
name: p
input: {stdin: }
steps:
  bad:
    after: [missing-step]
    reduce:
      rename: {prepend: "x."}
"""


def test_check_only_ok(tmp_path, capsys):
    f = tmp_path / "p.yaml"
    f.write_text(VALID)
    assert main(["-t", str(f)]) == 0
    assert "looks OK" in capsys.readouterr().out


def test_check_only_invalid(tmp_path, capsys):
    f = tmp_path / "p.yaml"
    f.write_text(INVALID)
    assert main(["-t", str(f)]) == 1
    assert capsys.readouterr().err.strip()


def test_missing_file_is_error(capsys):
    assert main(["-t", "/nonexistent/pipeline.yaml"]) == 1


def test_envsubst_flag(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("CDP_TEST_PREFIX", "pre.")
    f = tmp_path / "p.yaml"
    f.write_text(
        """
name: p
input: {stdin: }
steps:
  tag:
    reduce:
      rename: {prepend: "${CDP_TEST_PREFIX}"}
"""
    )
    assert main(["-e", "-t", str(f)]) == 0


def test_batch_run_subprocess(tmp_path):
    f = tmp_path / "p.yaml"
    f.write_text(VALID)
    proc = subprocess.run(
        [sys.executable, "-m", "cdp_spark", str(f)],
        input='{"n":"a","d":1}\n{"n":"b","d":2}\n',
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    events = [json.loads(line) for line in proc.stdout.splitlines() if line.startswith("{")]
    assert [(e["n"], e["d"]) for e in events] == [("x.a", 1), ("x.b", 2)]


def test_streaming_run_serves_metrics(tmp_path, monkeypatch):
    """The CLI wires PipelineMetrics into the managed runner and
    serves the Prometheus exposition behind the reference's env
    contract (src/conf.ts:190-208) — wiring checked with a stubbed
    runner, no Spark session."""
    import urllib.request

    import cdp_spark.__main__ as cli

    pipeline = tmp_path / "p.yaml"
    pipeline.write_text(
        """
name: m
input:
  generator:
    seconds: 1
steps: {}
"""
    )
    seen = {}

    class FakeQuery:
        def awaitTermination(self):
            # scrape while the "pipeline" runs
            with urllib.request.urlopen(
                "http://127.0.0.1:18001/custom-metrics"
            ) as r:
                seen["body"] = r.read().decode()

    class FakeRunner:
        query = FakeQuery()

        def close(self):
            pass

    def fake_managed(template, spark, metrics=None, **kw):
        seen["metrics"] = metrics
        return FakeRunner()

    class FakeSpark:
        def stop(self):
            pass

    monkeypatch.setenv("METRICS_EXPOSITION_PORT", "18001")
    monkeypatch.setenv("METRICS_EXPOSITION_PATH", "/custom-metrics")
    monkeypatch.setattr("cdp_spark.streaming.run_pipeline_managed", fake_managed)
    monkeypatch.setattr("cdp_spark.session.get_spark", lambda name: FakeSpark())
    assert cli.main([str(pipeline)]) == 0
    assert seen["metrics"] is not None
    assert "cdp_queued_events 0" in seen["body"]
    assert "cdp_backpressure 0" in seen["body"]


def test_streaming_run_metrics_disabled_by_empty_path(tmp_path, monkeypatch):
    import cdp_spark.__main__ as cli

    pipeline = tmp_path / "p.yaml"
    pipeline.write_text(
        """
name: m
input:
  generator:
    seconds: 1
steps: {}
"""
    )

    class FakeRunner:
        class query:
            @staticmethod
            def awaitTermination():
                pass

        def close(self):
            pass

    class FakeSpark:
        def stop(self):
            pass

    monkeypatch.setenv("METRICS_EXPOSITION_PATH", "")
    monkeypatch.setattr(
        "cdp_spark.streaming.run_pipeline_managed",
        lambda template, spark, metrics=None, **kw: FakeRunner(),
    )
    monkeypatch.setattr("cdp_spark.session.get_spark", lambda name: FakeSpark())
    assert cli.main([str(pipeline)]) == 0
