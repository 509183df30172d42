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
