"""The examples are the switch-over story for a reference user — they
must actually run. Each executes in a subprocess (own SparkSession, like
a user would) against the sf0.001 fixtures."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str) -> str:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True, text=True, timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_lakehouse_example_runs_end_to_end(tmp_path):
    out = _run("lakehouse.py")
    # the load-bearing demo lines, not exact numbers
    assert "dv delete: rewrote 0 files (added=[], same files: True" in out
    assert "restore: back to" in out
    assert "opens" in out and "files" in out  # pruned scan evidence
    assert "zero jobs" in out                 # metadata-only count
    assert "replay applies 0" in out          # exactly-once sync
    assert "vacuum: dropped versions" in out


def test_run_pipeline_example_runs_end_to_end(tmp_path):
    out = _run("run_pipeline.py")
    assert out.strip(), "pipeline example produced no output"
