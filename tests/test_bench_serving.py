"""Contract smoke for tools/bench_serving.py: --quick on CPU must emit one
JSON line with the artifact-vs-live serving comparison (the real-chip runs
recorded in PERF_NOTES round 5 use the same code path at full shapes)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.integration
def test_bench_serving_quick_json_contract():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_serving.py"),
         "--quick"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    assert rec["live_jit"] > 0
    # same program both ways; on CPU the ratio can wobble with host noise,
    # so the gate is loose — the real-chip ratio of record is ~1.00
    assert 0.5 < rec["artifact_vs_live"] < 2.0
    assert rec["platform"] == "cpu"
