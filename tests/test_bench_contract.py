"""Driver-contract test for bench.py: runs --quick in a subprocess on CPU
and validates the ONE-JSON-line output format the driver parses."""

import json
import os
import subprocess
import sys


def test_bench_quick_json_contract():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--quick"],
        capture_output=True, text=True, timeout=480, cwd=repo, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
