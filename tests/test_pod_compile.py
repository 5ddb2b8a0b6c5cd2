"""AOT pod-compile audit gate (tools/pod_compile_probe.py).

Compiles the production DP train step for a REAL multi-chip TPU topology
(``v5e:2x4`` — 8 chips) through ``jax.experimental.topologies``; no TPU
hardware is needed (the TPU compiler runs on the host), but the TPU
compiler plugin (libtpu) must be importable — on boxes without it the
test SKIPs.

This pins, at the actual-TPU-toolchain level, the two facts the CPU-mesh
dryrun (``__graft_entry__.dryrun_multichip``) cannot see:

  - the gradient all-reduce exists, spans the data mesh, and moves ~1x
    the parameter bytes per step (the kvstore-'device' reduce analog,
    mxnet:src/kvstore/comm.h — each gradient reduced exactly once);
  - the scheduler interleaves those all-reduces with the backward's conv
    fusions rather than serializing all comm after all compute
    (SURVEY.md §7 hard-part 5: "verify XLA overlaps gradient all-reduce
    with backward").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.integration
def test_pod_compile_audit_quick():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pod_compile_probe.py"),
         "--quick"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": ""})
    if proc.returncode != 0:
        pytest.skip(f"TPU AOT toolchain unavailable: {proc.stdout[-300:]} "
                    f"{proc.stderr[-300:]}")
    report = json.loads(proc.stdout)
    if "error" in report:
        pytest.skip(f"TPU AOT toolchain unavailable: {report['error']}")

    assert report["n_devices"] == 8
    assert report["collective_op_counts"].get("all-reduce", 0) > 0, report

    # every gradient reduced exactly once: total all-reduce bytes ~= the
    # fp32 parameter bytes (combiner merges buckets, it must not add or
    # drop tensors). Loose band: metrics/loss scalars ride along.
    ratio = report["allreduce_bytes_over_param_bytes"]
    assert 0.9 <= ratio <= 1.2, report

    # overlap-friendly schedule: a healthy majority of the program's
    # fusions are scheduled AFTER the first all-reduce (comm interleaved
    # with remaining backward), not comm-after-all-compute.
    assert report["fusions_after_first_allreduce"] >= 10, report

    # the pod program fits trivially at quick shapes
    assert report["hbm_per_device_gb"]["total_live"] < 1.0, report
