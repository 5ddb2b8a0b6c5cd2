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
    # with remaining backward), not comm-after-all-compute. Measured
    # 88.3% on the quick program (94.4% on the 2-slice variant; >=90% on
    # the full-size R50/R152 programs, audits/); a serialized
    # comm-after-all-compute schedule scores ~0.
    assert report["fusions_after_first_allreduce"] >= 10, report
    assert report["overlap_pct"] >= 75.0, report

    # the pod program fits trivially at quick shapes
    assert report["hbm_per_device_gb"]["total_live"] < 1.0, report


@pytest.mark.integration
def test_serving_pod_compile_collective_free():
    """Serving mirror of the pod audit (tools/serving_pod_probe.py): the
    batch-sharded inference program (the --serve-devices export layout,
    replicated weights + batch over the 1-D data mesh) compiled for the
    v5e:2x4 topology must contain ZERO cross-device collectives — the
    property that makes batch-parallel serving scale linearly over ICI.
    Any collective here would be silent cross-chip serialization in the
    serving pod (the reference's multi-GPU serving equivalent simply runs
    independent processes; ours must be exactly as independent inside one
    program)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "serving_pod_probe.py"),
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
    assert report["collective_free"], report
    assert report["collective_op_counts"] == {}, report
    # module-wide scan: no collective hiding in a non-entry computation
    assert report["collective_op_counts_module"] == {}, report
    # the program still does real work (fusions scheduled) and fits
    assert report["n_fusions_scheduled"] > 0, report
    # memory_analysis() can return None on some AOT builds; the HBM
    # bound is gated only when the toolchain reports it
    if "hbm_per_device_gb" in report:
        assert report["hbm_per_device_gb"]["total_live"] < 1.0, report


@pytest.mark.integration
def test_pod_compile_audit_two_slice_dcn():
    """2-slice hybrid topology (VERDICT r3 #4b): v5e:2x4 x2 = 16 chips in
    2 ICI slices / 4 host processes, cross-slice comm over DCN — the
    multi-host analog of the reference's dist_sync kvstore over ethernet
    (mxnet:src/kvstore/kvstore_dist.h). XLA compiles the PER-SLICE
    program (num_partitions = 8) and stages the gradient reduction
    reduce-scatter/ICI -> megascale ALL_REDUCE/DCN -> all-gather/ICI;
    the audit must see every leg of that pattern — a missing DCN leg
    would be a silent per-slice-only reduction."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pod_compile_probe.py"),
         "--quick", "--num-slices", "2"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": ""})
    if proc.returncode != 0:
        pytest.skip(f"TPU AOT toolchain unavailable: {proc.stdout[-300:]} "
                    f"{proc.stderr[-300:]}")
    report = json.loads(proc.stdout)
    if "error" in report:
        pytest.skip(f"TPU AOT toolchain unavailable: {report['error']}")

    assert report["n_devices"] == 16
    assert report["num_slices"] == 2
    assert report["n_processes"] == 4
    assert report["collective_op_counts"].get("all-reduce", 0) > 0, report

    # intra-slice legs ride ICI: every all-reduce group spans the full
    # 8-partition slice (groups are in per-slice partition ids)
    shapes = report["allreduce_replica_group_shapes"]
    assert shapes, report
    for key in shapes:
        n_groups, sizes = key.split("x")
        for s in sizes.split("/"):
            assert int(n_groups) * int(s) == 8, (key, report)

    # the cross-slice leg rides DCN: megascale ALL_REDUCE transfers whose
    # target names BOTH slices ("{1,2}x{0:7}")
    assert report["megascale_transfer_counts"].get("ALL_REDUCE", 0) > 0, \
        report
    assert any(t.startswith("{1,2}x") for t in report["megascale_targets"]
               ), report
    # per-device DCN volume: at least the reduce-scattered shard of the
    # gradients, at most the full gradient vector
    pb = report["param_bytes"]
    assert 0.1 * pb <= report["megascale_allreduce_send_bytes"] <= 1.2 * pb, \
        report

    # AR + RS-input together reduce the full gradient volume exactly once
    ratio = report["reduced_bytes_over_param_bytes"]
    assert 0.9 <= ratio <= 1.3, report
    assert report["fusions_after_first_allreduce"] >= 10, report
    assert report["overlap_pct"] >= 75.0, report
