#!/usr/bin/env python
"""AOT serving-pod audit: the real TPU toolchain on the sharded inference
program.

The training side's pod evidence (tools/pod_compile_probe.py) audits the
gradient all-reduce structure. This is its SERVING mirror: compile the
batch-sharded inference program (the ``--serve-devices N`` export of
tools/serve_export.py — the reference's ``load_checkpoint`` +
``bind(for_training=False)`` serving process, SURVEY.md §3.4, scaled the
TPU way) for a named TPU topology via ``jax.experimental.topologies`` and
audit the executable for the property that makes batch-parallel serving
scale linearly over ICI:

  - **zero cross-device collectives** — replicated weights + a
    batch-sharded input partition the program perfectly, so XLA must
    insert NO all-reduce/all-gather/reduce-scatter/collective-permute;
    any collective in the scheduled HLO would be silent cross-chip
    serialization on the serving pod;
  - **per-device HBM** — weights are replicated (unsharded) on every
    chip; the audit records the live footprint at the serving batch;
  - **per-device FLOPs** from the compiler's cost analysis.

No chips are needed: the TPU compiler runs on the host (the same
mechanism as the train-side audits; results recorded in PERF_NOTES.md).

The program audited here is ``make_serving_fn``'s, with the weights as
ARGUMENTS rather than baked-in constants — identical structure to the
exported artifact modulo constant-folding of the weights, which cannot
introduce collectives.

Usage:
  python tools/serving_pod_probe.py --quick            # tool smoke
  python tools/serving_pod_probe.py                    # R50 on v5e:2x4
  python tools/serving_pod_probe.py --topology v5e:4x4 # BASELINE pod
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pod_compile_probe import audit_hlo  # noqa: E402  (same toolbox)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="imagenet_resnet50",
                   choices=["imagenet_resnet50", "imagenet_resnext50",
                            "cifar10_resnet18"])
    p.add_argument("--topology", default="v5e:2x4",
                   help="TPU topology name (v5e:2x4 = 8 chips; v5e:4x4 = "
                        "the BASELINE configs[4] v5e-16 pod)")
    p.add_argument("--batch-per-chip", type=int, default=128,
                   help="serving batch per chip (128 = the measured "
                        "inference optimum, PERF_NOTES serving sweep)")
    p.add_argument("--hlo-out", default=None)
    p.add_argument("--quick", action="store_true",
                   help="tiny CIFAR-shape program — fast tool check")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from resnet_tpu import config as C
    from resnet_tpu.parallel.mesh import DATA_AXIS
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.utils.serving import make_serving_fn

    try:
        topo = topologies.get_topology_desc(args.topology, platform="tpu")
    except Exception as e:
        print(json.dumps({"error": f"topology unavailable: {e!r}"}))
        return 1
    n = len(topo.devices)
    mesh = topologies.make_mesh(topo, (n,), (DATA_AXIS,))

    cfg = getattr(C, args.preset)()
    if args.quick:
        args.preset = "cifar10_resnet18(quick)"
        cfg = C.cifar10_resnet18()
        cfg.model.depth = 20
        args.batch_per_chip = min(args.batch_per_chip, 8)

    # Same program as make_serving_fn / the export, with the weights as
    # arguments: close over nothing, thread (params, batch_stats) through.
    def serve(params, batch_stats, images_u8):
        return make_serving_fn(cfg, params, batch_stats)(images_u8)

    state_abs = jax.eval_shape(lambda: create_train_state(cfg))
    h, w, c = cfg.data.image_shape
    bs = args.batch_per_chip * n
    batch_abs = jax.ShapeDtypeStruct((bs, h, w, c), jnp.uint8)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))
    jitted = jax.jit(
        serve,
        in_shardings=(jax.tree.map(lambda _: repl, state_abs.params),
                      jax.tree.map(lambda _: repl, state_abs.batch_stats),
                      shard),
        out_shardings=shard)

    import time
    tic = time.perf_counter()
    compiled = jitted.lower(
        state_abs.params, state_abs.batch_stats, batch_abs).compile()
    compile_s = time.perf_counter() - tic

    report = {
        "preset": args.preset,
        "topology": args.topology,
        "n_devices": n,
        "global_batch": bs,
        "per_chip_batch": args.batch_per_chip,
        "compute_dtype": cfg.train.dtype,
        "compile_seconds": round(compile_s, 1),
    }
    hlo_txt = compiled.as_text()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(hlo_txt)
    audit = audit_hlo(hlo_txt)
    report["collective_op_counts"] = audit["collective_op_counts"]
    # verdict keys off the MODULE-wide scan: a collective hidden in a
    # non-entry computation (while body / conditional) must count too
    report["collective_op_counts_module"] = (
        audit["collective_op_counts_module"])
    report["collective_free"] = not audit["collective_op_counts_module"]
    report["n_fusions_scheduled"] = audit["n_fusions_scheduled"]

    mem = compiled.memory_analysis()
    if mem is not None:
        gb = 1 << 30
        report["hbm_per_device_gb"] = {
            "arguments": round(mem.argument_size_in_bytes / gb, 3),
            "outputs": round(mem.output_size_in_bytes / gb, 3),
            "temp": round(mem.temp_size_in_bytes / gb, 3),
            "total_live": round(
                (mem.argument_size_in_bytes + mem.output_size_in_bytes
                 + mem.temp_size_in_bytes - mem.alias_size_in_bytes) / gb,
                3),
        }
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        report["flops_per_device_per_batch"] = float(
            ca.get("flops", float("nan")))
    except Exception:
        pass

    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
