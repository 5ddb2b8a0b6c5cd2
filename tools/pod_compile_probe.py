#!/usr/bin/env python
"""AOT pod-compile audit: the real TPU toolchain on the multi-chip program.

``jax.experimental.topologies`` compiles for a named TPU topology (e.g.
``v5e:2x4``, ``v5e:4x4``) WITHOUT the chips — the TPU compiler runs on the
host. That turns this box's one-chip limitation into a non-issue for
*compile-level* evidence: we compile the production data-parallel train
step exactly as ``make_train_step`` builds it (GSPMD jit or shard_map,
bf16, remat, multi-step dispatch) for the BASELINE pod topologies and
audit the executable the way the reference could only observe at runtime:

  - **gradient all-reduce bucketing**: how XLA's AllReduceCombiner merged
    the per-tensor gradient reductions (the analog of MXNet kvstore
    'device' merging gradients before the tree-reduce,
    mxnet:src/kvstore/comm.h) — op count, per-bucket bytes, total
    collective bytes per step;
  - **schedule placement**: where the all-reduces sit in the scheduled
    entry computation relative to the backward's conv fusions
    (interleaved = overlap-friendly; all-at-the-end = serialized comm) —
    SURVEY.md §7 hard-part 5's question asked of the actual schedule;
  - **per-device HBM footprint** (argument/temp/output bytes) — validates
    that the pod presets fit, with remat where configured;
  - **program FLOPs** from the compiler's own cost analysis.

This is one level stronger than the CPU-mesh dryrun (``__graft_entry__``):
same program, same shardings, but the real TPU backend's lowering,
fusion, combining and scheduling. Results are recorded in PERF_NOTES.md.

Usage:
  python tools/pod_compile_probe.py --quick                 # tool smoke
  python tools/pod_compile_probe.py --preset imagenet_resnet50
  python tools/pod_compile_probe.py --preset imagenet_resnet152_dp \
      --topology v5e:4x4
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_SHAPE_RE = re.compile(r"([a-z]+\d*)\[([0-9,]*)\]")


def shape_bytes(shape_text: str) -> int:
    """Total bytes of every typed array shape in an HLO result string."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def audit_hlo(txt: str) -> dict:
    """Parse the scheduled post-optimization HLO text of the pod program."""
    m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", txt, re.S)
    body = m.group(1).splitlines() if m else []
    events = []            # (line_idx, kind) in schedule order
    buckets = []           # bytes per all-reduce
    collectives = {}
    for i, ln in enumerate(body):
        ls = ln.strip()
        if not ls or "=" not in ls:
            continue
        op = None
        for name in ("all-reduce-start", "all-reduce-done", "all-reduce",
                     "all-gather", "reduce-scatter", "collective-permute"):
            if f" {name}(" in ls:
                op = name
                break
        if op:
            collectives[op] = collectives.get(op, 0) + 1
            if op in ("all-reduce", "all-reduce-start"):
                # result shape(s) sit between '=' and the op name
                res = ls.split("=", 1)[1].split(op)[0]
                buckets.append(shape_bytes(res))
                events.append((i, "AR"))
            continue
        if "fusion(" in ls or " convolution(" in ls:
            events.append((i, "F"))

    order = [k for _, k in events]
    n_f = order.count("F")
    first_ar = order.index("AR") if "AR" in order else -1
    fus_after_first_ar = order[first_ar:].count("F") if first_ar >= 0 else 0
    # replica-group shapes of the gradient all-reduces: group count x group
    # size per op. Single-slice: groups span the whole mesh. Multi-slice:
    # the compiled program is PER-SLICE (num_partitions = devices/slice),
    # so groups span the slice's partitions and the cross-slice leg rides
    # megascale DCN send/recv pairs audited below.
    group_shapes = {}
    for m2 in re.finditer(
            r"all-reduce(?:-start)?\([^\n]*replica_groups=\{(\{[^}]*\}"
            r"(?:,\{[^}]*\})*)\}", txt):
        groups = [g for g in m2.group(1).strip("{}").split("},{")]
        sizes = sorted({len(g.split(",")) for g in groups})
        key = f"{len(groups)}x{'/'.join(str(s) for s in sizes)}"
        group_shapes[key] = group_shapes.get(key, 0) + 1
    # reduce-scatter INPUT bytes (output bytes x group size): together with
    # the all-reduce bytes this accounts for the full reduced volume when
    # XLA stages RS/ICI -> AR/DCN -> AG/ICI on a multi-slice topology
    rs_input = 0
    for ln in body:
        ls = ln.strip()
        if " reduce-scatter(" not in ls or "=" not in ls:
            continue
        out_b = shape_bytes(ls.split("=", 1)[1].split("reduce-scatter")[0])
        mg = re.search(r"replica_groups=\{(\{[^}]*\})", ls)
        gsz = len(mg.group(1).strip("{}").split(",")) if mg else 1
        rs_input += out_b * gsz
    # cross-slice megascale DCN transfers: host-transfer send ops tagged
    # _xla_megascale_transfer_type; target "{1,2}x{0:7}" = slices 1,2 x
    # per-slice partitions 0..7 (the reduction spans every slice)
    mega_counts, mega_targets, mega_ar_bytes = {}, set(), 0
    for ln in txt.splitlines():
        if "_xla_megascale_transfer_type" not in ln or " send(" not in ln:
            continue
        kind = re.search(
            r'_xla_megascale_transfer_type="([A-Z_]+)"', ln).group(1)
        mega_counts[kind] = mega_counts.get(kind, 0) + 1
        mt = re.search(r'_xla_megascale_target="([^"]*)"', ln)
        if mt:
            mega_targets.add(mt.group(1))
        if kind == "ALL_REDUCE":
            m3 = re.search(r"= \(([a-z]+\d+\[[0-9,]*\])", ln)
            if m3:
                mega_ar_bytes += shape_bytes(m3.group(1))
    # Module-wide collective scan: the ENTRY walk above reads the
    # schedule, but a collective placed inside a NON-entry computation
    # (while body, conditional branch, async-wrapped callee) never
    # appears there. Count call sites across the whole module text so a
    # "collective-free" verdict (serving_pod_probe) cannot be a false
    # positive from schedule placement.
    module_collectives = {}
    for ln2 in txt.splitlines():
        if "=" not in ln2:
            continue
        for name in ("all-reduce-start", "all-reduce-done", "all-reduce",
                     "all-gather", "reduce-scatter", "collective-permute"):
            if f" {name}(" in ln2:
                module_collectives[name] = (
                    module_collectives.get(name, 0) + 1)
                break
    return {
        "collective_op_counts": collectives,
        "collective_op_counts_module": module_collectives,
        "n_allreduce_buckets": len(buckets),
        "allreduce_bucket_bytes": sorted(buckets, reverse=True),
        "allreduce_total_bytes": sum(buckets),
        "allreduce_replica_group_shapes": group_shapes,
        "reduce_scatter_input_bytes": rs_input,
        "megascale_transfer_counts": mega_counts,
        "megascale_targets": sorted(mega_targets),
        "megascale_allreduce_send_bytes": mega_ar_bytes,
        "n_fusions_scheduled": n_f,
        "fusions_after_first_allreduce": fus_after_first_ar,
        "overlap_pct": round(100.0 * fus_after_first_ar / n_f, 1)
        if n_f else 0.0,
        "schedule_tail": "".join(order[-40:]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="imagenet_resnet50",
                   choices=["imagenet_resnet50", "imagenet_resnet152_dp",
                            "cifar10_resnet18"])
    p.add_argument("--topology", default="v5e:2x4",
                   help="TPU topology name (v5e:2x4 = 8 chips; "
                        "v5e:4x4 = the BASELINE configs[4] v5e-16 pod)")
    p.add_argument("--num-slices", type=int, default=1,
                   help="ICI slices of --topology each, connected over "
                        "DCN (multi-process hybrid topology: v5e:2x4 x2 "
                        "= 16 chips across 4 host processes / 2 slices — "
                        "the multi-host analog of the reference's "
                        "dist_sync kvstore over ethernet)")
    p.add_argument("--hlo-out", default=None,
                   help="dump the scheduled post-optimization HLO text "
                        "here (inspection/debugging)")
    p.add_argument("--batch-per-chip", type=int, default=0,
                   help="0 = the preset's per-chip batch")
    p.add_argument("--dp-mode", default=None,
                   help="override the preset's dp_mode (jit | shard_map)")
    p.add_argument("--spd", type=int, default=None,
                   help="steps_per_dispatch override (default: preset; "
                        "the R50 preset ships 4, unrolled)")
    p.add_argument("--dp-comm-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="shard_map gradient all-reduce dtype override")
    p.add_argument("--dp-sync", choices=["step", "dispatch"], default=None,
                   help="sync cadence override (dispatch = the dist_async "
                        "analog: K local steps + one parameter-space pmean "
                        "per program; audit shows the K-fold collective "
                        "cut — shard_map only)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="override the preset's remat (memonger analog) — "
                        "e.g. --no-remat on imagenet_resnet152_dp shows "
                        "the HBM the recompute policy saves")
    p.add_argument("--quick", action="store_true",
                   help="tiny CIFAR-shape program — fast tool check")
    p.add_argument("--pallas-aug", action="store_true",
                   help="compile the Pallas augmentation kernel into the "
                        "program (the shipped TPU path) instead of the "
                        "bit-identical XLA lowering")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies

    from resnet_tpu import config as C
    from resnet_tpu.ops import augment
    from resnet_tpu.parallel.mesh import DATA_AXIS
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.train.steps import make_train_step

    try:
        kw = {"num_slices": args.num_slices} if args.num_slices > 1 else {}
        topo = topologies.get_topology_desc(
            args.topology, platform="tpu", **kw)
    except Exception as e:
        print(json.dumps({"error": f"topology unavailable: {e!r}"}))
        return 1
    n = len(topo.devices)
    if args.num_slices > 1:
        # make_mesh -> create_device_mesh asserts one contiguous physical
        # torus; a multi-slice topology is several. Order the 1-D data
        # mesh slice-major (slice_id, then device id) so replica IDs are
        # contiguous per slice — the layout that lets XLA stage the
        # gradient reduction intra-slice/ICI + cross-slice/DCN.
        devs = sorted(topo.devices,
                      key=lambda d: (getattr(d, "slice_index", 0), d.id))
        mesh = jax.sharding.Mesh(np.array(devs), (DATA_AXIS,))
    else:
        mesh = topologies.make_mesh(topo, (n,), (DATA_AXIS,))

    cfg = getattr(C, args.preset)()
    if args.quick:
        args.preset = "cifar10_resnet18(quick)"
        cfg = C.cifar10_resnet18()
        cfg.model.depth = 20
        cfg.train.batch_size = 8 * n
        cfg.data.num_examples = cfg.train.batch_size * 2
    else:
        per_chip = args.batch_per_chip or max(
            1, cfg.train.batch_size // max(1, cfg.train.num_devices))
        cfg.train.batch_size = per_chip * n
    cfg.train.num_devices = n
    if args.dp_mode:
        cfg.train.dp_mode = args.dp_mode
    if args.dp_sync:
        cfg.train.dp_sync = args.dp_sync
    if args.remat is not None:
        cfg.train.remat = args.remat
    if args.spd is not None:
        cfg.train.steps_per_dispatch = args.spd
    spd = max(1, cfg.train.steps_per_dispatch)

    h, w, c = cfg.data.image_shape
    dtype = jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32
    if args.quick or (h, w) == (32, 32):
        ch, cw = h, w
        aug_fn = lambda imgs, rng, dims=None: augment.augment_cifar(
            imgs, rng, cfg.data, jnp.float32)
    else:
        from resnet_tpu.data.pipeline import canvas_size
        ch, cw = canvas_size((h, w))
        s2d = bool(getattr(cfg.train, "aug_s2d", False))
        if args.pallas_aug:
            from resnet_tpu.ops.augment_pallas import augment_imagenet_pallas
            aug_fn = lambda imgs, rng, dims=None: augment_imagenet_pallas(
                imgs, rng, cfg.data, (h, w), dtype, dims=dims, s2d=s2d)
        else:
            aug_fn = lambda imgs, rng, dims=None: augment.augment_imagenet(
                imgs, rng, cfg.data, (h, w), dtype, dims=dims, s2d=s2d)

    # abstract state (no arrays materialized — works at any model size)
    state_abs = jax.eval_shape(lambda: create_train_state(cfg))

    bs = cfg.train.batch_size
    lead = (spd, bs) if spd > 1 else (bs,)
    batch_abs = {
        "image": jax.ShapeDtypeStruct(lead + (ch, cw, c), jnp.uint8),
        "label": jax.ShapeDtypeStruct(lead, jnp.int32),
    }
    if (ch, cw) != (h, w):
        batch_abs["dims"] = jax.ShapeDtypeStruct(lead + (4,), jnp.int32)

    if args.dp_comm_dtype:
        cfg.train.dp_comm_dtype = args.dp_comm_dtype
    comm_dtype = (jnp.bfloat16
                  if getattr(cfg.train, "dp_comm_dtype", "") == "bfloat16"
                  else None)
    step_fn = make_train_step(
        mesh=mesh, dp_mode=cfg.train.dp_mode, augment_fn=aug_fn,
        steps_per_dispatch=spd, spd_unroll=cfg.train.spd_unroll,
        comm_dtype=comm_dtype,
        dp_sync=getattr(cfg.train, "dp_sync", "step"))

    import time
    tic = time.perf_counter()
    lowered = step_fn.lower(state_abs, batch_abs)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - tic

    report = {
        "preset": args.preset,
        "topology": args.topology,
        "num_slices": args.num_slices,
        "n_processes": len({d.process_index for d in topo.devices}),
        "n_devices": n,
        "dp_mode": cfg.train.dp_mode,
        "global_batch": bs,
        "per_chip_batch": bs // n,
        "steps_per_dispatch": spd,
        "spd_unroll": bool(cfg.train.spd_unroll and spd > 1),
        "remat": cfg.train.remat,
        "dtype": cfg.train.dtype,
        "dp_comm_dtype": getattr(cfg.train, "dp_comm_dtype", "float32"),
        "dp_sync": getattr(cfg.train, "dp_sync", "step"),
        "compile_seconds": round(compile_s, 1),
    }
    hlo_txt = compiled.as_text()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(hlo_txt)
    report.update(audit_hlo(hlo_txt))

    mem = compiled.memory_analysis()
    if mem is not None:
        gb = 1 << 30
        report["hbm_per_device_gb"] = {
            "arguments": round(mem.argument_size_in_bytes / gb, 3),
            "outputs": round(mem.output_size_in_bytes / gb, 3),
            "aliased(donated)": round(mem.alias_size_in_bytes / gb, 3),
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
        report["flops_per_dispatch"] = float(ca.get("flops", float("nan")))
    except Exception:
        pass

    # derived: collective bytes vs model size (ring all-reduce moves
    # 2*(n-1)/n * bucket bytes per chip — report the program-level bytes)
    param_bytes = sum(
        np.prod(l.shape) * l.dtype.itemsize
        for l in jax.tree.leaves(state_abs.params))
    report["param_bytes"] = int(param_bytes)
    report["allreduce_bytes_over_param_bytes"] = (
        round(report["allreduce_total_bytes"] / max(1, param_bytes), 2))
    # multi-slice programs stage the reduction (RS/ICI -> megascale
    # AR/DCN -> AG/ICI); AR + RS-input together cover the reduced volume
    report["reduced_bytes_over_param_bytes"] = (
        round((report["allreduce_total_bytes"]
               + report["reduce_scatter_input_bytes"])
              / max(1, param_bytes), 2))

    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
