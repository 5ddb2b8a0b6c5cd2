#!/usr/bin/env python
"""Benchmark of record: ResNet-50 ImageNet training throughput (img/s/chip).

Measures the Speedometer metric the reference reports (samples/sec of the
train loop — SURVEY.md §6): uint8 canvas batches -> on-device augmentation
(random-resized-crop as MXU matmuls, mirror, normalize) -> forward/backward
-> MXNet-semantics SGD update, everything in one jitted XLA program, bf16.

Input batches are pre-staged into a rotating pool of device buffers: on
real TPU hosts the uint8 H2D DMA overlaps compute via the prefetch queue
(data/prefetch.py), but on this box the axon relay serializes transfers
against execution (~20x slowdown, see PERF_NOTES.md §4), which would
benchmark the tunnel rather than the machine. `--host-data` measures the
full host->device path instead.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
vs_baseline is against the binding 3000 img/s/chip target (BASELINE.md;
the MXNet reference: ~360-400 img/s per V100).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes for CPU smoke-testing")
    p.add_argument("--network", choices=["resnet", "resnext"],
                   default="resnet")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = auto: the shipped preset's per-chip batch "
                        "(128 — the measured MXU-lane optimum, family-wide "
                        "since the round-5 batch sweep)")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--windows", type=int, default=3,
                   help="measurement windows of --steps each; the MEDIAN "
                        "window rate is reported (robust to the ~±2% "
                        "axon-relay noise, no max-inflation)")
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="default: the shipped preset's dtype (bfloat16 — "
                        "the north-star dtype; BASELINE.md)")
    p.add_argument("--eval", dest="eval_mode", action="store_true",
                   help="measure INFERENCE throughput (eval_step: "
                        "running-stats BN forward + in-graph metrics on "
                        "center-ready uint8 inputs) instead of the train "
                        "loop — the serving/validation-scoring path")
    p.add_argument("--no-augment", action="store_true",
                   help="skip on-device augmentation (pure model step)")
    p.add_argument("--augment-impl",
                   choices=["auto", "pallas", "pallas-split", "xla"],
                   default="auto",
                   help="on-device augmentation lowering (auto = the "
                        "trainer's selection rule; pallas-split = the "
                        "pre-round-4 split-photometric kernel, f32 "
                        "intermediate + XLA HSL)")
    p.add_argument("--aug-s2d", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="augmenter emits space-to-depth blocks straight "
                        "into the pre-blocked stem (needs stem_s2d; "
                        "deletes the regroup copies — round 4)")
    p.add_argument("--max-rotate-angle", type=float, default=0.0,
                   help="enable the IN-GRAPH rotate/shear path (uniform "
                        "degrees in [-a, a]) to measure its cost — the "
                        "gather cliff, measured 217 img/s. Production "
                        "ships rotate_backend=host (the record pipeline "
                        "warps on the CPU; data/host_warp.py), which the "
                        "device step never sees")
    p.add_argument("--canvas", type=int, default=0,
                   help="input canvas edge fed to the on-device augmenter "
                        "(0 = auto: the shipped letterbox canvas, 256 for "
                        "224 output — what the record pipeline feeds; "
                        "rounds r1/r2 measured 224-canvas inputs)")
    p.add_argument("--host-data", action="store_true",
                   help="include per-step host->device transfer")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="run K SGD steps per dispatched program (lax.scan "
                        "over K stacked batches — the run-ahead analog of "
                        "the reference's dependency engine); default: the "
                        "shipped preset's choice")
    p.add_argument("--spd-unroll", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="with --steps-per-dispatch K: unroll the K-step "
                        "scan so XLA schedules across step boundaries "
                        "(default: the shipped preset's choice)")
    p.add_argument("--stem-s2d", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="space-to-depth stem conv lowering (exact 7x7/2 "
                        "-> 4x4/1 reindex, 4x MXU lane occupancy on the "
                        "C=3 stem; default: the shipped preset's choice)")
    p.add_argument("--pool-grad", choices=["sas", "mask"], default=None,
                   help="stem maxpool backward: 'sas' = canonical "
                        "select_and_scatter, 'mask' = parallel "
                        "tie-splitting VJP (ops/pool.py; default: the "
                        "shipped preset's choice)")
    p.add_argument("--pool", type=int, default=4,
                   help="pre-staged device batch pool size")
    p.add_argument("--unit-chain", choices=["off", "xla", "pallas"],
                   default="off",
                   help="chain dataflow for v1 bottleneck units")
    p.add_argument("--grouped-dense", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="ResNeXt grouped 3x3 as block-diagonal dense conv "
                        "(default: the shipped preset's choice)")
    p.add_argument("--grouped-merge", type=int, default=None,
                   help="groups fused per dense block (0 = all; default: "
                        "the shipped preset's choice)")
    p.add_argument("--bn-subsample", type=int, default=None,
                   help="BN stats from batch//s leading images (s=8 at "
                        "batch 256 matches the reference's per-GPU "
                        "32-image BN stats sample count); 1 = sync-BN-"
                        "style full-batch stats. Default: the shipped "
                        "preset's choice — the benchmark of record "
                        "measures what the trainer ships. Forced to 1 "
                        "when --unit-chain computes full-batch stats "
                        "in-kernel")
    p.add_argument("--bn-grouped", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="with --bn-subsample s: normalize s independent "
                        "groups, each with its own stats — the exact "
                        "single-chip analog of per-GPU BatchNorm "
                        "(default: the shipped preset's choice)")
    p.add_argument("--bn-ema", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="bn-ema mode (PERF_NOTES round 3c; the shipped "
                        "imagenet_resnet50 default): live batch mean "
                        "(gradient-carrying) + stop-gradient clamped "
                        "variance + radial-projection optimizer — kills "
                        "the BN backward's activation re-read. The "
                        "benchmark measures the steady-state ema program "
                        "(training runs prime it with a 2-epoch "
                        "batch-stats warmup). --no-bn-ema measures "
                        "reference-exact full-batch BN")
    p.add_argument("--bn-stat-stride", type=int, default=None,
                   help="BN stats from every s-th spatial row/column of "
                        "ALL images (1/s^2 stats-sweep traffic; keeps "
                        "every image in the sample, unlike --bn-subsample). "
                        "Default: the shipped preset's choice")
    p.add_argument("--remat-policy", choices=["none", "conv"],
                   default="none",
                   help="selective remat: save conv outs + BN stats only")
    p.add_argument("--xla-opts", default=None,
                   help="k=v[,k=v] XLA compiler options; 'off' disables "
                        "the measured TPU defaults (utils/xla_opts.py)")
    p.add_argument("--dp-mode", choices=["none", "jit", "shard_map"],
                   default="none",
                   help="build the step over a device mesh (GSPMD jit = "
                        "global-batch BN; shard_map = per-replica BN)")
    args = p.parse_args()

    import jax

    # honor an explicit JAX_PLATFORMS request (the axon sitecustomize
    # overrides the env var, so tests that want the CPU backend — e.g.
    # the driver-contract test — would silently run on the TPU relay)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp
    import numpy as np

    from resnet_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from resnet_tpu.config import imagenet_resnet50, imagenet_resnext50
    from resnet_tpu.ops import augment
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.train.steps import make_train_step

    # start from the SHIPPED preset for the measured family — the
    # benchmark of record measures the trainer's defaults (BN statistics
    # mode, grouped-conv lowering); flags override individual knobs
    cfg = (imagenet_resnext50() if args.network == "resnext"
           else imagenet_resnet50())
    cfg.model.network = args.network
    cfg.model.depth = args.depth
    if args.dtype is not None:
        cfg.train.dtype = args.dtype
    cfg.train.unit_chain = args.unit_chain
    if args.grouped_dense is not None:
        cfg.train.grouped_dense = args.grouped_dense
    if args.grouped_merge is not None:
        cfg.train.grouped_merge = args.grouped_merge
    if args.bn_subsample is not None:
        cfg.train.bn_subsample = args.bn_subsample
        if not args.bn_grouped:
            cfg.train.bn_grouped = False
    if args.bn_grouped is not None:
        cfg.train.bn_grouped = args.bn_grouped
    if args.bn_stat_stride is not None:
        cfg.train.bn_stat_stride = args.bn_stat_stride
    if args.bn_ema is not None:
        cfg.train.bn_ema = args.bn_ema
        if args.bn_ema and args.bn_grouped is None:
            cfg.train.bn_grouped = False   # ema vs grouped: registry guard
    elif cfg.train.bn_ema and (args.bn_grouped or args.bn_subsample):
        # an explicit batch-stats BN mode request overrides the preset's
        # bn-ema default (the two don't compose — registry guard)
        print("# explicit BN-mode flags: forcing --no-bn-ema",
              file=sys.stderr)
        cfg.train.bn_ema = False
    if args.unit_chain != "off" and cfg.train.bn_stat_stride != 1:
        print(f"# --unit-chain {args.unit_chain}: forcing --bn-stat-stride 1",
              file=sys.stderr)
        cfg.train.bn_stat_stride = 1
    if args.unit_chain != "off" and cfg.train.bn_subsample != 1:
        # the chain dataflow computes full-batch stats in-kernel and does
        # not compose with sub-batch BN stats (models/registry.py guard);
        # a sub-batch default would otherwise make every --unit-chain
        # run crash
        print(f"# --unit-chain {args.unit_chain}: forcing --bn-subsample 1",
              file=sys.stderr)
        cfg.train.bn_subsample = 1
        cfg.train.bn_grouped = False
    if args.unit_chain != "off" and cfg.train.bn_ema:
        print(f"# --unit-chain {args.unit_chain}: forcing --no-bn-ema",
              file=sys.stderr)
        cfg.train.bn_ema = False
    if args.steps_per_dispatch is not None:
        cfg.train.steps_per_dispatch = args.steps_per_dispatch
    if args.spd_unroll is not None:
        cfg.train.spd_unroll = args.spd_unroll
    if args.stem_s2d is not None:
        cfg.train.stem_s2d = args.stem_s2d
    if args.pool_grad is not None:
        cfg.train.pool_grad = args.pool_grad
    spd = max(1, cfg.train.steps_per_dispatch)
    cfg.train.remat_policy = args.remat_policy
    cfg.data.max_rotate_angle = args.max_rotate_angle
    if args.quick:
        cfg.model.depth = 18
        cfg.data.image_shape = (64, 64, 3)
        cfg.train.batch_size = 8
        if args.steps == 30:
            args.steps, args.warmup = 4, 2
    elif args.batch_size:
        cfg.train.batch_size = args.batch_size
    elif args.depth != 50:
        # round-5 family batch sweep: the bs128 MXU-lane optimum
        # transfers to depth — R101 2029.8 (+8.7% over bs256), R152
        # 1464.7 (+14.4% over bs192) — so family rows measure bs128 too
        cfg.train.batch_size = 128
    # else: keep the shipped preset's batch — the benchmark of record
    # measures the trainer's defaults (bs128 for R50 since round 3d)
    bs = cfg.train.batch_size

    dtype = jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32
    if args.aug_s2d is not None:
        cfg.train.aug_s2d = args.aug_s2d
    aug_s2d = (cfg.train.aug_s2d and cfg.train.stem_s2d
               and not args.eval_mode and not args.no_augment
               and not args.quick)
    aug_fn = None
    if not args.no_augment:
        # Mosaic (Pallas) kernels cannot be GSPMD-auto-partitioned: under
        # --dp-mode jit on a >1-device mesh use the bit-identical XLA
        # lowering (train/solver.py _augment_fns has the same rule)
        multi_jit = args.dp_mode == "jit" and len(jax.devices()) > 1
        use_pallas = (jax.default_backend() == "tpu" and not multi_jit
                      if args.augment_impl == "auto"
                      else args.augment_impl.startswith("pallas"))
        if use_pallas:
            from resnet_tpu.ops.augment_pallas import augment_imagenet_pallas
            split = args.augment_impl == "pallas-split"
            aug_fn = lambda imgs, rng, dims=None: augment_imagenet_pallas(
                imgs, rng, cfg.data, cfg.data.image_shape[:2], dtype,
                dims=dims, split_photometric=split, s2d=aug_s2d)
        else:
            aug_fn = lambda imgs, rng, dims=None: augment.augment_imagenet(
                imgs, rng, cfg.data, cfg.data.image_shape[:2], dtype,
                dims=dims, s2d=aug_s2d)

    from resnet_tpu.utils.xla_opts import compiler_options
    mesh = None
    if args.dp_mode != "none":
        from resnet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(len(jax.devices()))
    state = create_train_state(cfg)
    if args.eval_mode:
        # serving path: exact-size uint8 in, normalize fused into the
        # forward program (the val iterator's center crop happens at
        # decode; see data/loader.py val transform)
        from resnet_tpu.train.steps import make_eval_step
        aug_fn = None
        pre = lambda im: augment.normalize(
            im, cfg.data.mean_rgb, cfg.data.std_rgb, dtype)
        ev_fn = make_eval_step(
            mesh=mesh, dp_mode=args.dp_mode if mesh is not None else "jit",
            preprocess_fn=pre)
        step_fn = lambda st, b: (st, ev_fn(st, b))
    else:
        step_fn = make_train_step(
            mesh=mesh, dp_mode=args.dp_mode if mesh is not None else "jit",
            augment_fn=aug_fn,
            compiler_options=compiler_options(args.xla_opts),
            steps_per_dispatch=spd, spd_unroll=cfg.train.spd_unroll)

    h, w, c = cfg.data.image_shape
    if aug_fn is not None and not args.quick:
        # measure the SHIPPED input conditions: the record pipeline feeds
        # letterboxed canvases (256x256 for 224 output) + per-image dims,
        # and the augmenter crops in the full-image domain
        # (data/pipeline.py canvas contract)
        from resnet_tpu.data.pipeline import canvas_size
        ch, cw = canvas_size((h, w), override=args.canvas)
    else:
        ch, cw = h, w
    if args.eval_mode:
        spd = 1   # the serving path dispatches per request batch
    lead = (spd, bs) if spd > 1 else (bs,)
    rng = np.random.default_rng(0)
    host_batches = [{
        "image": rng.integers(0, 256, lead + (ch, cw, c), dtype=np.uint8),
        "label": rng.integers(0, cfg.data.num_classes, lead,
                              dtype=np.int32),
    } for _ in range(args.pool)]
    if (ch, cw) != (h, w):
        # full-canvas dims (orig == eff == canvas): the shipped program
        # shape — synthetic stand-in for shorter-side-256 pack letterboxes
        for b in host_batches:
            b["dims"] = np.broadcast_to(
                np.asarray([ch, cw, ch, cw], np.int32),
                lead + (4,)).copy()

    def sync(metrics):
        # forced host readback — the only reliable sync on this backend
        return float(metrics["count"])

    if mesh is not None:
        if spd > 1:
            from resnet_tpu.parallel.mesh import stacked_batch_sharded
            sh = stacked_batch_sharded(mesh)
            put = lambda b: jax.device_put(b, sh)
        else:
            from resnet_tpu.parallel.mesh import shard_batch
            put = lambda b: shard_batch(mesh, b)
    else:
        put = jax.device_put
    if args.host_data:
        get_batch = lambda i: put(host_batches[i % args.pool])
    else:
        pool = [put(b) for b in host_batches]
        sync_pool = [jax.jit(lambda b: b["label"].sum())(b) for b in pool]
        _ = [float(x) for x in sync_pool]
        get_batch = lambda i: pool[i % args.pool]

    for i in range(args.warmup):
        state, metrics = step_fn(state, get_batch(i))
    if args.warmup:
        sync(metrics)

    # median of N measurement windows: the axon relay adds ~±2% run-to-run
    # noise (PERF_NOTES.md); the median is robust to a one-off hiccup in
    # either direction without inflating the number the way max would.
    rates = []
    for w in range(max(1, args.windows)):
        tic = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step_fn(state, get_batch(w * args.steps + i))
        sync(metrics)
        elapsed = time.perf_counter() - tic
        rates.append(args.steps * spd * bs / elapsed)
    rates.sort()
    imgs_per_sec = rates[len(rates) // 2]
    # default (mesh=None): single-device jit — the whole batch runs on ONE
    # chip regardless of how many the host exposes, so divide by 1. With
    # --dp-mode the step spans the whole mesh: divide by its size.
    per_chip = imgs_per_sec / (1 if mesh is None else len(jax.devices()))
    baseline = 3000.0  # BASELINE.md: img/s/chip target, v5e, ResNet-50 bf16
    kind = "eval" if args.eval_mode else "train"
    name = f"{cfg.model.network}{cfg.model.depth}_{kind}_throughput"
    if args.quick:
        name += "_quick"
    if args.no_augment:
        name += "_noaug"
    if args.augment_impl != "auto":
        name += f"_aug{args.augment_impl.replace('-', '_')}"
    if args.canvas:
        name += f"_canvas{args.canvas}"
    if args.max_rotate_angle:
        name += f"_rot{int(args.max_rotate_angle)}"
    if args.unit_chain != "off":
        name += f"_chain_{args.unit_chain}"
    if cfg.train.grouped_dense:
        name += "_gdense"
        if cfg.train.grouped_merge:
            name += f"{cfg.train.grouped_merge}"
    if cfg.train.bn_ema:
        name += f"_bnema{cfg.train.bn_subsample}"
    elif cfg.train.bn_subsample > 1:
        name += (f"_bngroup{cfg.train.bn_subsample}" if cfg.train.bn_grouped
                 else f"_bnsub{cfg.train.bn_subsample}")
    if cfg.train.bn_stat_stride > 1:
        name += f"_bnstride{cfg.train.bn_stat_stride}"
    if args.remat_policy != "none":
        name += f"_remat_{args.remat_policy}"
    if args.dp_mode != "none":
        name += f"_dp_{args.dp_mode}"
    if spd > 1:
        name += f"_spd{spd}"
        if cfg.train.spd_unroll:
            name += "u"
    if cfg.train.stem_s2d:
        name += "_s2d"
    if aug_s2d:
        name += "_augs2d"
    if cfg.train.pool_grad != "sas":
        name += f"_pg{cfg.train.pool_grad}"
    if args.host_data:
        name += "_hostdata"
    print("# window rates (img/s):",
          [round(r, 1) for r in rates], file=sys.stderr)
    print(json.dumps({
        "metric": name,
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / baseline, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
