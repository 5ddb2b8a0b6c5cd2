#!/usr/bin/env python
"""Serving-artifact throughput: exported StableHLO vs the live jit path.

The serving export (utils/serving.py) replaces the reference's deploy
pair (``prefix-symbol.json`` + ``prefix-NNNN.params`` loaded by
``mx.model.load_checkpoint`` and bound ``for_training=False`` — SURVEY.md
§3.4) with a self-contained ``jax.export`` artifact. This tool proves the
round-trip costs nothing at runtime: it clocks the SAME inference program
three ways on the same pre-staged uint8 device batches —

  1. live:     ``jax.jit(make_serving_fn(...))`` straight from the model
  2. artifact: ``load_serving(...)`` on a freshly deserialized export
(``bench.py --eval`` clocks the third anchor — the in-graph-metrics
eval path — under identical conventions; compare its JSON line)

and reports img/s plus the artifact/live ratio. Timing follows bench.py's
conventions for this box: pre-staged device buffer pool (the axon relay
serializes H2D against execution), forced host readback as the only
reliable sync, median of N windows.

Usage (real chip):  python tools/bench_serving.py
Quick CPU smoke:    JAX_PLATFORMS=cpu python tools/bench_serving.py --quick
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes for CPU smoke-testing")
    p.add_argument("--network", choices=["resnet", "resnext"],
                   default="resnet")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=256,
                   help="serving batch (eval throughput peaks larger than "
                        "the train optimum; 256 matches bench.py --eval)")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--pool", type=int, default=4)
    p.add_argument("--symbolic-batch", action="store_true",
                   help="export a symbolic-batch artifact (the shipping "
                        "default) instead of pinning --batch-size; the "
                        "program XLA compiles at call time is the same")
    p.add_argument("--keep", default=None,
                   help="write the artifact under this prefix instead of "
                        "a temp dir")
    args = p.parse_args()

    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    import jax

    import numpy as np

    from resnet_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from resnet_tpu.config import imagenet_resnet50, imagenet_resnext50
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.utils.serving import (export_serving, load_serving,
                                          make_serving_fn)

    cfg = (imagenet_resnext50() if args.network == "resnext"
           else imagenet_resnet50())
    cfg.model.network = args.network
    cfg.model.depth = args.depth
    if args.quick:
        # resnext has no basic-block depths — its smallest net is 50
        cfg.model.depth = 50 if args.network == "resnext" else 18
        cfg.data.image_shape = (64, 64, 3)
        args.batch_size = 8
        if args.steps == 50:
            args.steps, args.warmup, args.windows = 4, 2, 2
    bs = args.batch_size

    state = create_train_state(cfg)
    params, batch_stats = state.params, state.batch_stats
    platform = jax.default_backend()

    # --- the two contenders ------------------------------------------------
    live = jax.jit(make_serving_fn(cfg, params, batch_stats))

    prefix = args.keep or os.path.join(
        tempfile.mkdtemp(prefix="bench_serving_"), "artifact")
    t0 = time.perf_counter()
    export_serving(cfg, params, batch_stats, prefix,
                   batch_size=None if args.symbolic_batch else bs,
                   platforms=(platform,))
    export_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    served, manifest = load_serving(prefix)
    load_s = time.perf_counter() - t0
    art_mb = os.path.getsize(prefix + ".stablehlo") / 2**20

    # --- pre-staged batches, bench.py conventions --------------------------
    h, w, c = cfg.data.image_shape
    rng = np.random.default_rng(0)
    pool = [jax.device_put(
        rng.integers(0, 256, (bs, h, w, c), dtype=np.uint8))
        for _ in range(args.pool)]
    _ = [int(jax.jit(lambda b: b.sum())(b)) for b in pool]   # settle H2D

    def clock(fn, label):
        out = None
        for i in range(args.warmup):
            out = fn(pool[i % args.pool])
        if out is not None:
            float(out[0, 0])                   # forced host readback
        rates = []
        for wdw in range(max(1, args.windows)):
            tic = time.perf_counter()
            for i in range(args.steps):
                out = fn(pool[(wdw * args.steps + i) % args.pool])
            float(out[0, 0])
            rates.append(args.steps * bs / (time.perf_counter() - tic))
        rates.sort()
        med = rates[len(rates) // 2]
        print(f"# {label}: {med:.1f} img/s, windows "
              f"{[round(r, 1) for r in rates]}", file=sys.stderr)
        return med

    live_rate = clock(live, "live jit")
    art_rate = clock(served, "artifact")

    name = f"{cfg.model.network}{cfg.model.depth}_serving_artifact"
    if args.symbolic_batch:
        name += "_symb"
    if args.quick:
        name += "_quick"
    print(json.dumps({
        "metric": name,
        "value": round(art_rate, 2),
        "unit": "images/sec/chip",
        "live_jit": round(live_rate, 2),
        "artifact_vs_live": round(art_rate / live_rate, 4),
        "artifact_mb": round(art_mb, 1),
        "export_s": round(export_s, 1),
        "load_s": round(load_s, 1),
        "batch": bs,
        "platform": platform,
    }))


if __name__ == "__main__":
    sys.exit(main())
