#!/usr/bin/env python
"""Capture a device trace of the benchmark train step and print a
per-fusion time attribution (the mx.profiler chrome-trace analog,
parsed headlessly — no TensorBoard needed).

    python tools/trace_probe.py [--steps 5] [--bn-subsample 8] [--top 25]

Writes the jax.profiler trace under --logdir (default /tmp/trace_probe)
and summarizes the TPU process's chrome-trace events, grouped by
fusion-name prefix (conv fusions vs convert/reduce BN sweeps vs copies),
like the round-1 "Where the time goes" table in PERF_NOTES.md.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(logdir: str, top: int, steps: int):
    """Parse the chrome trace (trace.json.gz) jax.profiler writes."""
    import gzip
    import json
    import re

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    # keep complete events from TPU device process tracks (not host threads)
    pids = {p["pid"] for p in trace["traceEvents"]
            if p.get("ph") == "M" and p.get("name") == "process_name"
            and "TPU" in str(p.get("args", {}).get("name", ""))}
    tot = defaultdict(float)
    count = defaultdict(int)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in pids:
            continue
        tot[ev["name"]] += ev.get("dur", 0)    # us
        count[ev["name"]] += 1
    if not tot:
        print("no TPU device events; pids seen:",
              sorted({e.get("pid") for e in trace["traceEvents"]})[:20])
        return
    total_ms = sum(tot.values()) / 1e3
    print(f"device event time {total_ms:.1f} ms over {steps} steps "
          f"= {total_ms/max(steps,1):.1f} ms/step")
    groups = defaultdict(float)
    for name, us in tot.items():
        key = re.sub(r"[.\d]+$", "", name.split(".")[0])
        groups[key] += us
    print("-- grouped (ms/step) --")
    for k, us in sorted(groups.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e3/max(steps,1):9.2f}  {k}")
    print("-- top events (ms/step total, count) --")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e3/max(steps,1):9.2f} x{count[name]:5d}  {name[:90]}")


def main():
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--bn-subsample", type=int, default=8)
    p.add_argument("--bn-ema", action="store_true",
                   help="trace the bn-ema program (the shipped "
                        "imagenet_resnet50 mode, PERF_NOTES round 3c); "
                        "pair with --bn-subsample 1 for the shipped "
                        "full-sweep EMA refresh")
    p.add_argument("--stem-s2d", action="store_true",
                   help="trace the space-to-depth stem lowering")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--logdir", default="/tmp/trace_probe")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--parse-only", action="store_true")
    args = p.parse_args()

    if not args.parse_only:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from resnet_tpu.config import Config
        from resnet_tpu.train.state import create_train_state
        from resnet_tpu.train.steps import make_train_step

        cfg = Config()
        cfg.model.depth = args.depth
        cfg.train.dtype = "bfloat16"
        cfg.train.batch_size = args.batch_size
        cfg.train.bn_subsample = args.bn_subsample
        cfg.train.bn_ema = args.bn_ema
        cfg.train.stem_s2d = args.stem_s2d

        from resnet_tpu.ops.augment_pallas import augment_imagenet_pallas
        aug = lambda im, r, d=None: augment_imagenet_pallas(
            im, r, cfg.data, cfg.data.image_shape[:2], jnp.bfloat16, dims=d)
        state = create_train_state(cfg)
        step = make_train_step(mesh=None, augment_fn=aug)
        h, w, c = cfg.data.image_shape
        rng = np.random.default_rng(0)
        batch = jax.device_put({
            "image": rng.integers(0, 256, (args.batch_size, h, w, c),
                                  dtype=np.uint8),
            "label": rng.integers(0, 1000, (args.batch_size,), np.int32),
        })
        for _ in range(args.warmup):
            state, m = step(state, batch)
        float(m["count"])  # forced readback sync (axon quirk)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.steps):
                state, m = step(state, batch)
            float(m["count"])

    parse_trace(args.logdir, args.top, args.steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
