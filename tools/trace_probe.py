#!/usr/bin/env python
"""Capture a device trace of the benchmark train step and print a
per-fusion time attribution (the mx.profiler chrome-trace analog,
parsed headlessly — no TensorBoard needed).

    python tools/trace_probe.py [--steps 5] [--bn-subsample 8] [--top 25]

Writes the XPlane trace under --logdir (default /tmp/trace_probe) and
summarizes the TPU plane's op self-times, grouped by fusion-name prefix
(conv fusions vs convert/reduce BN sweeps vs copies), like the round-1
"Where the time goes" table in PERF_NOTES.md.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplanes(logdir: str, top: int):
    """Best-effort XPlane parse via TF's profiler protos."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    from tensorflow.core.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        # per-line (core) events; aggregate duration by event name
        tot = defaultdict(int)
        count = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                tot[name] += ev.duration_ps
                count[name] += 1
        if not tot:
            continue
        print(f"\n== plane: {plane.name} ==")
        items = sorted(tot.items(), key=lambda kv: -kv[1])
        total_ms = sum(tot.values()) / 1e9
        print(f"total event time {total_ms:.1f} ms")
        groups = defaultdict(int)
        for name, ps in items:
            key = name.split(".")[0].split("_fusion")[0]
            groups[key] += ps
        print("-- grouped --")
        for k, ps in sorted(groups.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ps/1e9:9.2f} ms  {k}")
        print("-- top events --")
        for name, ps in items[:top]:
            print(f"  {ps/1e9:9.2f} ms x{count[name]:4d}  {name[:90]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--bn-subsample", type=int, default=8)
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

    parse_xplanes(args.logdir, args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
