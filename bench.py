#!/usr/bin/env python
"""Benchmark of record: ResNet-50 ImageNet training throughput (img/s/chip).

Measures the Speedometer metric the reference reports (samples/sec of the
full train loop — SURVEY.md §6): host uint8 batch -> async H2D -> on-device
augmentation -> forward/backward -> MXNet-SGD update, all but the H2D inside
one jitted XLA program, bf16 compute.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
vs_baseline is against the binding target of 3000 img/s/chip on v5e
(BASELINE.md; the MXNet reference does ~360-400 img/s per V100).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes for CPU smoke-testing")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = auto (256 per chip)")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--no-augment", action="store_true",
                   help="skip on-device augmentation (pure model step)")
    args = p.parse_args()

    import jax
    import numpy as np

    from resnet_tpu.config import Config
    from resnet_tpu.data.loader import SyntheticIter
    from resnet_tpu.ops import augment
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.train.steps import make_train_step

    cfg = Config()
    cfg.model.depth = args.depth
    cfg.train.dtype = args.dtype
    if args.quick:
        cfg.model.depth = 18
        cfg.data.image_shape = (64, 64, 3)
        cfg.train.batch_size = 8
        args.steps, args.warmup = (4, 2) if args.steps == 30 else \
            (args.steps, args.warmup)
    else:
        cfg.train.batch_size = args.batch_size or 256
    n_chips = jax.device_count()

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    aug_fn = None
    if not args.no_augment:
        aug_fn = lambda imgs, rng: augment.augment_imagenet(
            imgs, rng, cfg.data, cfg.data.image_shape[:2], dtype)

    state = create_train_state(cfg)
    step_fn = make_train_step(mesh=None, augment_fn=aug_fn)

    it = SyntheticIter(cfg.train.batch_size, cfg.data.image_shape,
                       cfg.data.num_classes, steps_per_epoch=10**9)
    gen = it.epoch_iter(0)

    # warmup (compile)
    for _ in range(args.warmup):
        batch = jax.device_put(next(gen))
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)

    tic = time.perf_counter()
    for _ in range(args.steps):
        batch = jax.device_put(next(gen))
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    elapsed = time.perf_counter() - tic

    imgs_per_sec = args.steps * cfg.train.batch_size / elapsed
    per_chip = imgs_per_sec / max(n_chips, 1)
    baseline = 3000.0  # BASELINE.md target: img/s/chip, v5e, ResNet-50 bf16
    print(json.dumps({
        "metric": f"resnet{cfg.model.depth}_train_throughput"
                  + ("_quick" if args.quick else ""),
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / baseline, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
