#!/usr/bin/env python
"""Compare XLA cost-analysis (bytes accessed / FLOPs) of train-step
variants — the compile-cache-friendly way to attribute HBM traffic when a
full device trace is impractical through the axon relay.

Usage: python tools/cost_probe.py [--variants off,xla,pallas] [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="off,xla,pallas")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--bn-subsample", type=int, default=1)
    p.add_argument("--remat-policy", default="none")
    p.add_argument("--xla-opts", default="",
                   help="comma list k=v of XLA compiler options, e.g. "
                        "xla_tpu_scoped_vmem_limit_kib=65536")
    p.add_argument("--no-augment", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from resnet_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from resnet_tpu.config import Config
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.train.steps import make_train_step

    for variant in args.variants.split(","):
        cfg = Config()
        cfg.train.dtype = "bfloat16"
        cfg.train.batch_size = args.batch
        cfg.train.unit_chain = variant
        cfg.train.bn_subsample = args.bn_subsample
        cfg.train.remat_policy = args.remat_policy
        aug_fn = None
        if not args.no_augment:
            if jax.default_backend() == "tpu":
                from resnet_tpu.ops.augment_pallas import (
                    augment_imagenet_pallas)
                aug_fn = lambda im, r, d=None: augment_imagenet_pallas(
                    im, r, cfg.data, cfg.data.image_shape[:2], jnp.bfloat16,
                    dims=d)
            else:
                from resnet_tpu.ops import augment
                aug_fn = lambda im, r, d=None: augment.augment_imagenet(
                    im, r, cfg.data, cfg.data.image_shape[:2], jnp.bfloat16,
                    dims=d)
        state = create_train_state(cfg)
        step = make_train_step(mesh=None, augment_fn=aug_fn)
        h, w, c = cfg.data.image_shape
        batch = {
            "image": jnp.zeros((args.batch, h, w, c), jnp.uint8),
            "label": jnp.zeros((args.batch,), jnp.int32),
        }
        from resnet_tpu.utils.xla_opts import parse_opts
        compiled = step.lower(state, batch).compile(
            compiler_options=parse_opts(args.xla_opts) or None)
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        byt = ca.get("bytes accessed", float("nan"))
        print(f"variant={variant:7s} flops={flops/1e12:8.2f}T "
              f"bytes={byt/1e9:8.2f}GB "
              f"roof@819GB/s={byt/819e9*1e3:7.1f}ms")
        for k in sorted(ca):
            if k.startswith("bytes accessed") and k != "bytes accessed":
                print(f"    {k}: {ca[k]/1e9:.2f}GB")


if __name__ == "__main__":
    main()
