#!/usr/bin/env python
"""Training entrypoint — the rebuild of ref:train_resnet.py.

Same shape as the reference's main(): load config (CLI over presets),
set up logging, build data iterators, build the solver (model + optimizer +
jitted steps over the device mesh), optionally resume, fit.

Examples:
    python train_resnet.py --preset cifar10_resnet18 --num-epochs 5
    python train_resnet.py --network resnet --depth 50 --batch-size 256 \
        --lr 0.1 --lr-steps 30,60,90 --data-dir /data/imagenet
    python train_resnet.py --preset imagenet_resnet101_bf16 --remat
"""

from __future__ import annotations

import sys


def main(argv=None):
    # honor an explicit JAX_PLATFORMS request: the axon sitecustomize on
    # TPU boxes overrides the env var programmatically, which would send a
    # JAX_PLATFORMS=cpu run to the TPU relay anyway (utils/platform.py)
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()

    from resnet_tpu.config import parse_config
    from resnet_tpu.data.loader import make_train_iter, make_val_iter
    from resnet_tpu.parallel.dist import (
        finalize_distributed,
        maybe_init_distributed,
        proc_info,
    )
    from resnet_tpu.train.solver import Solver

    cfg = parse_config(argv)
    from resnet_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    if cfg.train.check_numerics:
        import jax
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)
    maybe_init_distributed()
    num_parts, part_index = proc_info()

    solver = Solver(cfg, log_file=f"{cfg.train.model_prefix}.log"
                    if cfg.train.model_prefix else None)
    solver.log.info("config: %s", cfg)
    train_iter = make_train_iter(cfg, num_parts, part_index)
    val_iter = make_val_iter(cfg, num_parts, part_index)
    solver.fit(train_iter, val_iter)
    # barrier + clean dist shutdown: without it the first rank to exit
    # (the coordination leader) FATALs the others mid-teardown
    finalize_distributed()


if __name__ == "__main__":
    main(sys.argv[1:])
