#!/usr/bin/env python
"""Convergence nightly — the mxnet tests/nightly 'train to a threshold'
analog (SURVEY.md §4): trains ResNet-18 on the separable synthetic dataset
and fails unless validation accuracy crosses the bar.

    python tools/nightly_convergence.py [--epochs 10] [--bar 0.98]
Exit code 0 iff converged.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--bar", type=float, default=0.98)
    p.add_argument("--depth", type=int, default=18)
    p.add_argument("--bn-ema", action="store_true",
                   help="run the shipped bn-ema program (2-epoch "
                        "batch-stats warmup + frozen-variance switch)")
    args = p.parse_args(argv)

    from resnet_tpu.config import cifar10_resnet18
    from resnet_tpu.data.loader import make_train_iter, make_val_iter
    from resnet_tpu.train.solver import Solver

    cfg = cifar10_resnet18()
    cfg.model.depth = args.depth
    cfg.data.num_examples = 10240
    cfg.train.batch_size = 256
    cfg.train.num_epochs = args.epochs
    cfg.train.lr = 0.1
    cfg.train.lr_steps = (args.epochs // 2, 3 * args.epochs // 4)
    cfg.train.frequent = 20
    cfg.train.model_prefix = ""
    cfg.train.bn_ema = args.bn_ema

    solver = Solver(cfg)
    train_iter = make_train_iter(cfg)
    val_iter = make_val_iter(cfg)
    state = solver.fit(train_iter, None)
    m = solver.validate(state, val_iter, args.epochs - 1)
    ok = m["accuracy"] >= args.bar
    print(f"convergence {'PASS' if ok else 'FAIL'}: "
          f"val accuracy {m['accuracy']:.4f} (bar {args.bar})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
