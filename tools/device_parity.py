#!/usr/bin/env python
"""Cross-backend parity check — the mxnet tests/python/gpu/
test_operator_gpu.py analog (SURVEY.md §4): runs IDENTICAL fixed-seed
training on the CPU backend and on the accelerator and compares.

What is compared and why:
  - single-step loss (tight tolerance): forward-path correctness;
  - single-step PARAM DELTAS, pointwise (per-leaf max abs diff relative to
    the leaf's own delta scale): the backward pass + optimizer, before
    chaos can compound — this is the deterministic pointwise gate;
  - after N full SGD steps, BOTH backends must have reduced the loss below
    a fraction of the initial value (learning-dynamics equivalence).
Pointwise MULTI-step trajectory comparisons are deliberately NOT gated:
measured on this setup, a 1e-6 init perturbation on the SAME backend
yields a 0.83 relative loss difference after 20 steps (chaos through ReLU
kinks), indistinguishable from the 0.87 cross-backend difference — so
trajectory equality carries no signal. Exact math parity is separately
proven in f64 by tests/test_fused_convbn.py.

    python tools/device_parity.py [--depth 20] [--steps 20]
Exit 0 iff within tolerance.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=20)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--loss-atol", type=float, default=5e-3)
    p.add_argument("--delta-rtol", type=float, default=5e-2,
                   help="gate on max |d_cpu - d_accel| / max|d_cpu| per "
                        "param leaf, d = one-step param delta (measured "
                        "1.9e-2 worst leaf on v5e at float32 precision; "
                        "first-step loss agrees to ~1e-6)")
    p.add_argument("--precision", choices=["float32", "default"],
                   default="float32",
                   help="jax matmul precision for the comparison. The gate "
                        "only means 'same math' at matched precision: TPU "
                        "'f32' convs default to bf16-input passes, which "
                        "alone moves small-magnitude BN-scale deltas by "
                        "~0.5 rel after one step (measured) — that is a "
                        "precision choice, not a math bug")
    p.add_argument("--learn-frac", type=float, default=0.5,
                   help="final loss must be below this fraction of initial")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.precision == "float32":
        jax.config.update("jax_default_matmul_precision", "float32")

    from resnet_tpu.config import Config
    from resnet_tpu.data.loader import synthetic_cifar
    from resnet_tpu.ops.metrics import cross_entropy_loss
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.train.steps import make_train_step

    cfg = Config()
    cfg.model.depth = args.depth
    cfg.model.dataset = "cifar10"
    cfg.data.num_classes = 10
    cfg.data.num_examples = args.batch * 4
    cfg.data.image_shape = (32, 32, 3)
    cfg.train.batch_size = args.batch
    cfg.train.lr = 0.05

    images, labels = synthetic_cifar(args.batch * 4, 10, (32, 32, 3),
                                     seed=0)
    batches = [
        {"image": images[i * args.batch:(i + 1) * args.batch],
         "label": labels[i * args.batch:(i + 1) * args.batch]}
        for i in range(4)]

    accel = jax.devices()[0]
    if accel.platform == "cpu":
        print("only CPU present — nothing to compare")
        return 0

    from resnet_tpu.ops import augment
    aug = lambda im, k, dims=None: augment.augment_cifar(im, k, cfg.data,
                                                          jnp.float32)

    results = {}
    deltas = {}
    for name, dev in [("cpu", jax.devices("cpu")[0]), (accel.platform,
                                                       accel)]:
        with jax.default_device(dev):
            state = create_train_state(cfg)
            state = jax.device_put(state, dev)
            params0 = jax.tree.map(np.asarray, state.params)
            step = make_train_step(mesh=None, augment_fn=aug)
            losses = []
            for i in range(args.steps):
                b = jax.device_put(batches[i % 4], dev)
                state, metrics = step(state, b)
                if i == 0:
                    # one-step param delta = the whole bwd+optimizer path,
                    # captured before chaos can compound
                    deltas[name] = jax.tree.map(
                        lambda a, b_: np.asarray(a) - b_,
                        state.params, params0)
                losses.append(float(metrics["loss_sum"])
                              / float(metrics["count"]))
            results[name] = losses
        print(f"{name}: first-step loss {losses[0]:.6f}, "
              f"after {args.steps} steps {losses[-1]:.6f}")

    c, t = results["cpu"], results[accel.platform]
    first_ok = abs(c[0] - t[0]) < args.loss_atol
    worst = 0.0
    worst_path = None
    flat_c = jax.tree_util.tree_flatten_with_path(deltas["cpu"])[0]
    flat_t = jax.tree.leaves(deltas[accel.platform])
    for (path, dc), dt in zip(flat_c, flat_t):
        scale = np.abs(dc).max() + 1e-12
        rel = float(np.abs(dc - dt).max() / scale)
        if rel > worst:
            worst, worst_path = rel, jax.tree_util.keystr(path)
    delta_ok = worst < args.delta_rtol
    print(f"one-step param-delta max rel diff {worst:.2e} at "
          f"{worst_path} (gate {args.delta_rtol})")
    # average over the tail to damp batch-to-batch noise
    tail = max(1, args.steps // 5)
    c_end = sum(c[-tail:]) / tail
    t_end = sum(t[-tail:]) / tail
    learn_ok = (c_end < args.learn_frac * c[0]
                and t_end < args.learn_frac * t[0])
    ok = first_ok and learn_ok and delta_ok
    print(f"parity {'PASS' if ok else 'FAIL'}: "
          f"first-step diff {abs(c[0] - t[0]):.2e} (atol "
          f"{args.loss_atol}); delta gate "
          f"{'ok' if delta_ok else 'FAIL'}; tail loss cpu {c_end:.3f} / "
          f"{accel.platform} {t_end:.3f} (must be < "
          f"{args.learn_frac} x initial {c[0]:.3f})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
