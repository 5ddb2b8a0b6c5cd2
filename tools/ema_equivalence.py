#!/usr/bin/env python
"""bn-ema vs full-batch BN: final-accuracy equivalence dossier (round 4).

The shipped ``imagenet_resnet50`` preset normalizes with bn-ema (live batch
mean + stop-gradient clamped variance + radial projection — PERF_NOTES
round 3c), a deliberate semantic departure from reference batch-stats BN.
Its convergence evidence so far is bar-style (PASS/FAIL at a threshold).
This tool runs the HEAD-TO-HEAD experiment the evidence ladder still lacks
(VERDICT r3 missing #1 / next-step #2): same task, same budget, multiple
seeds, both BN programs, on the hardest real-data task this box can run —
the sklearn handwritten-digit scans through the FULL record pipeline
(multi-shard .rec from our im2rec, native streaming decode, letterbox
canvases, on-device aug, Solver fit) with an LR-step schedule that crosses
the bn-ema warmup switch.

Per run it also measures the EMA-drift train/eval consistency probe: final
validation scored (a) with running statistics (the standard eval path) and
(b) with batch statistics (train-mode normalization) — if bn-ema's frozen
variance drifted from the activation distribution, (a) degrades vs (b) in
a way full-batch BN's does not.

Prints one JSON line per run plus a summary row; paste the table into
PERF_NOTES.md. The CI rung lives in tests/test_real_digits.py
(test_bn_ema_accuracy_equivalence) with the tolerance this dossier pins.

Usage:
    python tools/ema_equivalence.py [--seeds 0 1 2] [--epochs 14]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_digits(root: str):
    """Pack the sklearn digit scans exactly like tests/test_real_digits.py."""
    import numpy as np
    from PIL import Image
    from sklearn.datasets import load_digits

    from resnet_tpu.data.im2rec import build_list, pack

    d = load_digits()
    images = (d.images * (255.0 / 16.0)).astype(np.uint8)
    labels = d.target

    def dump(dst, idx):
        for i in idx:
            cls_dir = os.path.join(dst, f"class_{labels[i]}")
            os.makedirs(cls_dir, exist_ok=True)
            arr = np.repeat(images[i][:, :, None], 3, axis=2)
            im = Image.fromarray(arr).resize((40, 40), Image.BILINEAR)
            im.save(os.path.join(cls_dir, f"d{i}.jpg"), quality=95)

    dump(os.path.join(root, "trainsrc"), range(0, 600))
    dump(os.path.join(root, "valsrc"), range(600, 750))
    pack(os.path.join(root, "trainsrc"), os.path.join(root, "train"),
         build_list(os.path.join(root, "trainsrc")), num_shards=2)
    pack(os.path.join(root, "valsrc"), os.path.join(root, "val"),
         build_list(os.path.join(root, "valsrc")))
    return root


def make_cfg(root: str, seed: int, bn_ema: bool, epochs: int):
    from resnet_tpu.config import Config

    cfg = Config()
    cfg.model.depth = 20
    cfg.model.dataset = "cifar10"
    cfg.model.bn_mom = 0.9          # the SHIPPED momentum (the bar tests
    #                                 use 0.5 to converge stats faster;
    #                                 equivalence must hold at the recipe's)
    cfg.data.num_classes = 10
    cfg.data.num_examples = 600
    cfg.data.image_shape = (32, 32, 3)
    cfg.data.data_dir = root
    cfg.data.train_rec = "train"
    cfg.data.val_rec = "val.rec"
    cfg.data.pipeline = "record"
    cfg.data.preprocess_threads = 2
    cfg.data.min_random_area = 0.6
    cfg.train.batch_size = 24
    cfg.train.num_epochs = epochs
    cfg.train.lr = 0.05
    # 600/24 = 25 steps/epoch; the bn-ema switch fires at step 50 (epoch 2,
    # bn_ema_warmup=-2 default). LR steps at 60% / 85% of the budget land
    # AFTER the switch — the stress VERDICT asks for (frozen-variance
    # dynamics across an activation-scale change).
    cfg.train.lr_steps = (max(3, int(epochs * 0.6)),
                          max(4, int(epochs * 0.85)))
    cfg.train.frequent = 25
    cfg.train.model_prefix = ""
    cfg.train.seed = seed
    cfg.train.bn_ema = bn_ema
    return cfg


def run_one(root: str, seed: int, bn_ema: bool, epochs: int) -> dict:
    from resnet_tpu.data.loader import make_train_iter, make_val_iter
    from resnet_tpu.ops.metrics import MetricAccumulator
    from resnet_tpu.train.solver import Solver

    cfg = make_cfg(root, seed, bn_ema, epochs)
    solver = Solver(cfg)
    state = solver.fit(make_train_iter(cfg), None)
    m = solver.validate(state, make_val_iter(cfg), epochs - 1)

    # EMA-drift probe: score validation with TRAIN-mode (batch-stats /
    # bn-ema live-evidence) normalization instead of running stats. A
    # drifted frozen variance shows up as a running-stats (standard eval)
    # accuracy deficit vs this batch-normalized score.
    from resnet_tpu.data.prefetch import prefetch_to_device
    from resnet_tpu.ops.metrics import cross_entropy_loss, metric_sums
    from resnet_tpu.train.solver import _augment_fns
    _, eval_pre = _augment_fns(cfg)

    @jax.jit
    def tm_eval(state, batch):
        images = eval_pre(batch["image"])
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"])
        loss = cross_entropy_loss(logits, batch["label"],
                                  mask=batch.get("mask"))
        return metric_sums(logits, batch["label"], loss,
                           mask=batch.get("mask"))

    acc = MetricAccumulator()
    for batch in prefetch_to_device(
            make_val_iter(cfg).epoch_iter(0), size=2):
        acc.update(jax.device_get(tm_eval(state, batch)))
    tm = acc.get()

    row = {
        "mode": "bn_ema" if bn_ema else "full_batch_bn",
        "seed": seed,
        "epochs": epochs,
        "val_accuracy": round(float(m["accuracy"]), 4),
        "val_ce": round(float(m["cross-entropy"]), 4),
        "val_top5": round(float(m["top_k_accuracy_5"]), 4),
        "trainmode_val_accuracy": round(float(tm["accuracy"]), 4),
        "trainmode_val_ce": round(float(tm["cross-entropy"]), 4),
        "eval_consistency_gap": round(
            float(tm["accuracy"]) - float(m["accuracy"]), 4),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--epochs", type=int, default=14)
    p.add_argument("--data", default="",
                   help="existing digit shard tree (default: build fresh)")
    args = p.parse_args()

    root = args.data or build_digits(tempfile.mkdtemp(prefix="ema_eq_"))
    rows = []
    for seed in args.seeds:
        for bn_ema in (False, True):
            rows.append(run_one(root, seed, bn_ema, args.epochs))

    import numpy as np
    summary = {}
    for mode in ("full_batch_bn", "bn_ema"):
        accs = [r["val_accuracy"] for r in rows if r["mode"] == mode]
        ces = [r["val_ce"] for r in rows if r["mode"] == mode]
        gaps = [r["eval_consistency_gap"] for r in rows if r["mode"] == mode]
        summary[mode] = {
            "acc_mean": round(float(np.mean(accs)), 4),
            "acc_min": round(float(np.min(accs)), 4),
            "acc_max": round(float(np.max(accs)), 4),
            "ce_mean": round(float(np.mean(ces)), 4),
            "consistency_gap_mean": round(float(np.mean(gaps)), 4),
        }
    summary["acc_mean_diff(ema - full)"] = round(
        summary["bn_ema"]["acc_mean"]
        - summary["full_batch_bn"]["acc_mean"], 4)
    print(json.dumps({"summary": summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
