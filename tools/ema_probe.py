"""Probe: bn-ema convergence-config sweep (clamp / warmup / projection).

Runs the record-pipeline convergence configuration (the same one
tests/test_convergence_record.py gates on) for one bn-ema variant and
prints a JSON result line. Used to pick the shipped bn-ema hyperparameters
on the CPU backend; the decisions land in PERF_NOTES.md.
"""

import argparse
import json
import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clamp", type=float, default=2.0)
    p.add_argument("--warmup", type=int, default=-1)
    p.add_argument("--project", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--data", default="",
                   help="existing shard tree (default: build a fresh one)")
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    from test_convergence_record import shard_tree as fixture  # noqa: F401

    from resnet_tpu.config import Config
    from resnet_tpu.data.loader import make_train_iter, make_val_iter
    from resnet_tpu.train.solver import Solver

    root = args.data
    if not root:
        # regenerate the fixture dataset outside pytest
        class _F:
            def mktemp(self, name):
                import pathlib
                d = pathlib.Path(tempfile.mkdtemp(prefix=name))
                return d
        root = fixture.__wrapped__(_F())

    cfg = Config()
    cfg.model.depth = 18
    cfg.model.dataset = "imagenet"
    cfg.model.bn_mom = 0.5
    cfg.data.num_classes = 3
    cfg.data.num_examples = 120
    cfg.data.image_shape = (32, 32, 3)
    cfg.data.data_dir = str(root)
    cfg.data.train_rec = "train"
    cfg.data.val_rec = "val.rec"
    cfg.data.pipeline = "record"
    cfg.data.preprocess_threads = 2
    cfg.data.min_random_area = 0.5
    cfg.train.batch_size = 24
    cfg.train.num_epochs = args.epochs
    cfg.train.lr = 0.05
    cfg.train.lr_steps = (4, 5)
    cfg.train.frequent = 5
    cfg.train.model_prefix = ""
    cfg.train.bn_ema = True
    cfg.train.bn_ema_clamp = args.clamp
    cfg.train.bn_ema_warmup = args.warmup
    cfg.train.bn_ema_project = args.project

    solver = Solver(cfg)
    state = solver.fit(make_train_iter(cfg), None)
    m = solver.validate(state, make_val_iter(cfg), cfg.train.num_epochs - 1)
    print(json.dumps({
        "clamp": args.clamp, "warmup": args.warmup,
        "project": args.project, "epochs": args.epochs,
        "val_accuracy": round(float(m["accuracy"]), 4),
        "val_ce": round(float(m.get("cross-entropy", float("nan"))), 4),
        "data": str(root),
    }))


if __name__ == "__main__":
    sys.exit(main())
