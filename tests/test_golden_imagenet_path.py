"""Golden fixed-seed trajectory of the FULL production ImageNet path.

The CIFAR-shape pin (test_golden_trajectory.py) covers the step math; this
one pins the path users actually run for ImageNet: multi-shard .rec pack
(our im2rec) -> native streaming reader -> letterbox canvases + per-image
dims -> MXNet-semantics RRC/mirror/HSL on-device augmentation -> ResNet-50
-> mxnet_sgd. Silent math drift anywhere in that chain (decode, canvas
contract, box sampling, resample matmuls, HSL, BN, SGD) trips this test
instead of softly degrading a convergence bar.

Three BN statistics modes are pinned: full-batch, sub-batch stats
(bn_subsample=2 at batch 16 — the same stats-fraction family as the
throughput-only bnsub8 mode; s=4's 4-image stats explode on this skewed
toy set, an instability the 32-image stats of the real recipe do not
have; see PERF_NOTES.md), and bn-ema — the imagenet_resnet50 preset's
SHIPPED mode since round 3c (live-evidence normalize, stop-grad
variance, mean gradient, radial-projection optimizer; run here without
the Solver's warmup switch, which at ema_clamp=1.0 only affects the
eval-stats stream, not the train-mode math this test pins). The lr is
small: this is a NUMERICS pin, and a diverging trajectory (giant
losses/NaN) would make the float32 tolerance meaningless.

Golden values generated on XLA:CPU float32 (conftest forces CPU);
regenerate with ``python -m tests.test_golden_imagenet_path`` after a
DELIBERATE math change (and say so in the commit message).
"""

import numpy as np
import pytest

GOLDEN = {
    "full": [
        1.5550858974,
        2.4182021618,
        2.1373591423,
        1.9492039680,
        1.9267867804,
        1.1170338392,
        1.1421551704,
        2.0239851475,
    ],
    "bnsub": [
        16.5104446411,
        1883.7111816406,
        36.5407714844,
        47.1986732483,
        85.2555847168,
        72.8387908936,
        119.2375335693,
        329.0043945312,
    ],
    "ema": [
        1.5549824238,
        2.4896173477,
        2.7944855690,
        1.1323145628,
        2.2023582458,
        0.9228355289,
        0.5670394301,
        5.0363755226,
    ],
}

_STEPS = 8


def _make_tree(root):
    """Deterministic 3-class striped JPEG tree, varied sizes, 2 shards."""
    from PIL import Image

    from resnet_tpu.data.im2rec import build_list, pack

    rng = np.random.default_rng(7)
    sizes = [(56, 72), (80, 60), (64, 64), (72, 96)]
    for cls in range(3):
        d = root / f"class_{cls}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(24):
            h, w = sizes[(cls + i) % len(sizes)]
            y, x = np.mgrid[0:h, 0:w]
            patt = [(y // 6) % 2, (x // 6) % 2,
                    ((y // 6) + (x // 6)) % 2][cls]
            arr = 60 + 130 * patt[:, :, None] + rng.normal(0, 12, (h, w, 3))
            Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).save(
                d / f"i{i}.jpg", quality=92)
    prefix = str(root / "train")
    pack(str(root), prefix, build_list(str(root)), num_shards=2)
    return str(root)


def _trajectory(tree, bn_mode="full"):
    import jax

    from resnet_tpu.config import Config
    from resnet_tpu.data.loader import make_train_iter
    from resnet_tpu.ops import augment
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.train.steps import make_train_step

    cfg = Config()
    cfg.model.depth = 50                 # the flagship model
    cfg.data.num_classes = 3
    cfg.data.num_examples = 72
    cfg.data.image_shape = (32, 32, 3)   # tiny spatial, full R50 topology
    cfg.data.data_dir = tree
    cfg.data.train_rec = "train"         # multi-shard prefix resolution
    cfg.data.pipeline = "record"
    cfg.data.preprocess_threads = 2
    cfg.train.batch_size = 16
    cfg.train.lr = 0.005
    cfg.train.seed = 0
    if bn_mode == "bnsub":
        cfg.train.bn_subsample = 2
    elif bn_mode == "ema":
        cfg.train.bn_ema = True

    aug_fn = lambda imgs, rng, dims=None: augment.augment_imagenet(
        imgs, rng, cfg.data, cfg.data.image_shape[:2], jax.numpy.float32,
        dims=dims)
    state = create_train_state(cfg)
    step = make_train_step(mesh=None, augment_fn=aug_fn)
    it = make_train_iter(cfg)
    losses = []
    epoch = 0
    while len(losses) < _STEPS:
        for batch in it.epoch_iter(epoch):
            state, metrics = step(state, jax.device_put(batch))
            losses.append(float(metrics["loss_sum"] / metrics["count"]))
            if len(losses) >= _STEPS:
                break
        epoch += 1
    return losses


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return _make_tree(tmp_path_factory.mktemp("golden_imagenet"))


@pytest.mark.parametrize("bn_mode", ["full", "bnsub", "ema"])
def test_production_path_matches_golden(tree, bn_mode):
    losses = _trajectory(tree, bn_mode)
    np.testing.assert_allclose(
        losses, GOLDEN[bn_mode], rtol=2e-4,
        err_msg=f"production-path trajectory ({bn_mode}) drifted — math "
        "changed in decode/canvas/aug/model/SGD")


if __name__ == "__main__":
    import pathlib
    import tempfile

    import os
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        # match the conftest env exactly: the virtual-device split changes
        # XLA:CPU's thread partitioning and hence reduction order
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    root = pathlib.Path(tempfile.mkdtemp(prefix="golden_imagenet_"))
    tree_dir = _make_tree(root)
    print("GOLDEN = {")
    for mode in ["full", "bnsub", "ema"]:
        print(f'    "{mode}": [')
        for l in _trajectory(tree_dir, mode):
            print(f"        {l:.10f},")
        print("    ],")
    print("}")
