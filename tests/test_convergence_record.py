"""In-the-loop convergence through the FULL record pipeline.

The reference's convergence evidence is end-to-end ImageNet training
(SURVEY.md §4: "train to a threshold" nightlies). Real ImageNet is not
available here, so this is the strongest in-repo proxy: a class-separable
JPEG dataset packed into MULTIPLE .rec shards by our own im2rec, streamed
by the shard-set reader (letterbox canvases + per-image dims), augmented
on device with the full MXNet-semantics ImageNet RRC/mirror/HSL pipeline,
trained by the Solver, and validated through the resize/center-crop val
path — every production component in the loop, with an accuracy bar.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def shard_tree(tmp_path_factory):
    """3-class color dataset, varied original sizes, packed in 3 shards."""
    from PIL import Image

    from resnet_tpu.data.im2rec import build_list, pack

    root = tmp_path_factory.mktemp("conv")
    rng = np.random.default_rng(0)
    # class = texture orientation (horizontal / vertical stripes /
    # checkerboard): invariant to the full aug pipeline's HSL jitter,
    # mirror, and crops — unlike color classes, which hue jitter scrambles.
    # Sizes vary so letterboxing really resizes.
    sizes = [(56, 72), (80, 60), (64, 64), (72, 96)]

    def make(cls, h, w):
        y, x = np.mgrid[0:h, 0:w]
        if cls == 0:
            patt = (y // 6) % 2
        elif cls == 1:
            patt = (x // 6) % 2
        else:
            patt = ((y // 6) + (x // 6)) % 2
        arr = 60 + 130 * patt[:, :, None] + rng.normal(0, 12, (h, w, 3))
        return np.clip(arr, 0, 255).astype(np.uint8)

    for cls in range(3):
        d = root / f"class_{cls}"
        d.mkdir()
        for i in range(40):
            h, w = sizes[(cls + i) % len(sizes)]
            Image.fromarray(make(cls, h, w)).save(
                d / f"i{i}.jpg", quality=92)
    prefix = str(root / "train")
    pack(str(root), prefix, build_list(str(root)), num_shards=3)
    # val = same distribution, fresh draws, single shard
    vroot = root / "valsrc"
    for cls in range(3):
        d = vroot / f"class_{cls}"
        d.mkdir(parents=True)
        for i in range(10):
            h, w = sizes[(cls + i + 1) % len(sizes)]
            Image.fromarray(make(cls, h, w)).save(
                d / f"v{i}.jpg", quality=92)
    pack(str(vroot), str(root / "val"), build_list(str(vroot)))
    return str(root)


@pytest.mark.parametrize(
    "bn_mode",
    ["full", "bnsub", "grouped", "stride", "ema", "ema_resnext"])
def test_record_pipeline_converges(shard_tree, bn_mode):
    """Convergence bar for EVERY shipped BN statistics mode (VERDICT r2:
    the headline BN mode must have convergence evidence, not just a clock).
    bnsub/grouped run s=3 -> 8-image stats samples at batch 24, the same
    stats-per-sample ballpark as the recipe's 32-image samples at bs256.
    stride runs bn_stat_stride=2 (stats from every 2nd pixel row/column of
    ALL images — the round-3 spatial-subsampling mode).

    full, grouped, stride, and ema (the SHIPPED imagenet_resnet50 mode,
    round 3c) must PASS the bar. bnsub is pinned as the measured
    COUNTER-evidence: normalizing the whole batch with one leading
    subset's statistics skews the BN running stats and tanks validation
    (accuracy lands at ~0.0 here) — the reason round 3 demoted bnsub
    from benchmark default to an explicit throughput-only flag
    (PERF_NOTES.md round 3). If bnsub ever clears the bar, this pin
    fails so the defaults decision gets revisited."""
    from resnet_tpu.config import Config
    from resnet_tpu.data.loader import make_train_iter, make_val_iter
    from resnet_tpu.train.solver import Solver

    cfg = Config()
    cfg.model.depth = 18
    cfg.model.dataset = "imagenet"   # ImageNet stem + FULL RRC aug path
    cfg.model.bn_mom = 0.5
    cfg.data.num_classes = 3
    cfg.data.num_examples = 120
    cfg.data.image_shape = (32, 32, 3)
    cfg.data.data_dir = shard_tree
    cfg.data.train_rec = "train"     # prefix -> resolves train_00{0,1,2}.rec
    cfg.data.val_rec = "val.rec"
    cfg.data.pipeline = "record"
    cfg.data.preprocess_threads = 2
    # keep the full aug semantics but bias crops toward most-of-the-image
    # (tiny canvases + tiny training budget)
    cfg.data.min_random_area = 0.5
    cfg.train.batch_size = 24
    cfg.train.num_epochs = 6
    cfg.train.lr = 0.05
    cfg.train.lr_steps = (4, 5)
    cfg.train.frequent = 5
    cfg.train.model_prefix = ""
    if bn_mode == "stride":
        cfg.train.bn_stat_stride = 2
    elif bn_mode.startswith("ema"):
        # round-3c structural mode: normalize with running stats
        # (stop-gradient) + radial-projection optimizer — the shipped
        # bnema1 combination (full-batch EMA refresh: the stats stream is
        # identical to full-batch BN's; the clock win is the elementwise
        # backward). The Solver primes the EMA with two epochs of
        # batch-stats BN (bn_ema_warmup=-2) before the program switch.
        cfg.train.bn_ema = True
        if bn_mode == "ema_resnext":
            # the imagenet_resnext50 preset ships bn_ema too (round 3d,
            # +9.8%): same bar, grouped-conv bottleneck family — pins
            # that the ema dynamics are not ResNet-topology luck
            cfg.model.network = "resnext"
            cfg.model.depth = 50
    elif bn_mode != "full":
        cfg.train.bn_subsample = 3
        cfg.train.bn_grouped = bn_mode == "grouped"

    solver = Solver(cfg)
    state = solver.fit(make_train_iter(cfg), None)
    m = solver.validate(state, make_val_iter(cfg), cfg.train.num_epochs - 1)
    if bn_mode == "bnsub":
        # the counter-evidence pin (see docstring): subset-stats BN does
        # NOT meet the bar on the production pipeline
        assert m["accuracy"] < 0.9, (
            "bnsub now clears the convergence bar — revisit the round-3 "
            "BN defaults decision", m)
    else:
        # texture classes are trivially separable: anything that learns
        # clears .9
        assert m["accuracy"] >= 0.9, (bn_mode, m)


def test_multi_shard_resolution(shard_tree):
    from resnet_tpu.data.pipeline import resolve_shards
    recs = resolve_shards(shard_tree, "train")
    assert len(recs) == 3
    assert [os.path.basename(r) for r in recs] == [
        "train_000.rec", "train_001.rec", "train_002.rec"]
