"""Golden fixed-seed training trajectory (numerics pin).

The reference family's correctness story leans on end-to-end training
reaching published accuracy; the in-repo analog that catches silent
numerics drift is a pinned loss trajectory: same seed, same data, same
optimizer => the first N step losses must reproduce to float32 tolerance.
Any change to init, BN semantics, SGD rule, or the step program that
alters math (rather than schedule) trips this immediately.

Golden values generated on XLA:CPU float32 (conftest forces CPU) at the
commit introducing this test; regenerate with
``python -m tests.test_golden_trajectory`` if a deliberate math change
lands (and say so in the commit message).
"""

import numpy as np

import pytest
import numpy as np

# per BN statistics mode: "full" (nn.BatchNorm), "bnsub" (stats from the
# leading batch//4 images), "grouped" (4 independent groups — per-GPU
# parity semantics), "stride" (stats from every 2nd spatial row/column of
# all images — round-3 spatial subsampling). Pinning all four means silent
# drift in ANY shipped BN mode trips a test, not just the default.
GOLDEN_LOSSES = {
    "full": [
        3.1832244396,
        1.9914908409,
        2.1838953495,
        2.0273399353,
        1.9651522636,
        1.4505161047,
        2.1494865417,
        1.4557535648,
    ],
    "bnsub": [
        3.3713417053,
        2.2523932457,
        2.5459768772,
        2.3827743530,
        1.9530501366,
        1.5569658279,
        2.8522191048,
        2.1216893196,
    ],
    "grouped": [
        2.9819567204,
        2.1801829338,
        2.2762179375,
        2.2036948204,
        2.0536198616,
        1.6523755789,
        2.7649259567,
        1.4601552486,
    ],
    "stride": [
        3.3518309593,
        2.3115787506,
        2.1638877392,
        2.2601828575,
        1.8556462526,
        1.9113082886,
        1.9296820164,
        1.4875383377,
    ],
    # 4 full-batch warmup steps (== "full" prefix), then the bn-ema
    # program (live-evidence normalize, stop-grad variance, mean grad,
    # radial projection) — the pin covers the program SWITCH, not just
    # each program. Values run at the shipped semantics (subsample 1);
    # the smooth hand-off (no step-5 jump) is itself the regression
    # signal: every earlier dynamics bug showed up right here
    "ema": [
        3.1832244396,
        1.9914909601,
        2.1838951111,
        2.0273394585,
        1.9651434422,
        1.4724078178,
        2.2583467960,
        1.3274533749,
    ],
}


def _trajectory(bn_mode="full"):
    import jax

    from resnet_tpu.config import cifar10_resnet18
    from resnet_tpu.data.loader import MemoryIter, synthetic_cifar
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.train.steps import make_train_step

    cfg = cifar10_resnet18()
    cfg.model.depth = 20
    cfg.data.num_classes = 10
    cfg.data.image_shape = (16, 16, 3)
    cfg.data.num_examples = 128
    cfg.train.batch_size = 16
    cfg.train.lr = 0.05
    cfg.train.seed = 0
    if bn_mode == "stride":
        cfg.train.bn_stat_stride = 2
    elif bn_mode == "ema":
        # shipped semantics: subsample stays 1 (live full-batch evidence,
        # gradient-carrying mean, stop-grad variance, radial projection)
        cfg.train.bn_ema = True
    elif bn_mode != "full":
        cfg.train.bn_subsample = 4
        cfg.train.bn_grouped = bn_mode == "grouped"

    images, labels = synthetic_cifar(128, 10, (16, 16, 3), seed=0)
    it = MemoryIter(images, labels, 16, shuffle=True, seed=0)
    state = create_train_state(cfg)
    ema_apply = None
    if bn_mode == "ema":
        # mirror the Solver's bn_ema_warmup program switch: 4 steps of
        # FULL-BATCH-stats BN prime the running stats (the Solver's
        # warmup model), then the ema program (running-stats normalize)
        # takes over mid-trajectory — so the pin covers BOTH programs
        # and the switch itself
        import dataclasses as _dc
        from resnet_tpu.models.registry import get_model
        ema_apply = state.apply_fn
        warm = cfg.replace(train=_dc.replace(
            cfg.train, bn_ema=False, bn_subsample=1))
        state = state.replace(apply_fn=get_model(warm).apply)
    step = make_train_step(mesh=None)
    losses = []
    for i, batch in enumerate(it.epoch_iter(0)):
        if ema_apply is not None and i == 4:
            state = state.replace(apply_fn=ema_apply)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_sum"] / metrics["count"]))
    return losses


@pytest.mark.parametrize("bn_mode",
                         ["full", "bnsub", "grouped", "stride", "ema"])
def test_trajectory_matches_golden(bn_mode):
    losses = _trajectory(bn_mode)
    np.testing.assert_allclose(
        losses, GOLDEN_LOSSES[bn_mode], rtol=2e-4,
        err_msg=f"fixed-seed trajectory ({bn_mode} BN) drifted — "
        "math changed somewhere (init/BN/SGD/step)")


if __name__ == "__main__":
    # the axon sitecustomize overrides JAX_PLATFORMS: force CPU the way
    # conftest.py does, so regenerated goldens match test runs
    import os
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        # match the conftest env exactly: the virtual-device split changes
        # XLA:CPU's thread partitioning and hence reduction order
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    print("GOLDEN_LOSSES = {")
    for mode in ["full", "bnsub", "grouped", "stride", "ema"]:
        print(f'    "{mode}": [')
        for l in _trajectory(mode):
            print(f"        {l:.10f},")
        print("    ],")
    print("}")
