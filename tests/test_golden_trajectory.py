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

GOLDEN_LOSSES = [
    3.1832244396,
    1.9914913177,
    2.1838955879,
    2.0273399353,
    1.9651520252,
    1.4505157471,
    2.1494877338,
    1.4557512999,
]


def _trajectory():
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

    images, labels = synthetic_cifar(128, 10, (16, 16, 3), seed=0)
    it = MemoryIter(images, labels, 16, shuffle=True, seed=0)
    state = create_train_state(cfg)
    step = make_train_step(mesh=None)
    losses = []
    for batch in it.epoch_iter(0):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_sum"] / metrics["count"]))
    return losses


def test_trajectory_matches_golden():
    losses = _trajectory()
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=2e-4,
                               err_msg="fixed-seed trajectory drifted — "
                               "math changed somewhere (init/BN/SGD/step)")


if __name__ == "__main__":
    # the axon sitecustomize overrides JAX_PLATFORMS: force CPU the way
    # conftest.py does, so regenerated goldens match test runs
    import jax
    jax.config.update("jax_platforms", "cpu")
    print("GOLDEN_LOSSES = [")
    for l in _trajectory():
        print(f"    {l:.10f},")
    print("]")
