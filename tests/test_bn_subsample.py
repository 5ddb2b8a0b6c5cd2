"""SubsampleBatchNorm semantics (models/resnet.py).

Reference parity rationale: MXNet BN is per-GPU — at the reference's
batch-256-over-8-GPUs recipe every BN layer computes statistics from 32
images. SubsampleBatchNorm(subsample=s) reproduces that stats sample
count on one chip: statistics from the leading batch//s images,
normalization over the full batch, nn.BatchNorm EMA/eval semantics.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.models.resnet import ResNet, SubsampleBatchNorm


def _bn_pair(sub):
    ours = SubsampleBatchNorm(momentum=0.9, epsilon=1e-5, subsample=sub)
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    return ours, ref


class TestSubsampleBatchNorm:
    def test_tree_matches_batchnorm(self):
        x = jax.random.normal(jax.random.key(0), (8, 4, 4, 3))
        ours, ref = _bn_pair(4)
        vo = ours.init(jax.random.key(1), x, use_running_average=False)
        vr = ref.init(jax.random.key(1), x, use_running_average=False)
        assert jax.tree.structure(vo) == jax.tree.structure(vr)

    def test_stats_equal_batchnorm_on_subbatch(self):
        """stats == nn.BatchNorm's batch stats over x[:batch//s], and the
        normalize applies those stats to the FULL batch."""
        x = jax.random.normal(jax.random.key(2), (8, 4, 4, 3)) * 2 + 1
        ours, ref = _bn_pair(4)
        v = ours.init(jax.random.key(3), x, use_running_average=False)
        yo, mo = ours.apply(v, x, use_running_average=False,
                            mutable=["batch_stats"])
        yr, mr = ref.apply(v, x[:2], use_running_average=False,
                           mutable=["batch_stats"])
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mo["batch_stats"][k]),
                np.asarray(mr["batch_stats"][k]), rtol=1e-5, atol=1e-6)
        # the sub-batch rows are normalized identically in both
        np.testing.assert_allclose(np.asarray(yo[:2]), np.asarray(yr),
                                   rtol=1e-4, atol=1e-5)
        # full-batch rows use the same affine transform (raw BATCH stats of
        # the sub-batch, not the EMA'd running stats)
        xs = np.asarray(x[:2], np.float64)
        bmean = xs.mean((0, 1, 2))
        bvar = (xs * xs).mean((0, 1, 2)) - bmean * bmean
        want = (np.asarray(x) - bmean) / np.sqrt(bvar + 1e-5)
        np.testing.assert_allclose(np.asarray(yo), want, rtol=1e-4,
                                   atol=1e-5)

    def test_subsample_one_equals_batchnorm(self):
        x = jax.random.normal(jax.random.key(4), (8, 4, 4, 3))
        ours, ref = _bn_pair(1)
        v = ours.init(jax.random.key(5), x, use_running_average=False)
        yo, mo = ours.apply(v, x, use_running_average=False,
                            mutable=["batch_stats"])
        yr, mr = ref.apply(v, x, use_running_average=False,
                           mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yo), np.asarray(yr),
                                   rtol=1e-4, atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mo["batch_stats"][k]),
                np.asarray(mr["batch_stats"][k]), rtol=1e-5, atol=1e-6)

    def test_eval_identical_to_batchnorm(self):
        x = jax.random.normal(jax.random.key(6), (4, 4, 4, 3))
        ours, ref = _bn_pair(4)
        v = ours.init(jax.random.key(7), x, use_running_average=False)
        yo = ours.apply(v, x, use_running_average=True)
        yr = ref.apply(v, x, use_running_average=True)
        np.testing.assert_allclose(np.asarray(yo), np.asarray(yr),
                                   rtol=1e-5, atol=1e-6)

    def test_model_level(self):
        """bn_subsample model inits to the same tree and trains a step."""
        kw = dict(units=(1, 1), filters=(8, 16, 32), num_classes=10,
                  bottleneck=True, version=1, cifar_stem=True)
        base = ResNet(**kw)
        sub = ResNet(bn_subsample=4, **kw)
        x = jax.random.normal(jax.random.key(8), (8, 16, 16, 3))
        v = base.init(jax.random.key(9), x, train=False)
        v2 = sub.init(jax.random.key(9), x, train=False)
        assert jax.tree.structure(v) == jax.tree.structure(v2)
        # eval identical (running stats — subsampling is train-only)
        np.testing.assert_allclose(
            np.asarray(base.apply(v, x, train=False)),
            np.asarray(sub.apply(v, x, train=False)), rtol=1e-5, atol=1e-5)
        # train mode runs and mutates stats
        y, m = sub.apply(v, x, train=True, mutable=["batch_stats"])
        assert np.isfinite(np.asarray(y)).all()
