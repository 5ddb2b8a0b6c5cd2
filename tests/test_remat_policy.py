"""Selective remat policy (models/resnet.py ResNet.remat_policy="conv").

The policy is a pure execution-schedule change: save conv outputs + BN
batch stats, recompute the elementwise normalize/relu chain in backward.
Math must be identical to the default schedule — same param/variable tree,
same forward values, same gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.models.resnet import ResNet

KW = dict(units=(1, 1), filters=(8, 16, 32), num_classes=10,
          bottleneck=True, cifar_stem=True)


def _loss(model, variables, x, labels):
    def f(params):
        logits, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        one = jax.nn.one_hot(labels, logits.shape[-1])
        loss = -jnp.mean(jnp.sum(one * jax.nn.log_softmax(logits), -1))
        return loss, mut["batch_stats"]
    return jax.jit(jax.value_and_grad(f, has_aux=True))


@pytest.mark.parametrize("version", [1, 2])
def test_grads_match_default_schedule(version):
    base = ResNet(version=version, **KW)
    pol = ResNet(version=version, remat_policy="conv", **KW)
    x = jax.random.normal(jax.random.key(0), (8, 16, 16, 3))
    labels = jnp.arange(8) % 10
    v = base.init(jax.random.key(1), x, train=False)
    v2 = pol.init(jax.random.key(1), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(v2)

    (l1, s1), g1 = _loss(base, v, x, labels)(v["params"])
    (l2, s2), g2 = _loss(pol, v, x, labels)(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_eval_matches_default():
    base = ResNet(**KW)
    pol = ResNet(remat_policy="conv", **KW)
    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    v = base.init(jax.random.key(3), x, train=False)
    np.testing.assert_allclose(
        np.asarray(base.apply(v, x, train=False)),
        np.asarray(pol.apply(v, x, train=False)), rtol=1e-5, atol=1e-6)


def test_composes_with_bn_subsample():
    pol = ResNet(remat_policy="conv", bn_subsample=4, **KW)
    x = jax.random.normal(jax.random.key(4), (8, 16, 16, 3))
    labels = jnp.arange(8) % 10
    v = pol.init(jax.random.key(5), x, train=False)
    (loss, _), grads = _loss(pol, v, x, labels)(v["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
