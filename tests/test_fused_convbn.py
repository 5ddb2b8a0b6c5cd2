"""Fused conv1x1+BN kernel: numeric parity with the unfused path.

Runs the Pallas kernel in interpreter mode (CPU-safe). The fused model must
match the standard nn.Conv+nn.BatchNorm model on: forward outputs, gradients,
and BN running-stat updates — with the SAME param tree (checkpoints
interchange).
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@contextlib.contextmanager
def _x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)

from resnet_tpu.config import Config
from resnet_tpu.models import get_model
from resnet_tpu.ops.fused_convbn import (conv1x1_bn_stats,
                                         matmul_with_stats,
                                         reference_conv1x1_bn_stats)


class TestKernel:
    def test_matmul_stats_matches_reference(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(384, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        y, s, ss = matmul_with_stats(x, w, bm=128, bn=128, interpret=True)
        yr = x @ w
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s), np.asarray(yr.sum(0)),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ss),
                                   np.asarray((yr * yr).sum(0)), rtol=1e-4)

    def test_custom_vjp_grads(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))

        def loss_fused(x, w):
            y, mean, var = conv1x1_bn_stats(x, w, True)
            return (jnp.sum(jnp.sin(y)) + jnp.sum(mean * 3.0)
                    + jnp.sum(jnp.sqrt(var + 1.0)))

        def loss_ref(x, w):
            y, mean, var = reference_conv1x1_bn_stats(x, w)
            return (jnp.sum(jnp.sin(y)) + jnp.sum(mean * 3.0)
                    + jnp.sum(jnp.sqrt(var + 1.0)))

        gf = jax.grad(loss_fused, argnums=(0, 1))(x, w)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_odd_sizes_blocked(self):
        # non-power-of-two M handled by block shrinking
        x = jnp.ones((96, 24))
        w = jnp.ones((24, 48))
        y, s, ss = matmul_with_stats(x, w, bm=64, bn=64, interpret=True)
        assert y.shape == (96, 48)
        np.testing.assert_allclose(np.asarray(s), 96 * 24.0)


def _models(depth=50):
    cfg = Config()
    cfg.model.depth = depth
    cfg.data.num_classes = 10
    cfg.data.image_shape = (32, 32, 3)
    plain = get_model(cfg, fused=False)
    fused = get_model(cfg, fused=True, pallas_interpret=True)
    return cfg, plain, fused


class TestModelParity:
    def test_same_param_tree(self):
        cfg, plain, fused = _models()
        x = jnp.zeros((2, 32, 32, 3))
        vp = plain.init(jax.random.key(0), x, train=False)
        vf = fused.init(jax.random.key(0), x, train=False)
        sp = jax.tree.structure(vp)
        sf = jax.tree.structure(vf)
        assert sp == sf
        for a, b in zip(jax.tree.leaves(vp), jax.tree.leaves(vf)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_forward_and_stats_match(self):
        cfg, plain, fused = _models()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
        v = plain.init(jax.random.key(0), x, train=False)
        # eval mode
        np.testing.assert_allclose(
            np.asarray(plain.apply(v, x, train=False)),
            np.asarray(fused.apply(v, x, train=False)),
            rtol=1e-3, atol=2e-2)
        # train mode: outputs + mutated batch_stats
        yp, mp = plain.apply(v, x, train=True, mutable=["batch_stats"])
        yf, mf = fused.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yf),
                                   rtol=1e-3, atol=2e-2)
        for a, b in zip(jax.tree.leaves(mp), jax.tree.leaves(mf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-2)

    def test_grads_match_f64(self):
        """Conclusive parity: in float64 the two paths must agree to
        ~f32-param epsilon. (In f32, round-off differences amplify
        chaotically through 50 layers of ReLU kinks, so a loose f32
        comparison can't distinguish correct-from-buggy — f64 can.)"""
        with _x64():
            cfg = Config()
            cfg.model.depth = 50
            cfg.data.num_classes = 10
            cfg.data.image_shape = (32, 32, 3)
            plain = get_model(cfg, fused=False, dtype=jnp.float64)
            fused = get_model(cfg, fused=True, dtype=jnp.float64,
                              pallas_interpret=True)
            rng = np.random.default_rng(2)
            x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)))
            lbl = jnp.asarray(rng.integers(0, 10, (4,)))
            v = plain.init(jax.random.key(0), x, train=False)

            def loss(model, params):
                logits, _ = model.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                lp = jax.nn.log_softmax(logits)
                return -jnp.mean(jnp.take_along_axis(lp, lbl[:, None], 1))

            lp_ = float(loss(plain, v["params"]))
            lf_ = float(loss(fused, v["params"]))
            assert lp_ == pytest.approx(lf_, rel=1e-9)
            gp = jax.grad(lambda p: loss(plain, p))(v["params"])
            gf = jax.grad(lambda p: loss(fused, p))(v["params"])
            for (k, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(gp),
                    jax.tree_util.tree_leaves_with_path(gf)):
                a, b = np.asarray(a), np.asarray(b)
                rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
                assert rel < 1e-5, (jax.tree_util.keystr(k), rel)
