"""Oracle tests for the stem max-pool backward knob (ops/pool.py).

Rebuilds ref:symbol/resnet.py Pooling(kernel=3, stride=2, max) backward
semantics: the canonical path routes each window's cotangent to one
argmax (XLA select_and_scatter); the ``mask`` execution knob splits it
evenly among tied maxima. On tie-free input the two are identical —
pinned here against jax.grad of the canonical path and against an
independent NumPy float64 oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.ops.pool import max_pool_mask, stem_max_pool

pytestmark = pytest.mark.fast


def _numpy_oracle_grad(x, dy):
    """float64 tie-splitting maxpool backward, direct window loops."""
    n, h, w, c = x.shape
    ho, wo = dy.shape[1], dy.shape[2]
    xp = np.full((n, h + 2, w + 2, c), -np.inf)
    xp[:, 1:h + 1, 1:w + 1, :] = x
    dxp = np.zeros_like(xp)
    for b in range(n):
        for i in range(ho):
            for j in range(wo):
                for ch in range(c):
                    win = xp[b, 2 * i:2 * i + 3, 2 * j:2 * j + 3, ch]
                    m = win.max()
                    mask = win == m
                    dxp[b, 2 * i:2 * i + 3, 2 * j:2 * j + 3, ch] += (
                        mask * dy[b, i, j, ch] / mask.sum())
    return dxp[:, 1:h + 1, 1:w + 1, :]


class TestForward:
    @pytest.mark.parametrize("hw", [(8, 8), (10, 6), (112, 112)])
    def test_matches_canonical(self, hw):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, *hw, 3)), jnp.float32)
        np.testing.assert_array_equal(
            max_pool_mask(x), stem_max_pool(x, "sas"))


class TestBackward:
    def _grads(self, x, mode):
        f = lambda v: jnp.sum(stem_max_pool(v, mode) ** 2)
        return jax.grad(f)(x)

    @pytest.mark.parametrize("hw", [(8, 8), (10, 6), (56, 56)])
    def test_tie_free_matches_select_and_scatter(self, hw):
        # continuous random input: ties have measure zero, the two
        # backward routings coincide exactly
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, *hw, 4)), jnp.float32)
        np.testing.assert_allclose(self._grads(x, "mask"),
                                   self._grads(x, "sas"), atol=1e-6)

    def test_matches_numpy_f64_oracle_with_ties(self):
        # post-ReLU-like input: ~half zeros => heavy tie load
        rng = np.random.default_rng(2)
        xf = np.maximum(rng.normal(size=(2, 10, 10, 3)), 0.0)
        dy = rng.normal(size=(2, 5, 5, 3))
        y, vjp = jax.vjp(max_pool_mask, jnp.asarray(xf, jnp.float32))
        (dx,) = vjp(jnp.asarray(dy, jnp.float32))
        np.testing.assert_allclose(
            dx, _numpy_oracle_grad(xf, dy), rtol=1e-5, atol=1e-6)

    def test_cotangent_mass_is_conserved(self):
        # the even split must conserve each window's cotangent exactly
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            np.maximum(rng.normal(size=(1, 8, 8, 2)), 0.0), jnp.float32)
        dy = jnp.ones((1, 4, 4, 2), jnp.float32)
        _, vjp = jax.vjp(max_pool_mask, x)
        (dx,) = vjp(dy)
        np.testing.assert_allclose(float(dx.sum()), float(dy.sum()),
                                   rtol=1e-5)


class TestModelKnob:
    def test_pool_grad_wires_through_registry(self):
        from resnet_tpu.config import Config
        from resnet_tpu.models import get_model

        cfg = Config()
        cfg.model.depth = 50
        cfg.data.num_classes = 5
        cfg.data.image_shape = (32, 32, 3)
        cfg.train.pool_grad = "mask"
        model = get_model(cfg)
        assert model.pool_grad == "mask"
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        v = model.init(jax.random.key(0), x, train=False)
        # same params, same forward as the canonical path
        cfg.train.pool_grad = "sas"
        ref = get_model(cfg)
        np.testing.assert_allclose(
            model.apply(v, x, train=False), ref.apply(v, x, train=False))
