"""Space-to-depth stem lowering: exactness oracle + model-level parity.

The s2d stem (`models/resnet._StemConvS2D`) re-indexes the ImageNet 7x7/2
stem conv (ref:symbol/resnet.py conv0) into a 4x4/1 conv on 2x2-blocked
input — the same contraction, so outputs must match the plain conv to
float-reassociation tolerance, gradients included, with an identical param
tree (execution switch, not an architecture change).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.config import Config
from resnet_tpu.models import get_model
from resnet_tpu.models.resnet import _StemConvS2D, conv_init

@pytest.fixture
def x64():
    # scoped, not module-level: a global jax_enable_x64 flip at import time
    # would leak into every other test file in this process
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


def _plain_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _s2d_conv(x, k):
    n, h, w, c = x.shape
    o = k.shape[-1]
    kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    kp = (kp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, o))
    xb = (x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
           .reshape(n, h // 2, w // 2, 4 * c))
    return jax.lax.conv_general_dilated(
        xb, kp, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("hw", [(16, 16), (24, 32), (224, 224)])
def test_s2d_equals_plain_conv_f64(rng, hw, x64):
    h, w = hw
    x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float64)
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 8)), jnp.float64)
    y0 = _plain_conv(x, k)
    y1 = _s2d_conv(x, k)
    assert y0.shape == y1.shape == (2, h // 2, w // 2, 8)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-12, atol=1e-12)


def test_s2d_gradients_equal_f64(rng, x64):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float64)
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 4)), jnp.float64)
    gy = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float64)
    loss0 = lambda x, k: jnp.vdot(_plain_conv(x, k), gy)
    loss1 = lambda x, k: jnp.vdot(_s2d_conv(x, k), gy)
    gx0, gk0 = jax.grad(loss0, (0, 1))(x, k)
    gx1, gk1 = jax.grad(loss1, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0),
                               rtol=1e-12, atol=1e-12)


def test_module_matches_param_tree_and_output(rng, x64):
    """_StemConvS2D: same param path/shape as the nn.Conv stem, same output."""
    mod = _StemConvS2D(8, dtype=jnp.float64)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float64)
    v = mod.init(jax.random.key(0), x)
    assert v["params"]["kernel"].shape == (7, 7, 3, 8)
    y = mod.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_plain_conv(x, v["params"]["kernel"])),
        rtol=1e-12, atol=1e-12)
    # init distribution matches nn.Conv's (same initializer, same shape)
    k_ref = conv_init(jax.random.key(1), (7, 7, 3, 8), jnp.float64)
    assert k_ref.shape == v["params"]["kernel"].shape


def test_model_logits_parity_r18(rng):
    """Full R18: stem_s2d on/off share the param tree bit-for-bit and
    produce equal logits (f32 tolerance on CPU)."""
    cfg = Config()
    cfg.model.depth = 18
    cfg.data = dataclasses.replace(cfg.data, num_classes=11,
                                   image_shape=(32, 32, 3))
    base = get_model(cfg)
    cfg2 = cfg.replace(train=dataclasses.replace(cfg.train, stem_s2d=True))
    s2d = get_model(cfg2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    v = base.init(jax.random.key(0), x, train=False)
    v2 = s2d.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    chex = [(a.shape, b.shape) for a, b in
            zip(jax.tree.leaves(v), jax.tree.leaves(v2))]
    assert all(a == b for a, b in chex)
    y0 = base.apply(v, x, train=False)
    y1 = s2d.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)


def test_pre_blocked_input_matches(rng):
    """aug_s2d contract (round 4): feeding the model the ALREADY-blocked
    (N,H/2,W/2,12) input must equal feeding the plain image to the
    stem_s2d model (the module does the same regroup internally), with the
    identical (7,7,3,F) param tree."""
    cfg = Config()
    cfg.model.depth = 18
    cfg.data = dataclasses.replace(cfg.data, num_classes=7,
                                   image_shape=(32, 32, 3))
    cfg.train = dataclasses.replace(cfg.train, stem_s2d=True)
    m = get_model(cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    xb = (x.reshape(2, 16, 2, 16, 2, 3).transpose(0, 1, 3, 2, 4, 5)
           .reshape(2, 16, 16, 12))
    v = m.init(jax.random.key(0), x, train=False)
    assert v["params"]["conv0"]["kernel"].shape == (7, 7, 3, 64)
    y0 = m.apply(v, x, train=False)
    y1 = m.apply(v, xb, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    # train-mode too (BN batch stats on the same activations)
    y2, s2 = m.apply(v, x, train=True, mutable=["batch_stats"])
    y3, s3 = m.apply(v, xb, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    # without stem_s2d a 12-channel input must fail loudly
    base = get_model(cfg.replace(train=dataclasses.replace(
        cfg.train, stem_s2d=False)))
    with pytest.raises(ValueError, match="pre-blocked"):
        base.init(jax.random.key(0), xb, train=False)


def test_odd_input_falls_back(rng):
    """Odd spatial sizes can't block 2x2 — the plain conv path must run."""
    cfg = Config()
    cfg.model.depth = 18
    cfg.data = dataclasses.replace(cfg.data, num_classes=5,
                                   image_shape=(33, 33, 3))
    cfg.train = dataclasses.replace(cfg.train, stem_s2d=True)
    m = get_model(cfg)
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 5)
