"""Pallas fused augmentation vs the XLA reference path.

Runs the kernel in interpreter mode (CPU-safe — SURVEY.md §4 'CPU jax is the
universal fake'); both paths consume the SAME rng, so outputs must agree to
matmul-reassociation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.config import DataConfig
from resnet_tpu.ops import augment
from resnet_tpu.ops.augment_pallas import (augment_imagenet_pallas,
                                           fused_crop_mirror_normalize)


def test_fused_matches_xla_path():
    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 256, (4, 40, 40, 3), np.uint8)
    key = jax.random.key(3)
    cfg = DataConfig()
    got = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg, (32, 32),
                                  jnp.float32, interpret=True)
    want = augment.augment_imagenet(jnp.asarray(canvas), key, cfg, (32, 32),
                                    jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=1e-4)


def test_fused_with_hsl_matches():
    rng = np.random.default_rng(1)
    canvas = rng.integers(0, 256, (2, 40, 40, 3), np.uint8)
    key = jax.random.key(7)
    cfg = DataConfig(random_h=36, random_s=50, random_l=50)
    got = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg, (32, 32),
                                  jnp.float32, interpret=True)
    want = augment.augment_imagenet(jnp.asarray(canvas), key, cfg, (32, 32),
                                    jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=1e-4)


def test_fused_with_letterbox_dims_matches():
    """Both backends share sample_boxes_canvas: identical rng + dims must
    give identical crops through the letterbox coordinate mapping."""
    rng = np.random.default_rng(4)
    canvas = np.zeros((3, 40, 40, 3), np.uint8)
    # letterboxed content occupies (h_eff, w_eff) top-left
    dims = np.array([[100, 200, 20, 40], [80, 80, 40, 40], [300, 150, 40, 20]],
                    np.int32)
    for i, (_, _, eh, ew) in enumerate(dims):
        canvas[i, :eh, :ew] = rng.integers(0, 256, (eh, ew, 3), np.uint8)
    key = jax.random.key(11)
    cfg = DataConfig(random_h=0, random_s=0, random_l=0)
    got = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg, (32, 32),
                                  jnp.float32, interpret=True,
                                  dims=jnp.asarray(dims))
    want = augment.augment_imagenet(jnp.asarray(canvas), key, cfg, (32, 32),
                                    jnp.float32, dims=jnp.asarray(dims))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=1e-4)


def test_fused_mirror_and_normalize():
    rng = np.random.default_rng(2)
    canvas = rng.integers(0, 256, (2, 16, 16, 3), np.uint8)
    boxes = (jnp.zeros(2), jnp.zeros(2), jnp.full((2,), 16.0),
             jnp.full((2,), 16.0))
    flip = jnp.asarray([1.0, 0.0])
    out = fused_crop_mirror_normalize(
        jnp.asarray(canvas), boxes, flip, (16, 16),
        (10.0, 20.0, 30.0), (2.0, 4.0, 5.0), jnp.float32, interpret=True)
    want0 = (canvas[0].astype(np.float32)[:, ::-1]
             - np.array([10.0, 20.0, 30.0])) / np.array([2.0, 4.0, 5.0])
    np.testing.assert_allclose(np.asarray(out[0]), want0, atol=1e-2)
    want1 = (canvas[1].astype(np.float32)
             - np.array([10.0, 20.0, 30.0])) / np.array([2.0, 4.0, 5.0])
    np.testing.assert_allclose(np.asarray(out[1]), want1, atol=1e-2)
