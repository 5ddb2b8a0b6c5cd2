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


def test_split_photometric_matches_in_kernel():
    """Round 4: the in-kernel photometric path (HSL deltas applied inside
    the Mosaic kernel) vs the split formulation (f32 intermediate + XLA
    HSL). Same rng, same op order — interpret mode must agree to float
    tolerance (the TPU lowering's parity is covered by the on-chip
    bitwise gate, tools/device_parity + PARITY.md)."""
    rng = np.random.default_rng(5)
    canvas = rng.integers(0, 256, (3, 40, 40, 3), np.uint8)
    key = jax.random.key(13)
    cfg = DataConfig(random_h=36, random_s=50, random_l=50)
    fused = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg, (32, 32),
                                    jnp.float32, interpret=True)
    split = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg, (32, 32),
                                    jnp.float32, interpret=True,
                                    split_photometric=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                               atol=2e-2, rtol=1e-4)


def test_contrast_illumination_in_kernel():
    rng = np.random.default_rng(6)
    canvas = rng.integers(0, 256, (3, 40, 40, 3), np.uint8)
    key = jax.random.key(17)
    cfg = DataConfig(random_h=0, random_s=0, random_l=0,
                     max_random_contrast=0.3, max_random_illumination=20.0)
    got = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg, (32, 32),
                                  jnp.float32, interpret=True)
    want = augment.augment_imagenet(jnp.asarray(canvas), key, cfg, (32, 32),
                                    jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=1e-4)


def _regroup_s2d(x):
    """Reference regroup: (N,H,W,C) -> (N,H/2,W/2,4C), order (py,px,c) —
    models/resnet._StemConvS2D's input reindex."""
    n, h, w, c = x.shape
    return (x.reshape(n, h // 2, 2, w // 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(n, h // 2, w // 2, 4 * c))


def test_s2d_output_is_regrouped_standard_pallas():
    """aug s2d (round 4) emits bitwise the standard output in space-to-
    depth block order — phase-split matmuls add exact zeros only."""
    rng = np.random.default_rng(7)
    canvas = rng.integers(0, 256, (3, 40, 40, 3), np.uint8)
    key = jax.random.key(19)
    cfg = DataConfig(random_h=36, random_s=50, random_l=50)
    std = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg, (32, 32),
                                  jnp.float32, interpret=True)
    s2d = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg, (32, 32),
                                  jnp.float32, interpret=True, s2d=True)
    assert s2d.shape == (3, 16, 16, 12)
    np.testing.assert_array_equal(np.asarray(s2d),
                                  _regroup_s2d(np.asarray(std)))


def test_s2d_output_is_regrouped_standard_xla():
    rng = np.random.default_rng(8)
    canvas = rng.integers(0, 256, (3, 40, 40, 3), np.uint8)
    dims = np.array([[100, 200, 20, 40], [80, 80, 40, 40],
                     [300, 150, 40, 20]], np.int32)
    key = jax.random.key(23)
    cfg = DataConfig(random_h=36, random_s=50, random_l=50)
    std = augment.augment_imagenet(jnp.asarray(canvas), key, cfg, (32, 32),
                                   jnp.float32, dims=jnp.asarray(dims))
    s2d = augment.augment_imagenet(jnp.asarray(canvas), key, cfg, (32, 32),
                                   jnp.float32, dims=jnp.asarray(dims),
                                   s2d=True)
    assert s2d.shape == (3, 16, 16, 12)
    np.testing.assert_allclose(np.asarray(s2d),
                               _regroup_s2d(np.asarray(std)),
                               atol=1e-4, rtol=1e-5)


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
