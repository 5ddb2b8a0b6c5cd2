"""max_random_contrast / max_random_illumination photometric jitters.

Reference knobs of mx.io.ImageRecordIter's normalize stage (mxnet
src/io/iter_image_recordio_2.cc folds them into the per-image
RGBA_MULT/RGBA_BIAS normalize constants — reconstructed semantics, the
mount is empty): out = ((x - mean) * alpha + beta) / std with per-image
alpha ~ U[1-c, 1+c] and beta ~ U[-il, il]. Covered here:

  - NumPy oracle of the affine (new-op rule, CLAUDE.md conventions);
  - enabling the knobs must NOT perturb the crop/mirror/HSL random
    streams (the jitter key derives via fold_in, so golden trajectories
    under the shipped knob-off presets stay valid);
  - the Pallas backend must agree with the XLA path with the knobs on
    (it routes through the shared finish_normalize epilogue);
  - CLI plumb-through.
"""

import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.config import DataConfig, parse_config
from resnet_tpu.ops import augment
from resnet_tpu.ops.augment import finish_normalize
from resnet_tpu.ops.augment_pallas import augment_imagenet_pallas


def _jitter_params(key, n, c, il):
    """Read back the alpha/beta draws through the implementation's own
    key derivation (the fixed-key pattern of test_augment_oracle.py)."""
    r_con, r_ill = jax.random.split(jax.random.fold_in(key, 0xC1))
    alpha = np.asarray(jax.random.uniform(
        r_con, (n, 1, 1, 1), minval=1.0 - c, maxval=1.0 + c))
    beta = np.asarray(jax.random.uniform(
        r_ill, (n, 1, 1, 1), minval=-il, maxval=il))
    return alpha, beta


def test_contrast_illumination_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (3, 8, 8, 3)).astype(np.float32)
    cfg = DataConfig(max_random_contrast=0.4, max_random_illumination=20.0)
    key = jax.random.key(5)
    got = np.asarray(finish_normalize(jnp.asarray(x), key, cfg, jnp.float32))
    alpha, beta = _jitter_params(key, 3, 0.4, 20.0)
    mean = np.array(cfg.mean_rgb, np.float32)
    std = np.array(cfg.std_rgb, np.float32)
    want = ((x - mean) * alpha + beta) / std
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # alpha/beta vary per image (per-image draws, not per batch)
    assert len(np.unique(alpha)) == 3 and len(np.unique(beta)) == 3


def test_knobs_do_not_perturb_the_augment_stream():
    """out_on == out_off * alpha + beta/std elementwise proves the
    crop/mirror/HSL draws are untouched by enabling the new knobs."""
    rng = np.random.default_rng(1)
    canvas = rng.integers(0, 256, (4, 40, 40, 3), np.uint8)
    key = jax.random.key(9)
    c, il = 0.3, 15.0
    off = np.asarray(augment.augment_imagenet(
        jnp.asarray(canvas), key, DataConfig(), (32, 32), jnp.float32))
    on = np.asarray(augment.augment_imagenet(
        jnp.asarray(canvas), key,
        DataConfig(max_random_contrast=c, max_random_illumination=il),
        (32, 32), jnp.float32))
    alpha, beta = _jitter_params(key, 4, c, il)
    std = np.array(DataConfig().std_rgb, np.float32)
    np.testing.assert_allclose(on, off * alpha + beta / std,
                               rtol=1e-4, atol=1e-4)


def test_pallas_matches_xla_with_photometric_knobs():
    rng = np.random.default_rng(2)
    canvas = rng.integers(0, 256, (2, 40, 40, 3), np.uint8)
    key = jax.random.key(13)
    for cfg in (
        DataConfig(max_random_contrast=0.5, max_random_illumination=25.0),
        # contrast-only, HSL off: exercises the identity-crop routing
        DataConfig(max_random_contrast=0.5, random_h=0, random_s=0,
                   random_l=0),
    ):
        got = augment_imagenet_pallas(jnp.asarray(canvas), key, cfg,
                                      (32, 32), jnp.float32, interpret=True)
        want = augment.augment_imagenet(jnp.asarray(canvas), key, cfg,
                                        (32, 32), jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-2, rtol=1e-4)


def test_cifar_pad_fill_value_oracle():
    """ImageRecordIter `pad`/`fill_value` knobs on the CIFAR pad-and-crop
    path: NumPy replay of the padded crop with the implementation's own
    offset draws."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    key = jax.random.key(21)
    cfg = DataConfig(pad=2, fill_value=255, rand_mirror=False)
    got = np.asarray(augment.augment_cifar(
        jnp.asarray(imgs), key, cfg, jnp.float32))
    r_crop, _ = jax.random.split(key)
    dy = np.asarray(jax.random.randint(r_crop, (3,), 0, 5))
    dx = np.asarray(jax.random.randint(
        jax.random.fold_in(r_crop, 1), (3,), 0, 5))
    mean = np.array(cfg.mean_rgb, np.float32)
    std = np.array(cfg.std_rgb, np.float32)
    padded = np.pad(imgs, ((0, 0), (2, 2), (2, 2), (0, 0)),
                    constant_values=255)
    assert padded.max() == 255 and (dy.max() > 0 or dx.max() > 0)
    for i in range(3):
        want = (padded[i, dy[i]:dy[i] + 8, dx[i]:dx[i] + 8]
                .astype(np.float32) - mean) / std
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-4)


def test_cifar_pad_zero_is_identity_crop():
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    cfg = DataConfig(pad=0, rand_mirror=False)
    got = np.asarray(augment.augment_cifar(
        jnp.asarray(imgs), jax.random.key(2), cfg, jnp.float32))
    mean = np.array(cfg.mean_rgb, np.float32)
    std = np.array(cfg.std_rgb, np.float32)
    want = (imgs.astype(np.float32) - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_cli_plumb_through():
    cfg = parse_config([
        "--preset", "imagenet_resnet50",
        "--max-random-contrast", "0.125",
        "--max-random-illumination", "12.5",
    ])
    assert cfg.data.max_random_contrast == 0.125
    assert cfg.data.max_random_illumination == 12.5
    cfg2 = parse_config(["--preset", "cifar10_resnet18",
                         "--pad", "2", "--fill-value", "128"])
    assert cfg2.data.pad == 2 and cfg2.data.fill_value == 128
    assert DataConfig().pad == 4 and DataConfig().fill_value == 0
    # defaults stay off (the reference ImageNet cfgs leave them 0)
    assert DataConfig().max_random_contrast == 0.0
    assert DataConfig().max_random_illumination == 0.0
