"""HSL jitter vs a colorsys-based NumPy oracle + grouped-conv semantics.

The HSL oracle implements the reference augmenter's color math
(mxnet src/io/image_aug_default.cc: BGR->HLS, add uniform deltas in OpenCV
units — H in [0,180), L/S in [0,255] — convert back, clip) independently via
Python's colorsys, validating our vectorized VPU implementation.
"""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.ops.augment import _rgb_to_hsl_adjust


def _oracle_hsl(img: np.ndarray, dh: float, ds: float, dl: float):
    """img float32 (H,W,3) in [0,255]; deltas in OpenCV HLS units."""
    out = np.zeros_like(img)
    for i in range(img.shape[0]):
        for j in range(img.shape[1]):
            r, g, b = img[i, j] / 255.0
            h, l, s = colorsys.rgb_to_hls(r, g, b)
            h = ((h * 180.0 + dh) % 180.0) / 180.0
            l = np.clip(l + dl / 255.0, 0.0, 1.0)
            s = np.clip(s + ds / 255.0, 0.0, 1.0)
            r2, g2, b2 = colorsys.hls_to_rgb(h, l, s)
            out[i, j] = np.clip(np.array([r2, g2, b2]) * 255.0, 0, 255)
    return out


def test_hsl_matches_colorsys_oracle():
    rng = np.random.default_rng(0)
    img = rng.integers(10, 246, (6, 5, 3)).astype(np.float32)

    # fixed deltas: drive the vectorized path with a deterministic "random"
    # draw by monkeypatching uniform draws through a fixed key and reading
    # the deltas back out of the implementation's own sampling.
    key = jax.random.key(42)
    rh, rs, rl = jax.random.split(key, 3)
    dh = float(jax.random.uniform(rh, (1, 1, 1), minval=-36.0, maxval=36.0)[0, 0, 0])
    ds = float(jax.random.uniform(rs, (1, 1, 1), minval=-50.0, maxval=50.0)[0, 0, 0])
    dl = float(jax.random.uniform(rl, (1, 1, 1), minval=-50.0, maxval=50.0)[0, 0, 0])

    got = np.asarray(_rgb_to_hsl_adjust(
        jnp.asarray(img[None]), key, 36.0, 50.0, 50.0))[0]
    want = _oracle_hsl(img, dh, ds, dl)
    # rounding differences at hue sector boundaries allow ~1.5 LSB
    np.testing.assert_allclose(got, want, atol=1.6)


def test_grouped_conv_equals_manual_groups():
    """ResNeXt's grouped 3x3 == concat of per-group convs (the num_group
    semantics of mx.sym.Convolution)."""
    import flax.linen as nn
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 8)).astype(np.float32))
    conv = nn.Conv(16, (3, 3), padding="SAME", feature_group_count=4,
                   use_bias=False)
    v = conv.init(jax.random.key(0), x)
    y = conv.apply(v, x)
    k = v["params"]["kernel"]  # (3,3, in/groups=2, out=16)
    outs = []
    for g in range(4):
        xg = x[..., g * 2:(g + 1) * 2]
        kg = k[..., g * 4:(g + 1) * 4]
        yg = jax.lax.conv_general_dilated(
            xg, kg, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(yg)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(jnp.concatenate(outs, -1)),
                               rtol=1e-4, atol=1e-5)
