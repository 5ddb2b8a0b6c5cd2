"""On-device data augmentation (XLA implementation; Pallas kernel in
augment_pallas.py fuses the same semantics).

TPU-first redesign of the reference's CPU-side augmenter
(mxnet src/io/image_aug_default.cc, driven by mx.io.ImageRecordIter kwargs —
SURVEY.md §3.3): the host ships raw uint8 NHWC batches; ALL augmentation math
(random-resized-crop, mirror, HSL jitter, mean/std normalize, dtype cast)
runs inside the jitted train step on device. This is how the <5% input
overhead target is met — the only host work is JPEG decode, and the uint8
transfer is 4x smaller than shipping float32.

Semantics (parity-critical, ref kwargs in parentheses):
  - random-resized-crop: area ~ U[min_random_area, max_random_area] x src,
    aspect ~ U[1/max_aspect_ratio, max_aspect_ratio]; 10 attempts then
    center-crop fallback — the GluonCV/MXNet sampling rule
    (``rand_crop``/``min_random_area``/``max_aspect_ratio``).
  - horizontal mirror with p=0.5 (``rand_mirror``).
  - HSL jitter: additive uniform deltas on hue/sat/lightness
    (``random_h/random_s/random_l``).
  - normalize: ((x - mean_rgb) * alpha + beta) / std_rgb (``mean_r/g/b``,
    ``std_r/g/b``) with the optional per-image photometric jitters
    alpha ~ U[1-c, 1+c] (``max_random_contrast``) and beta ~ U[-il, il]
    (``max_random_illumination``) — the ImageRecordIter normalize-stage
    knobs; both off in every shipped preset (finish_normalize).
  - CIFAR path: pad-4 + random 32x32 crop + mirror (the classic recipe the
    reference applies via rand_crop on 32x32 inputs).

The per-example randomness derives from a single per-step jax PRNG key —
deterministic and replayable, unlike the reference's C++ thread-local RNGs.

Known fidelity deviation (train canvas): the host loader letterboxes each
decoded image onto a fixed uint8 canvas (default 256x256,
cfg.data.canvas_size to raise) and the crop executes on THAT, with the
sampling domain mapped back to the full original image via per-image dims.
The crop *distribution* is therefore exact, but the pixel *content* of a
crop taken from a source larger than the canvas is double-resampled
(orig -> canvas -> 224), which the reference's CPU augmenter — cropping
the full decoded image (mxnet:src/io/image_aug_default.cc) — does not do.
For shorter-side-256 packs (the standard recipe; im2rec --resize 256) the
canvas loses little (e.g. a 256x341 source letterboxes to 192x256 eff),
and raising --canvas-size to 288/320 shrinks the loss further at a
measured throughput cost (PERF_NOTES.md canvas sweep).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from resnet_tpu.config import DataConfig


def normalize(images: jnp.ndarray, mean_rgb, std_rgb,
              dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] NHWC -> normalized compute dtype."""
    mean = jnp.asarray(mean_rgb, jnp.float32)
    inv_std = 1.0 / jnp.asarray(std_rgb, jnp.float32)
    x = images.astype(jnp.float32)
    return ((x - mean) * inv_std).astype(dtype)


def finish_normalize(images: jnp.ndarray, rng, cfg: DataConfig,
                     dtype=jnp.float32, channel_tile: int = 1
                     ) -> jnp.ndarray:
    """Shared train-time normalize epilogue of BOTH augmentation backends.

    Implements the reference's normalize stage including the optional
    ``max_random_contrast`` / ``max_random_illumination`` photometric
    jitters (ref: mx.io.ImageRecordIter kwargs; mxnet
    src/io/iter_image_recordio_2.cc folds them into the per-image
    RGBA_MULT/RGBA_BIAS normalize constants — reconstructed semantics,
    the mount is empty):

        out = ((x - mean) * alpha + beta) / std
        alpha ~ U[1-c, 1+c] per image,  beta ~ U[-il, il] per image

    ``rng`` is the augmenter's per-step key; the jitter keys derive via
    ``fold_in`` so enabling the knobs does not perturb the crop/mirror/HSL
    streams (golden trajectories stay valid). With both knobs 0 (every
    shipped preset) the op sequence is bitwise-identical to the plain
    (x - mean) * inv_std normalize.

    ``channel_tile=4`` normalizes a space-to-depth-blocked (..., 12)
    image (channel order (py, px, c) — the round-4 aug_s2d layout).
    """
    mean = jnp.asarray(tuple(cfg.mean_rgb) * channel_tile, jnp.float32)
    inv_std = 1.0 / jnp.asarray(tuple(cfg.std_rgb) * channel_tile,
                                jnp.float32)
    x = images.astype(jnp.float32) - mean
    c = cfg.max_random_contrast
    il = cfg.max_random_illumination
    if c > 0 or il > 0:
        n = x.shape[0]
        r_con, r_ill = jax.random.split(jax.random.fold_in(rng, 0xC1))
        if c > 0:
            alpha = jax.random.uniform(
                r_con, (n, 1, 1, 1), minval=1.0 - c, maxval=1.0 + c)
            x = x * alpha
        if il > 0:
            beta = jax.random.uniform(
                r_ill, (n, 1, 1, 1), minval=-il, maxval=il)
            x = x + beta
    return (x * inv_std).astype(dtype)


def _mirror(images: jnp.ndarray, rng) -> jnp.ndarray:
    """Per-example horizontal flip with p=0.5 (ref: rand_mirror)."""
    n = images.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (n,))
    flipped = jnp.flip(images, axis=2)
    return jnp.where(flip[:, None, None, None], flipped, images)


# ---------------------------------------------------------------------------
# CIFAR: pad-4 + random crop + mirror
# ---------------------------------------------------------------------------

def augment_cifar(images_u8: jnp.ndarray, rng, cfg: DataConfig,
                  dtype=jnp.float32,
                  pad: Optional[int] = None) -> jnp.ndarray:
    """(N,32,32,3) uint8 -> augmented normalized (N,32,32,3) dtype.

    ``pad``/``fill_value`` follow the reference ImageRecordIter knobs
    (cfg.pad/cfg.fill_value; an explicit ``pad`` argument overrides).
    """
    n, h, w, c = images_u8.shape
    if pad is None:
        pad = int(cfg.pad)
    fill = int(cfg.fill_value)
    r_crop, r_mirror = jax.random.split(rng)
    padded = jnp.pad(images_u8, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="constant", constant_values=fill)
    dy = jax.random.randint(r_crop, (n,), 0, 2 * pad + 1)
    dx = jax.random.randint(jax.random.fold_in(r_crop, 1), (n,), 0,
                            2 * pad + 1)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (h, w, c))

    images = jax.vmap(crop_one)(padded, dy, dx)
    if cfg.rand_mirror:
        images = _mirror(images, r_mirror)
    return finish_normalize(images, rng, cfg, dtype)


# ---------------------------------------------------------------------------
# ImageNet: random-resized-crop (+mirror, +HSL) from a host canvas
# ---------------------------------------------------------------------------

def aspect_range(max_aspect_ratio: float,
                 min_aspect_ratio: Optional[float] = None):
    """MXNet aspect-ratio convention (mx.io.ImageRecordIter docs): if
    ``min_aspect_ratio`` is given the range is [min, max]; otherwise it is
    [1 - a, 1 + a] (the reference cfgs use a = 0.25). Values a > 1 are
    accepted as the multiplicative [1/a, a] convention other frameworks
    use (GluonCV-style configs) — a 4/3 means [3/4, 4/3]."""
    if min_aspect_ratio is not None:
        if not 0 < min_aspect_ratio <= max_aspect_ratio:
            raise ValueError(
                f"aspect range [{min_aspect_ratio}, {max_aspect_ratio}] "
                "is empty")
        return float(min_aspect_ratio), float(max_aspect_ratio)
    a = float(max_aspect_ratio)
    if a < 0:
        raise ValueError(f"max_aspect_ratio must be >= 0, got {a}")
    if a <= 1.0:
        return 1.0 - a, 1.0 + a
    return 1.0 / a, a


def _pick_first(m, first):
    return jnp.take_along_axis(m, first[:, None], axis=1)[:, 0]


def boxes_from_uniforms(u_area, u_ratio, u_y, u_x, src_h, src_w,
                        min_area: float, max_area: float,
                        lo_aspect: float, hi_aspect: float):
    """MXNet random-resized-crop box math as a pure function of uniform
    draws (mxnet src/io/image_aug_default.cc random_resized_crop rules):

      per attempt: area ~ U[min_area, max_area] * H*W,
                   ratio ~ U[lo_aspect, hi_aspect],
                   cw = round(sqrt(area * ratio)), ch = round(sqrt(area / ratio))
      first attempt with cw <= W and ch <= H wins; origins are INTEGER
      uniform in [0, H-ch] x [0, W-cw]. Fallback after all attempts: the
      center square of the short side (the GluonCV/torchvision-documented
      fallback of this sampler family).

    All inputs are (N, A) / (N,) arrays; pure jnp so the NumPy oracle in
    tests/test_augment.py re-implements it independently for parity.
    """
    src_h = src_h.astype(jnp.float32)[:, None]              # (N, 1)
    src_w = src_w.astype(jnp.float32)[:, None]
    area = (min_area + u_area * (max_area - min_area)) * src_h * src_w
    ratio = lo_aspect + u_ratio * (hi_aspect - lo_aspect)
    cw = jnp.round(jnp.sqrt(area * ratio))
    ch = jnp.round(jnp.sqrt(area / ratio))
    ok = (cw <= src_w) & (ch <= src_h) & (cw >= 1) & (ch >= 1)
    first = jnp.argmax(ok, axis=1)                           # first True
    any_ok = jnp.any(ok, axis=1)
    src_h, src_w = src_h[:, 0], src_w[:, 0]
    short = jnp.minimum(src_h, src_w)
    cw = jnp.where(any_ok, _pick_first(cw, first), short)
    ch = jnp.where(any_ok, _pick_first(ch, first), short)
    # integer origins: floor(u * (range + 1)), clipped (u < 1 a.s.)
    uy = _pick_first(u_y, first)
    ux = _pick_first(u_x, first)
    y0_rand = jnp.minimum(jnp.floor(uy * (src_h - ch + 1.0)), src_h - ch)
    x0_rand = jnp.minimum(jnp.floor(ux * (src_w - cw + 1.0)), src_w - cw)
    y0 = jnp.where(any_ok, y0_rand, jnp.floor((src_h - ch) / 2.0))
    x0 = jnp.where(any_ok, x0_rand, jnp.floor((src_w - cw) / 2.0))
    return y0, x0, ch, cw


def sample_crop_boxes(rng, src_h, src_w, min_area: float, max_area: float,
                      max_aspect_ratio: float,
                      min_aspect_ratio: Optional[float] = None,
                      attempts: int = 10):
    """MXNet random-resized-crop sampling over per-image source dims.

    ``src_h``/``src_w`` are (N,) arrays of ORIGINAL image dims — every
    crop is sampled from the full image domain, exactly like the
    reference's CPU augmenter which sees the full decoded image.
    Returns (y0, x0, ch, cw) float (N,) arrays, integer-valued.
    """
    lo, hi = aspect_range(max_aspect_ratio, min_aspect_ratio)
    n = src_h.shape[0]
    ra, rr, ry, rx = jax.random.split(rng, 4)
    shape = (n, attempts)
    return boxes_from_uniforms(
        jax.random.uniform(ra, shape), jax.random.uniform(rr, shape),
        jax.random.uniform(ry, shape), jax.random.uniform(rx, shape),
        src_h, src_w, min_area, max_area, lo, hi)


def scale_boxes_from_uniforms(u_scale, u_ratio, u_y, u_x, src_h, src_w,
                              min_scale: float, max_scale: float,
                              lo_aspect: float, hi_aspect: float,
                              rand_crop: bool):
    """MXNet's CLASSIC (random_resized_crop=False) rand-crop semantics
    (mxnet src/io/image_aug_default.cc scale path): the image's shorter
    side is resized to ``data_shape * s`` with s ~ U[min_scale, max_scale]
    and the width additionally stretched by ratio ~ U[lo, hi]; a
    data_shape-sized crop is taken at a random (rand_crop) or center
    position. Expressed as a source-image crop box: a window of
    short/s x short/(s*ratio) pixels, uniformly placed.
    """
    src_h = src_h.astype(jnp.float32)
    src_w = src_w.astype(jnp.float32)
    short = jnp.minimum(src_h, src_w)
    s = min_scale + u_scale * (max_scale - min_scale)
    ratio = lo_aspect + u_ratio * (hi_aspect - lo_aspect)
    ch = jnp.clip(jnp.round(short / s), 1.0, src_h)
    cw = jnp.clip(jnp.round(short / (s * ratio)), 1.0, src_w)
    if rand_crop:
        y0 = jnp.minimum(jnp.floor(u_y * (src_h - ch + 1.0)), src_h - ch)
        x0 = jnp.minimum(jnp.floor(u_x * (src_w - cw + 1.0)), src_w - cw)
    else:
        y0 = jnp.floor((src_h - ch) / 2.0)
        x0 = jnp.floor((src_w - cw) / 2.0)
    return y0, x0, ch, cw


def sample_scale_crop_boxes(rng, src_h, src_w, min_scale: float,
                            max_scale: float, max_aspect_ratio: float,
                            min_aspect_ratio: Optional[float] = None,
                            rand_crop: bool = True):
    lo, hi = aspect_range(max_aspect_ratio, min_aspect_ratio)
    n = src_h.shape[0]
    rs, rr, ry, rx = jax.random.split(rng, 4)
    return scale_boxes_from_uniforms(
        jax.random.uniform(rs, (n,)), jax.random.uniform(rr, (n,)),
        jax.random.uniform(ry, (n,)), jax.random.uniform(rx, (n,)),
        src_h, src_w, min_scale, max_scale, lo, hi, rand_crop)


def resample_weights(starts: jnp.ndarray, sizes: jnp.ndarray, out_size: int,
                     src_size: int,
                     flip: Optional[jnp.ndarray] = None,
                     valid_size: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-example 1-D bilinear resampling matrices, (N, out, src).

    TPU-first trick: a bilinear crop-resize is a LINEAR map, so instead of
    per-pixel gathers (slow lane-crossing on the VPU) we build the sparse
    interpolation matrix densely and let the MXU apply it as a matmul —
    ``out = Wy @ img @ Wx^T``. W has two nonzeros per row
    (w[i,j] = max(0, 1-|s_i - j|)), and constructing it is pure elementwise
    iota math that XLA fuses. The cv2/MXNet coordinate convention
    s_i = start + (i+0.5)*size/out - 0.5 is used, matching the reference's
    augmenter and our C++ host resizer.

    ``flip`` (N,) bool folds the horizontal mirror into Wx by reversing the
    output coordinates — the mirror costs nothing.

    ``valid_size`` (N,) clips sample coordinates per example — letterboxed
    canvases are only valid up to the image's effective extent, and an
    edge-touching crop must clamp to the last REAL row/column instead of
    bilinearly blending the zero padding into the output border.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)[None, :]        # (1, out)
    if flip is not None:
        i = jnp.where(flip[:, None], out_size - 1 - i, i)        # (N, out)
    scale = (sizes / out_size)[:, None]                          # (N, 1)
    src = starts[:, None] + (i + 0.5) * scale - 0.5              # (N, out)
    hi = (jnp.asarray(valid_size, jnp.float32)[:, None] - 1.0
          if valid_size is not None else src_size - 1.0)
    src = jnp.clip(src, 0.0, hi)
    j = jnp.arange(src_size, dtype=jnp.float32)                  # (src,)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - j))     # (N,out,src)
    return w


def crop_resize_bilinear(images: jnp.ndarray, boxes, out_hw: Tuple[int, int],
                         dtype=jnp.float32,
                         flip: Optional[jnp.ndarray] = None,
                         valid_hw=None, s2d: bool = False) -> jnp.ndarray:
    """Per-example crop box -> bilinear resize to out_hw (+ fused mirror).

    Two batched matmuls on the MXU (see resample_weights): vertical then
    horizontal resample. ~350 MFLOP per 256->224 image — noise next to the
    ResNet-50 step, and it replaces every gather in the input pipeline.
    ``valid_hw`` = per-example (eff_h, eff_w) of a letterboxed canvas.

    ``s2d=True`` emits the result directly in space-to-depth block layout
    (N, oh/2, ow/2, 4c), channel order (py, px, c) — the layout
    ``models/resnet._StemConvS2D`` consumes pre-blocked, deleting the
    stem's regroup copies (round 4; same contractions, the 2x2 phase
    split folded into the einsum output indexing).
    """
    y0, x0, ch, cw = boxes
    oh, ow = out_hw
    n, sh, sw, c = images.shape
    vh, vw = valid_hw if valid_hw is not None else (None, None)
    wy = resample_weights(y0, ch, oh, sh, valid_size=vh)        # (N,oh,sh)
    wx = resample_weights(x0, cw, ow, sw, flip=flip,
                          valid_size=vw)                        # (N,ow,sw)
    img = images.astype(jnp.float32)
    # (N,oh,sh) @ (N,sh,sw*c) -> (N,oh,sw*c)
    tmp = jax.lax.dot_general(
        wy, img.reshape(n, sh, sw * c),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    tmp = tmp.reshape(n, oh, sw, c)
    if s2d:
        if oh % 2 or ow % 2:
            raise ValueError(f"s2d needs even output size, got {out_hw}")
        # phase-split the output rows/cols into the block-channel axes:
        # out[n,h2,w2,py,px,c] = sum_s wx[n,2*w2+px,s] * tmp[n,2*h2+py,s,c]
        tmp5 = tmp.reshape(n, oh // 2, 2, sw, c)
        wx4 = wx.reshape(n, ow // 2, 2, sw)
        out = jnp.einsum("nwqs,nhpsc->nhwpqc", wx4, tmp5,
                         preferred_element_type=jnp.float32)
        return out.reshape(n, oh // 2, ow // 2, 4 * c).astype(dtype)
    # contract sw: (N,ow,sw) x (N,oh,sw,c) -> (N,oh,ow,c)
    out = jnp.einsum("nws,nhsc->nhwc", wx, tmp,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def _rgb_to_hsl_adjust(images: jnp.ndarray, rng, random_h: float,
                       random_s: float, random_l: float) -> jnp.ndarray:
    """Additive HSL jitter (ref: random_h/s/l kwargs; mxnet converts
    BGR->HLS via OpenCV, adds per-image uniform deltas, converts back).

    images float32 [0,255] RGB, (n, ..., 3) — any number of middle axes
    (the aug_s2d layout reshapes to (n, h/2, w/2, 4, 3)). Uses the
    standard HSL round-trip, elementwise — pure VPU work that XLA fuses
    with the surrounding ops.
    """
    n = images.shape[0]
    rh, rs, rl = jax.random.split(rng, 3)
    # sample in the historical (n,1,1) shape (stream-stable), broadcast to
    # the input's rank
    bshape = (n,) + (1,) * (images.ndim - 2)
    dh = jax.random.uniform(rh, (n, 1, 1), minval=-random_h,
                            maxval=random_h).reshape(bshape)
    ds = jax.random.uniform(rs, (n, 1, 1), minval=-random_s,
                            maxval=random_s).reshape(bshape)
    dl = jax.random.uniform(rl, (n, 1, 1), minval=-random_l,
                            maxval=random_l).reshape(bshape)

    x = images / 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    cmax = jnp.maximum(jnp.maximum(r, g), b)
    cmin = jnp.minimum(jnp.minimum(r, g), b)
    delta = cmax - cmin
    l = (cmax + cmin) / 2.0
    safe = delta > 1e-8
    s = jnp.where(safe, delta / (1.0 - jnp.abs(2.0 * l - 1.0) + 1e-8), 0.0)
    # hue in [0, 6)
    hr = jnp.where(safe & (cmax == r), ((g - b) / (delta + 1e-8)) % 6.0, 0.0)
    hg = jnp.where(safe & (cmax == g) & (cmax != r),
                   (b - r) / (delta + 1e-8) + 2.0, 0.0)
    hb = jnp.where(safe & (cmax == b) & (cmax != r) & (cmax != g),
                   (r - g) / (delta + 1e-8) + 4.0, 0.0)
    h = hr + hg + hb  # exactly one term is nonzero

    # OpenCV HLS ranges: H in [0,180), L,S in [0,255] — jitter deltas are in
    # those units (ref: random_h=36 means +-36 of 180).
    h = (h * 30.0 + dh) % 180.0 / 30.0          # back to [0,6)
    l = jnp.clip(l + dl / 255.0, 0.0, 1.0)
    s = jnp.clip(s + ds / 255.0, 0.0, 1.0)

    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    xx = c * (1.0 - jnp.abs(h % 2.0 - 1.0))
    m = l - c / 2.0
    hi = h.astype(jnp.int32) % 6
    r2 = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                    [c, xx, jnp.zeros_like(c), jnp.zeros_like(c), xx, c])
    g2 = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                    [xx, c, c, xx, jnp.zeros_like(c), jnp.zeros_like(c)])
    b2 = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                    [jnp.zeros_like(c), jnp.zeros_like(c), xx, c, c, xx])
    out = jnp.stack([r2 + m, g2 + m, b2 + m], axis=-1) * 255.0
    return jnp.clip(out, 0.0, 255.0)


def rotate_images(images: jnp.ndarray, rng, max_angle_deg: float,
                  max_shear_ratio: float = 0.0,
                  angles: Optional[jnp.ndarray] = None,
                  shears: Optional[jnp.ndarray] = None):
    """Per-example affine warp about the image center: rotation by
    U[-a, a] degrees composed with horizontal shear by U[-s, s]
    (ref: max_rotate_angle / max_shear_ratio — MXNet's default augmenter
    folds both into one warpAffine). The warp is not separable, so the
    resample-matmul trick doesn't apply; instead this is ONE batched
    bilinear gather over NHWC (all channels ride each gathered pixel —
    channel-minor is the TPU-friendly layout), with out-of-bounds corners
    zero-masked (warpAffine's constant border). Off by default (MXNet
    recipes ship 0); measured cost when enabled: PERF_NOTES.md."""
    n, h, w, c = images.shape
    r_a, r_s = jax.random.split(rng)
    if angles is None:
        # RADIANS; explicit angles/shears bypass the sampling (the host
        # path's parity pin drives identical params through both backends)
        angles = jax.random.uniform(r_a, (n,), minval=-max_angle_deg,
                                    maxval=max_angle_deg) * (jnp.pi / 180.0)
    if shears is None:
        shears = jax.random.uniform(r_s, (n,), minval=-max_shear_ratio,
                                    maxval=max_shear_ratio)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos = jnp.cos(angles)[:, None, None]
    sin = jnp.sin(angles)[:, None, None]
    # inverse map dst -> src: undo shear([[1, s], [0, 1]]) then rotation,
    # both about the center
    ux = (xx - cx)[None] - shears[:, None, None] * (yy - cy)[None]
    uy = (yy - cy)[None]
    sy = cy + uy * cos - ux * sin    # R(-a), (N,H,W)
    sx = cx + uy * sin + ux * cos

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]

    def corner(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        g = jax.vmap(lambda img, y, x: img[y, x])(images, yc, xc)  # NHWC
        return jnp.where(valid, g, 0.0)

    return (corner(y0, x0) * (1 - wy) * (1 - wx)
            + corner(y0, x0 + 1) * (1 - wy) * wx
            + corner(y0 + 1, x0) * wy * (1 - wx)
            + corner(y0 + 1, x0 + 1) * wy * wx)


def sample_boxes_canvas(rng, cfg: DataConfig, n: int, hc: int, wc: int,
                        out_hw: Tuple[int, int],
                        dims: Optional[jnp.ndarray] = None):
    """Sample crop boxes with MXNet semantics and return them in CANVAS
    coordinates (shared by the XLA and Pallas augmentation backends).

    ``dims`` (N,4) int32 = (orig_h, orig_w, eff_h, eff_w) from the
    letterboxing host loader: boxes are sampled in ORIGINAL image space
    (full-image crop domain, integer dims/origins — the reference
    augmenter's view) and mapped onto the letterboxed canvas by the
    per-image eff/orig scale. Without ``dims`` the canvas IS the image
    (in-memory pipelines ship exact-size images).
    """
    if dims is None:
        src_h = jnp.full((n,), float(hc), jnp.float32)
        src_w = jnp.full((n,), float(wc), jnp.float32)
        sy = sx = jnp.ones((n,), jnp.float32)
    else:
        src_h = dims[:, 0].astype(jnp.float32)
        src_w = dims[:, 1].astype(jnp.float32)
        sy = dims[:, 2].astype(jnp.float32) / src_h
        sx = dims[:, 3].astype(jnp.float32) / src_w
    if cfg.random_resized_crop and cfg.rand_crop:
        y0, x0, ch, cw = sample_crop_boxes(
            rng, src_h, src_w, cfg.min_random_area, cfg.max_random_area,
            cfg.max_aspect_ratio, cfg.min_aspect_ratio)
    elif cfg.rand_crop or cfg.min_random_scale != 1.0 \
            or cfg.max_random_scale != 1.0:
        y0, x0, ch, cw = sample_scale_crop_boxes(
            rng, src_h, src_w, cfg.min_random_scale, cfg.max_random_scale,
            cfg.max_aspect_ratio if cfg.rand_crop else 0.0,
            cfg.min_aspect_ratio if cfg.rand_crop else None,
            rand_crop=cfg.rand_crop)
    else:
        # deterministic center crop (rand_crop=False, no scale jitter):
        # shorter-side resize + center crop of data_shape, expressed as a
        # source box of out_hw * short/out_short pixels.
        oh, ow = out_hw
        short = jnp.minimum(src_h, src_w)
        ch = jnp.minimum(jnp.round(short * (oh / max(oh, ow))), src_h)
        cw = jnp.minimum(jnp.round(short * (ow / max(oh, ow))), src_w)
        y0 = jnp.floor((src_h - ch) / 2.0)
        x0 = jnp.floor((src_w - cw) / 2.0)
    return y0 * sy, x0 * sx, ch * sy, cw * sx


def augment_imagenet(canvas_u8: jnp.ndarray, rng, cfg: DataConfig,
                     out_hw: Tuple[int, int] = (224, 224),
                     dtype=jnp.float32,
                     dims: Optional[jnp.ndarray] = None,
                     s2d: bool = False) -> jnp.ndarray:
    """(N,Hc,Wc,3) uint8 host canvas -> augmented (N,224,224,3) dtype.

    Full train-time pipeline: [rotate] -> random-resized-crop / scale-crop
    (MXNet sampling semantics, full-image domain when ``dims`` ships the
    original sizes) -> mirror -> HSL jitter -> normalize.

    ``s2d=True``: emit (N, oh/2, ow/2, 12) space-to-depth block layout
    for a pre-blocked stem (see crop_resize_bilinear); HSL/normalize run
    on a (..., 4, 3) view — elementwise, same values.
    """
    n, hc, wc, _ = canvas_u8.shape
    r_box, r_mir, r_hsl, r_rot = jax.random.split(rng, 4)
    src = canvas_u8
    if cfg.max_rotate_angle > 0 or cfg.max_shear_ratio > 0:
        src = rotate_images(src.astype(jnp.float32), r_rot,
                            cfg.max_rotate_angle, cfg.max_shear_ratio)
    boxes = sample_boxes_canvas(r_box, cfg, n, hc, wc, out_hw, dims)
    # mirror folds into the horizontal resample matrix — zero extra cost
    flip = (jax.random.bernoulli(r_mir, 0.5, (n,))
            if cfg.rand_mirror else None)
    valid = (dims[:, 2], dims[:, 3]) if dims is not None else None
    x = crop_resize_bilinear(src, boxes, out_hw, jnp.float32,
                             flip=flip, valid_hw=valid, s2d=s2d)
    if cfg.random_h or cfg.random_s or cfg.random_l:
        shape = x.shape
        if s2d:
            x = x.reshape(shape[:-1] + (4, 3))
        x = _rgb_to_hsl_adjust(x, r_hsl, cfg.random_h, cfg.random_s,
                               cfg.random_l)
        x = x.reshape(shape)
    return finish_normalize(x, rng, cfg, dtype,
                            channel_tile=4 if s2d else 1)


def eval_center_crop(canvas_u8: jnp.ndarray, cfg: DataConfig,
                     out_hw: Tuple[int, int] = (224, 224),
                     dtype=jnp.float32) -> jnp.ndarray:
    """Validation path: center crop (ref: val ImageRecordIter center crop)."""
    n, hc, wc, c = canvas_u8.shape
    oh, ow = out_hw
    y0 = (hc - oh) // 2
    x0 = (wc - ow) // 2
    images = jax.lax.dynamic_slice(
        canvas_u8, (0, y0, x0, 0), (n, oh, ow, c))
    return normalize(images, cfg.mean_rgb, cfg.std_rgb, dtype)
