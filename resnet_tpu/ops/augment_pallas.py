"""Pallas-fused on-device augmentation kernel.

One VMEM-resident pass per image fusing the whole train-time augmentation
chain the reference runs on CPU (mxnet src/io/image_aug_default.cc):
uint8 canvas -> random-resized-crop -> mirror -> mean/std normalize ->
compute-dtype cast, with ZERO HBM intermediates. The XLA implementation
(ops/augment.py) materializes the f32 image, the vertical-pass temp and the
weight matrices in HBM; this kernel keeps them all on-chip.

Formulation (same math as ops/augment.py resample_weights): bilinear
crop-resize is linear, so it runs on the MXU as two matmuls,
``out = Wy @ img @ Wx'``. The canvas stays channel-INTERLEAVED (N,H,W*3):
the vertical pass is interleave-oblivious, and the horizontal pass uses the
Kronecker-expanded matrix Wx'[s*3+c, j*3+c'] = Wx[j,s]*(c==c'), built from
pure iota math inside the kernel. Mirror folds into Wx'. Normalization
constants are per-lane (lane%3 selects the channel).

Randomness (crop boxes, flips) is sampled OUTSIDE with jax.random and passed
as a per-image scalar row, so this kernel is bit-comparable with the XLA
path and the augmentation stream is independent of which backend runs it.

Grid: one program per image. VMEM ~4.5 MB/program at 256->224.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resnet_tpu.config import DataConfig
from resnet_tpu.ops.augment import sample_boxes_canvas


def _hsl_interleaved(out, dh, ds, dl):
    """Additive HSL jitter on an (oh, ow*3) channel-INTERLEAVED f32 image.

    Bit-matches ops/augment._rgb_to_hsl_adjust (same expression order on
    the same values): each lane q holds channel c = q%3 of pixel q//3; the
    pixel's other two channels arrive by lane rolls (±1, ±2 — never
    selected where they would wrap), every lane computes the full HSL
    round-trip for ITS pixel and keeps its own channel of the result.
    ~3x redundant VPU arithmetic, zero HBM traffic — the trade that
    deletes the f32 intermediate the split photometric path round-trips
    through HBM (round-4 structural candidate; PERF_NOTES).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    c = lane % 3
    c0 = c == 0
    c1 = c == 1
    lanes = out.shape[1]
    m1 = pltpu.roll(out, 1, 1)             # lane q <- x[q-1]
    m2 = pltpu.roll(out, 2, 1)
    p1 = pltpu.roll(out, lanes - 1, 1)     # lane q <- x[q+1] (mod lanes;
    p2 = pltpu.roll(out, lanes - 2, 1)     # roll only takes shift >= 0)
    r = jnp.where(c0, out, jnp.where(c1, m1, m2)) / 255.0
    g = jnp.where(c0, p1, jnp.where(c1, out, m1)) / 255.0
    b = jnp.where(c0, p2, jnp.where(c1, p1, out)) / 255.0

    # --- ops/augment._rgb_to_hsl_adjust, verbatim expression order ---
    cmax = jnp.maximum(jnp.maximum(r, g), b)
    cmin = jnp.minimum(jnp.minimum(r, g), b)
    delta = cmax - cmin
    l = (cmax + cmin) / 2.0
    safe = delta > 1e-8
    s = jnp.where(safe, delta / (1.0 - jnp.abs(2.0 * l - 1.0) + 1e-8), 0.0)
    hr = jnp.where(safe & (cmax == r), ((g - b) / (delta + 1e-8)) % 6.0, 0.0)
    hg = jnp.where(safe & (cmax == g) & (cmax != r),
                   (b - r) / (delta + 1e-8) + 2.0, 0.0)
    hb = jnp.where(safe & (cmax == b) & (cmax != r) & (cmax != g),
                   (r - g) / (delta + 1e-8) + 4.0, 0.0)
    h = hr + hg + hb

    h = (h * 30.0 + dh) % 180.0 / 30.0
    l = jnp.clip(l + dl / 255.0, 0.0, 1.0)
    s = jnp.clip(s + ds / 255.0, 0.0, 1.0)

    cc = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    xx = cc * (1.0 - jnp.abs(h % 2.0 - 1.0))
    m = l - cc / 2.0
    hi = h.astype(jnp.int32) % 6
    zero = jnp.zeros_like(cc)

    def sel(v0, v1, v2, v3, v4, v5):
        # jnp.select on mutually-exclusive conditions, written as nested
        # where (Mosaic has no argmax lowering for select's index pick;
        # the picked VALUES are identical)
        return jnp.where(
            hi == 0, v0, jnp.where(
                hi == 1, v1, jnp.where(
                    hi == 2, v2, jnp.where(
                        hi == 3, v3, jnp.where(hi == 4, v4, v5)))))

    r2 = sel(cc, xx, zero, zero, xx, cc)
    g2 = sel(xx, cc, cc, xx, zero, zero)
    b2 = sel(zero, zero, xx, cc, cc, xx)
    own = jnp.where(c0, r2 + m, jnp.where(c1, g2 + m, b2 + m)) * 255.0
    return jnp.clip(own, 0.0, 255.0)


def _aug_kernel(box_ref, img_ref, out_ref, *, src_hw, out_hw, mean, inv_std,
                out_dtype, hsl=False, contrast=False, illum=False,
                s2d=False):
    # box_ref is a scalar-prefetch (N, 12) f32 ref in SMEM — indexed by the
    # grid position (Mosaic forbids small SMEM blocks, prefetch is the
    # supported per-program-scalar mechanism)
    sh, sw = src_hw
    oh, ow = out_hw
    i = pl.program_id(0)
    y0 = box_ref[i, 0]
    x0 = box_ref[i, 1]
    ch = box_ref[i, 2]
    cw = box_ref[i, 3]
    flip = box_ref[i, 4]
    # per-image valid extent of a letterboxed canvas: edge-touching crops
    # clamp to the last REAL row/column instead of blending the zero pad
    vh = box_ref[i, 5]
    vw = box_ref[i, 6]

    # Mosaic has no direct uint8->f32 cast; go through int32
    img = img_ref[0].astype(jnp.int32).astype(jnp.float32)  # (sh, sw*3)

    def wy_matrix(rows, phase, step):
        # vertical resample matrix for output rows step*i + phase
        # (Mosaic iota is integer-only)
        i_y = jax.lax.broadcasted_iota(jnp.int32, (rows, sh), 0) \
            .astype(jnp.float32) * step + phase
        j_y = jax.lax.broadcasted_iota(jnp.int32, (rows, sh), 1) \
            .astype(jnp.float32)
        src_y = jnp.clip(y0 + (i_y + 0.5) * (ch / oh) - 0.5, 0.0, vh - 1.0)
        return jnp.maximum(0.0, 1.0 - jnp.abs(src_y - j_y))

    def wx_matrix(lanes, phase=None):
        # horizontal Kronecker-expanded matrix (sw*3, lanes).
        # standard: lane q = j*3 + c. s2d (phase given): lane
        # q = w2*12 + py*6 + px*3 + c with j = 2*w2 + px; rows only feed
        # the lanes of their own vertical phase py == phase (the other
        # phase's lanes are structurally zero — its dot contributes
        # exact 0.0, so the summed two-phase output is BITWISE the
        # standard lowering's values in s2d order).
        r = jax.lax.broadcasted_iota(jnp.int32, (sw * 3, lanes), 0)
        q = jax.lax.broadcasted_iota(jnp.int32, (sw * 3, lanes), 1)
        s = (r // 3).astype(jnp.float32)
        if phase is None:
            j = (q // 3).astype(jnp.float32)
            active = None
        else:
            j = ((q // 12) * 2 + (q % 6) // 3).astype(jnp.float32)
            active = ((q % 12) // 6) == phase
        # mirror: output column j samples column (ow-1-j) when flip is set
        j_eff = jnp.where(flip > 0.5, (ow - 1.0) - j, j)
        src_x = jnp.clip(x0 + (j_eff + 0.5) * (cw / ow) - 0.5, 0.0, vw - 1.0)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(src_x - s))
        same_c = (r % 3) == (q % 3)
        keep = same_c if active is None else same_c & active
        return jnp.where(keep, wx, 0.0)

    if s2d:
        # space-to-depth output (oh/2, ow/2 * 12), channel order
        # (py, px, c) — models/resnet._StemConvS2D's block order, consumed
        # pre-blocked (zero regroup copies between augmenter and stem)
        oh2 = oh // 2
        tmp0 = jnp.dot(wy_matrix(oh2, 0, 2), img,
                       preferred_element_type=jnp.float32)
        tmp1 = jnp.dot(wy_matrix(oh2, 1, 2), img,
                       preferred_element_type=jnp.float32)
        lanes = (ow // 2) * 12
        out = (jnp.dot(tmp0, wx_matrix(lanes, 0),
                       preferred_element_type=jnp.float32)
               + jnp.dot(tmp1, wx_matrix(lanes, 1),
                         preferred_element_type=jnp.float32))
    else:
        tmp = jnp.dot(wy_matrix(oh, 0, 1), img,
                      preferred_element_type=jnp.float32)   # (oh, sw*3)
        out = jnp.dot(tmp, wx_matrix(ow * 3),
                      preferred_element_type=jnp.float32)   # (oh, ow*3)

    if hsl:
        # in-kernel photometric path: HSL jitter on [0,255] pixels before
        # normalization — the s2d lane order keeps every pixel's RGB in 3
        # adjacent lanes (c = lane % 3), so the roll-based extraction is
        # layout-oblivious
        out = _hsl_interleaved(out, box_ref[i, 7], box_ref[i, 8],
                               box_ref[i, 9])

    # per-lane normalization constants (lane % 3 -> channel)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) % 3
    mean_v = jnp.where(lane_c == 0, mean[0],
                       jnp.where(lane_c == 1, mean[1], mean[2]))
    istd_v = jnp.where(lane_c == 0, inv_std[0],
                       jnp.where(lane_c == 1, inv_std[1], inv_std[2]))
    x = out - mean_v
    if contrast:
        # ImageRecordIter max_random_contrast: per-image alpha on the
        # mean-subtracted pixel (finish_normalize op order)
        x = x * box_ref[i, 10]
    if illum:
        x = x + box_ref[i, 11]
    out_ref[0] = (x * istd_v).astype(out_dtype)


def fused_crop_mirror_normalize(
        canvas_u8: jnp.ndarray, boxes, flip: Optional[jnp.ndarray],
        out_hw: Tuple[int, int], mean_rgb, std_rgb,
        dtype=jnp.bfloat16, interpret: bool = False,
        valid_hw=None, photometric: Optional[dict] = None,
        s2d: bool = False) -> jnp.ndarray:
    """(N,Hc,Wc,3) uint8 + per-image boxes -> (N,oh,ow,3) normalized dtype.

    ``valid_hw`` = per-example (eff_h, eff_w) of a letterboxed canvas
    (sample coordinates clamp there instead of the canvas edge).

    ``photometric`` (round 4) fuses the photometric jitters into the
    kernel — keys (all optional, (N,) f32 arrays): ``dh``/``ds``/``dl``
    (additive HSL deltas, OpenCV HLS units), ``alpha`` (contrast),
    ``beta`` (illumination). This deletes the f32 HBM round-trip the
    split path paid (kernel f32 out -> XLA HSL -> normalize re-read —
    a measured 77 MB copy + 77 MB read at bs128, tools/aug_fusion_probe).

    ``s2d`` (round 4) emits the output in space-to-depth block layout
    (N, oh/2, ow/2, 12), channel order (py, px, c) — bitwise the standard
    output regrouped — for a pre-blocked ``_StemConvS2D`` consumer (zero
    regroup copies between augmenter and stem).
    """
    n, sh, sw, _ = canvas_u8.shape
    oh, ow = out_hw
    y0, x0, ch, cw = boxes
    if flip is None:
        flip = jnp.zeros((n,), jnp.float32)
    if valid_hw is None:
        vh = jnp.full((n,), float(sh), jnp.float32)
        vw = jnp.full((n,), float(sw), jnp.float32)
    else:
        vh = valid_hw[0].astype(jnp.float32)
        vw = valid_hw[1].astype(jnp.float32)
    ph = photometric or {}
    zeros = jnp.zeros((n,), jnp.float32)
    hsl = "dh" in ph
    box_rows = jnp.stack(
        [y0, x0, ch, cw, flip.astype(jnp.float32), vh, vw,
         ph.get("dh", zeros), ph.get("ds", zeros), ph.get("dl", zeros),
         ph.get("alpha", zeros), ph.get("beta", zeros)], axis=1)  # (N, 12)

    img2d = canvas_u8.reshape(n, sh, sw * 3)
    mean = tuple(float(m) for m in mean_rgb)
    inv_std = tuple(1.0 / float(s) for s in std_rgb)

    kernel = partial(_aug_kernel, src_hw=(sh, sw), out_hw=(oh, ow),
                     mean=mean, inv_std=inv_std, out_dtype=dtype,
                     hsl=hsl, contrast="alpha" in ph, illum="beta" in ph,
                     s2d=s2d)
    if s2d:
        if oh % 2 or ow % 2:
            raise ValueError(f"s2d augmentation needs even output, "
                             f"got {out_hw}")
        out_rows, out_lanes = oh // 2, (ow // 2) * 12
    else:
        out_rows, out_lanes = oh, ow * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, sh, sw * 3), lambda i, box: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, out_rows, out_lanes),
                               lambda i, box: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_rows, out_lanes), dtype),
        interpret=interpret,
    )(box_rows, img2d)
    if s2d:
        return out.reshape(n, oh // 2, ow // 2, 12)
    return out.reshape(n, oh, ow, 3)


def sample_photometric(rng, r_hsl, cfg: DataConfig, n: int) -> dict:
    """Per-image photometric jitter parameters for the fused kernel.

    Bit-matches the XLA path's RNG streams: ``dh/ds/dl`` reproduce
    ops/augment._rgb_to_hsl_adjust's draws from ``r_hsl`` (3-way split,
    (n,1,1) uniforms), ``alpha/beta`` reproduce finish_normalize's
    (fold_in(rng, 0xC1), (n,1,1,1) uniforms). The kernel applies them in
    the same op order, so the fused path stays bit-comparable with the
    split XLA lowering.
    """
    ph = {}
    if cfg.random_h or cfg.random_s or cfg.random_l:
        rh, rs, rl = jax.random.split(r_hsl, 3)
        ph["dh"] = jax.random.uniform(
            rh, (n, 1, 1), minval=-cfg.random_h,
            maxval=cfg.random_h).reshape(n)
        ph["ds"] = jax.random.uniform(
            rs, (n, 1, 1), minval=-cfg.random_s,
            maxval=cfg.random_s).reshape(n)
        ph["dl"] = jax.random.uniform(
            rl, (n, 1, 1), minval=-cfg.random_l,
            maxval=cfg.random_l).reshape(n)
    c = cfg.max_random_contrast
    il = cfg.max_random_illumination
    if c > 0 or il > 0:
        r_con, r_ill = jax.random.split(jax.random.fold_in(rng, 0xC1))
        if c > 0:
            ph["alpha"] = jax.random.uniform(
                r_con, (n, 1, 1, 1), minval=1.0 - c,
                maxval=1.0 + c).reshape(n)
        if il > 0:
            ph["beta"] = jax.random.uniform(
                r_ill, (n, 1, 1, 1), minval=-il, maxval=il).reshape(n)
    return ph


def augment_imagenet_pallas(canvas_u8: jnp.ndarray, rng, cfg: DataConfig,
                            out_hw: Tuple[int, int] = (224, 224),
                            dtype=jnp.bfloat16,
                            interpret: bool = False,
                            dims: Optional[jnp.ndarray] = None,
                            split_photometric: bool = False,
                            s2d: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.augment.augment_imagenet (same RNG
    stream, same semantics, same box sampler) with the fused Pallas kernel.

    GSPMD caveat: Mosaic kernels cannot be automatically partitioned, so
    this path must NOT be placed under a >1-device ``jit`` mesh (the AOT
    pod audit reproduces the compile error); it works single-device and
    inside ``shard_map`` bodies. train/solver.py's ``auto`` selection and
    bench.py both route multi-device GSPMD to the bit-identical XLA path.

    Photometric jitters (HSL / contrast / illumination) run INSIDE the
    kernel by default (round 4): the per-image deltas are sampled outside
    with the XLA path's exact RNG streams and applied in its exact op
    order, deleting the f32 HBM round-trip the split formulation paid
    (``split_photometric=True`` restores it — the measured-negative
    comparison path). ``s2d=True`` emits space-to-depth block layout for
    a pre-blocked stem (see fused_crop_mirror_normalize).
    """
    if cfg.max_rotate_angle > 0 or cfg.max_shear_ratio > 0:
        # the rotation/shear warp variant only exists on the XLA path
        from resnet_tpu.ops.augment import augment_imagenet
        return augment_imagenet(canvas_u8, rng, cfg, out_hw, dtype,
                                dims=dims, s2d=s2d)

    n, hc, wc, _ = canvas_u8.shape
    r_box, r_mir, r_hsl = jax.random.split(rng, 3)
    boxes = sample_boxes_canvas(r_box, cfg, n, hc, wc, out_hw, dims)
    flip = (jax.random.bernoulli(r_mir, 0.5, (n,))
            if cfg.rand_mirror else None)
    valid = (dims[:, 2], dims[:, 3]) if dims is not None else None

    photometric = (cfg.random_h or cfg.random_s or cfg.random_l
                   or cfg.max_random_contrast > 0
                   or cfg.max_random_illumination > 0)
    if photometric and split_photometric:
        # split formulation (rounds 1-3): crop with identity
        # normalization (f32), then the XLA photometric epilogue — pays
        # the f32 intermediate round-trip; kept for A/B measurement.
        from resnet_tpu.ops.augment import _rgb_to_hsl_adjust, \
            finish_normalize
        x = fused_crop_mirror_normalize(
            canvas_u8, boxes, flip, out_hw, (0.0, 0.0, 0.0),
            (1.0, 1.0, 1.0), jnp.float32, interpret, valid_hw=valid,
            s2d=s2d)
        if cfg.random_h or cfg.random_s or cfg.random_l:
            shape = x.shape
            if s2d:
                x = x.reshape(shape[:-1] + (4, 3))
            x = _rgb_to_hsl_adjust(x, r_hsl, cfg.random_h, cfg.random_s,
                                   cfg.random_l)
            x = x.reshape(shape)
        return finish_normalize(x, rng, cfg, dtype,
                                channel_tile=4 if s2d else 1)

    ph = sample_photometric(rng, r_hsl, cfg, n) if photometric else None
    return fused_crop_mirror_normalize(
        canvas_u8, boxes, flip, out_hw, cfg.mean_rgb, cfg.std_rgb, dtype,
        interpret, valid_hw=valid, photometric=ph, s2d=s2d)
