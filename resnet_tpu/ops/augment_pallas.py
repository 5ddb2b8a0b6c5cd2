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


def _aug_kernel(box_ref, img_ref, out_ref, *, src_hw, out_hw, mean, inv_std,
                out_dtype):
    # box_ref is a scalar-prefetch (N, 8) f32 ref in SMEM — indexed by the
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

    # vertical resample matrix Wy (oh, sh); Mosaic iota is integer-only
    i_y = jax.lax.broadcasted_iota(jnp.int32, (oh, sh), 0) \
        .astype(jnp.float32)
    j_y = jax.lax.broadcasted_iota(jnp.int32, (oh, sh), 1) \
        .astype(jnp.float32)
    src_y = jnp.clip(y0 + (i_y + 0.5) * (ch / oh) - 0.5, 0.0, vh - 1.0)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(src_y - j_y))       # (oh, sh)

    tmp = jnp.dot(wy, img, preferred_element_type=jnp.float32)  # (oh, sw*3)

    # horizontal Kronecker-expanded matrix Wx' (sw*3, ow*3)
    r = jax.lax.broadcasted_iota(jnp.int32, (sw * 3, ow * 3), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (sw * 3, ow * 3), 1)
    s = (r // 3).astype(jnp.float32)
    j = (q // 3).astype(jnp.float32)
    # mirror: output column j samples column (ow-1-j) when flip is set
    j_eff = jnp.where(flip > 0.5, (ow - 1.0) - j, j)
    src_x = jnp.clip(x0 + (j_eff + 0.5) * (cw / ow) - 0.5, 0.0, vw - 1.0)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(src_x - s))
    same_c = (r % 3) == (q % 3)
    wxe = jnp.where(same_c, wx, 0.0)                        # (sw*3, ow*3)

    out = jnp.dot(tmp, wxe, preferred_element_type=jnp.float32)  # (oh, ow*3)

    # per-lane normalization constants (lane % 3 -> channel)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (oh, ow * 3), 1) % 3
    mean_v = jnp.where(lane_c == 0, mean[0],
                       jnp.where(lane_c == 1, mean[1], mean[2]))
    istd_v = jnp.where(lane_c == 0, inv_std[0],
                       jnp.where(lane_c == 1, inv_std[1], inv_std[2]))
    out_ref[0] = ((out - mean_v) * istd_v).astype(out_dtype)


def fused_crop_mirror_normalize(
        canvas_u8: jnp.ndarray, boxes, flip: Optional[jnp.ndarray],
        out_hw: Tuple[int, int], mean_rgb, std_rgb,
        dtype=jnp.bfloat16, interpret: bool = False,
        valid_hw=None) -> jnp.ndarray:
    """(N,Hc,Wc,3) uint8 + per-image boxes -> (N,oh,ow,3) normalized dtype.

    ``valid_hw`` = per-example (eff_h, eff_w) of a letterboxed canvas
    (sample coordinates clamp there instead of the canvas edge)."""
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
    box_rows = jnp.stack(
        [y0, x0, ch, cw, flip.astype(jnp.float32), vh, vw,
         jnp.zeros((n,), jnp.float32)], axis=1)             # (N, 8)

    img2d = canvas_u8.reshape(n, sh, sw * 3)
    mean = tuple(float(m) for m in mean_rgb)
    inv_std = tuple(1.0 / float(s) for s in std_rgb)

    kernel = partial(_aug_kernel, src_hw=(sh, sw), out_hw=(oh, ow),
                     mean=mean, inv_std=inv_std, out_dtype=dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, sh, sw * 3), lambda i, box: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, oh, ow * 3), lambda i, box: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, oh, ow * 3), dtype),
        interpret=interpret,
    )(box_rows, img2d)
    return out.reshape(n, oh, ow, 3)


def augment_imagenet_pallas(canvas_u8: jnp.ndarray, rng, cfg: DataConfig,
                            out_hw: Tuple[int, int] = (224, 224),
                            dtype=jnp.bfloat16,
                            interpret: bool = False,
                            dims: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """Drop-in replacement for ops.augment.augment_imagenet (same RNG
    stream, same semantics, same box sampler) with the fused Pallas kernel.

    GSPMD caveat: Mosaic kernels cannot be automatically partitioned, so
    this path must NOT be placed under a >1-device ``jit`` mesh (the AOT
    pod audit reproduces the compile error); it works single-device and
    inside ``shard_map`` bodies. train/solver.py's ``auto`` selection and
    bench.py both route multi-device GSPMD to the bit-identical XLA path.

    HSL jitter, when enabled, is applied by the XLA path on the cropped
    output (it is elementwise and XLA fuses it into the following cast).
    """
    if cfg.max_rotate_angle > 0 or cfg.max_shear_ratio > 0:
        # the rotation/shear warp variant only exists on the XLA path
        from resnet_tpu.ops.augment import augment_imagenet
        return augment_imagenet(canvas_u8, rng, cfg, out_hw, dtype,
                                dims=dims)

    n, hc, wc, _ = canvas_u8.shape
    r_box, r_mir, r_hsl = jax.random.split(rng, 3)
    boxes = sample_boxes_canvas(r_box, cfg, n, hc, wc, out_hw, dims)
    flip = (jax.random.bernoulli(r_mir, 0.5, (n,))
            if cfg.rand_mirror else None)
    valid = (dims[:, 2], dims[:, 3]) if dims is not None else None

    photometric = (cfg.random_h or cfg.random_s or cfg.random_l
                   or cfg.max_random_contrast > 0
                   or cfg.max_random_illumination > 0)
    if photometric:
        # photometric jitter operates on un-normalized pixels: crop with
        # identity normalization, jitter, then the shared normalize
        # epilogue (same code as the XLA path -> bitwise parity).
        from resnet_tpu.ops.augment import _rgb_to_hsl_adjust, \
            finish_normalize
        x = fused_crop_mirror_normalize(
            canvas_u8, boxes, flip, out_hw, (0.0, 0.0, 0.0),
            (1.0, 1.0, 1.0), jnp.float32, interpret, valid_hw=valid)
        if cfg.random_h or cfg.random_s or cfg.random_l:
            x = _rgb_to_hsl_adjust(x, r_hsl, cfg.random_h, cfg.random_s,
                                   cfg.random_l)
        return finish_normalize(x, rng, cfg, dtype)

    return fused_crop_mirror_normalize(
        canvas_u8, boxes, flip, out_hw, cfg.mean_rgb, cfg.std_rgb, dtype,
        interpret, valid_hw=valid)
