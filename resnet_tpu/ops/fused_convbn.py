"""Pallas fused 1x1-conv + BatchNorm-statistics kernel.

The profiling in PERF_NOTES.md shows BN statistic/gradient reductions cost
~32 ms of the 104 ms ResNet-50 train step: XLA computes each BN's batch
mean/var as a SEPARATE bandwidth-bound sweep over the conv output it just
wrote. A 1x1 conv in NHWC is exactly a matmul (M=N*H*W rows, K=Cin,
N=Cout), so this kernel computes the conv on the MXU and accumulates the
per-channel sum and sum-of-squares in the SAME pass, while the output tile
is still in VMEM — the stats sweep disappears. This is the TPU-native
equivalent of cuDNN's fused BN-conv epilogues the reference leans on
(mxnet cudnn_batch_norm / SURVEY.md §2b 'optional Pallas fused conv-BN').

The kernel emits per-M-tile partial sums; the tiny (grid_m, N) partials are
reduced by XLA afterwards. Strided 1x1 convs (the bottleneck projection
shortcut) reduce to the same matmul after a free spatial subsample.

Backward is a custom VJP in plain XLA (dx = dy_eff @ w^T, dw = x^T @ dy_eff
with the mean/var cotangents folded into dy_eff) — XLA schedules those two
matmuls as well as it schedules conv dgrad/wgrad.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, y_ref, sum_ref, sumsq_ref, *, out_dtype,
            acc_dtype):
    y = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=acc_dtype)
    y_ref[...] = y.astype(out_dtype)
    # stats tiles are (1, 8, bn) — Mosaic needs the sublane dim >= 8; the
    # real partial lives in row 0, rows 1..7 are zero and vanish in the
    # outer reduction.
    bn = y.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, bn), 0)
    s = jnp.sum(y, axis=0, keepdims=True)
    ss = jnp.sum(y * y, axis=0, keepdims=True)
    sum_ref[0] = jnp.where(rows == 0, s, 0.0).astype(acc_dtype)
    sumsq_ref[0] = jnp.where(rows == 0, ss, 0.0).astype(acc_dtype)


def _pick_block(size: int, target: int) -> int:
    b = min(size, target)
    while size % b:
        b //= 2
    return max(b, 1)


def matmul_with_stats(x2d: jnp.ndarray, w2d: jnp.ndarray,
                      bm: int = 512, bn: int = 512,
                      interpret: bool = False):
    """y = x2d @ w2d plus per-column (sum, sumsq) of y, in one pass.

    x2d: (M, K) compute dtype; w2d: (K, N). Returns (y (M,N) x-dtype,
    sum (N,) f32, sumsq (N,) f32).
    """
    m, k = x2d.shape
    k2, n = w2d.shape
    assert k == k2
    bm = _pick_block(m, bm)
    bn = _pick_block(n, bn)
    gm, gn = m // bm, n // bn
    out_dtype = x2d.dtype
    # f32 accumulation on the MXU; f64 only for CPU-interpret parity tests
    acc_dtype = jnp.float64 if x2d.dtype == jnp.float64 else jnp.float32

    y, psum, psumsq = pl.pallas_call(
        partial(_kernel, out_dtype=out_dtype, acc_dtype=acc_dtype),
        grid=(gm, gn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, n), out_dtype),
            jax.ShapeDtypeStruct((gm, 8, n), acc_dtype),
            jax.ShapeDtypeStruct((gm, 8, n), acc_dtype),
        ),
        interpret=interpret,
    )(x2d, w2d)
    return y, jnp.sum(psum, axis=(0, 1)), jnp.sum(psumsq, axis=(0, 1))


# ---------------------------------------------------------------------------
# custom-VJP op: (x2d, w2d) -> (y, mean, var)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1x1_bn_stats(x2d, w2d, interpret=False):
    """Fused matmul + batch statistics (mean, biased var over rows)."""
    y, s, ss = matmul_with_stats(x2d, w2d, interpret=interpret)
    m = x2d.shape[0]
    mean = s / m
    var = ss / m - mean * mean       # fast-variance, matches flax
    return y, mean, var


def _fwd(x2d, w2d, interpret=False):
    y, s, ss = matmul_with_stats(x2d, w2d, interpret=interpret)
    m = x2d.shape[0]
    mean = s / m
    var = ss / m - mean * mean
    return (y, mean, var), (x2d, w2d, y, mean)


def _bwd(interpret, res, cots):
    x2d, w2d, y, mean = res
    gy, gmean, gvar = cots
    m = x2d.shape[0]
    # mean = sum(y)/m ; var = sum(y^2)/m - mean^2
    # d/dy: gy + gmean/m + gvar*(2y/m - 2*mean/m)
    acc = mean.dtype  # f32 (f64 under the CPU-interpret parity tests)
    gy_eff = (gy.astype(acc)
              + (gmean / m)
              + (2.0 / m) * gvar * (y.astype(acc) - mean))
    gy_eff = gy_eff.astype(x2d.dtype)
    dx = gy_eff @ w2d.T
    dw = x2d.T @ gy_eff
    return dx.astype(x2d.dtype), dw.astype(w2d.dtype)


conv1x1_bn_stats.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Reference (unfused) implementation for tests
# ---------------------------------------------------------------------------

def reference_conv1x1_bn_stats(x2d, w2d):
    acc = jnp.promote_types(x2d.dtype, jnp.float32)
    y = (x2d.astype(acc) @ w2d.astype(acc))
    mean = jnp.mean(y, axis=0)
    var = jnp.mean(y * y, axis=0) - mean * mean
    return y.astype(x2d.dtype), mean, var
