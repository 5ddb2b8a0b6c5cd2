"""Chained Pallas kernel: normalize-input matmul with BN-stats epilogue.

MEASURED OUTCOME (round 2, PERF_NOTES.md): the chain dataflow LOSES —
XLA expressing the same chain matches the kernel forward, and the
chain's custom-VJP residual traffic costs more than XLA's fusion
pipeline in backward (101.8 GB vs 80.5 GB cost-model). Retained,
tested, off by default, as the documented negative result.

This is the building block PERF_NOTES.md identifies as the path past the
BN-reduction bottleneck: consume the PREVIOUS conv's raw output + its batch
statistics, apply BN+ReLU in-register, matmul on the MXU, and emit the raw
output + ITS statistics in the same pass:

    y_raw = relu((x_raw - mean) * rsqrt(var+eps) * gamma + beta) @ W
    (+ per-column sum / sum-of-squares of y_raw)

Chained across a bottleneck, every activation is written once and read once
— no separate normalize or stats sweeps. This module provides the kernel
and a correctness test surface; model integration (custom VJP chain) is
round-2 work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(c_ref, x_ref, w_ref, y_ref, sum_ref, sumsq_ref, *,
            out_dtype, acc_dtype, relu):
    # c_ref: (4, K) f32 rows = [mean, inv, gamma... pre-folded] — we fold
    # the affine into two vectors: xn = x*a + b with
    # a = gamma*rsqrt(var+eps), b = beta - mean*a.
    a = c_ref[0, :]
    b = c_ref[1, :]
    x = x_ref[...].astype(jnp.float32) * a + b
    if relu:
        x = jnp.maximum(x, 0.0)
    y = jnp.dot(x.astype(x_ref.dtype), w_ref[...],
                preferred_element_type=acc_dtype)
    y_ref[...] = y.astype(out_dtype)
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


def normalized_matmul_with_stats(x_raw, w, mean, var, gamma, beta,
                                 eps: float = 2e-5, relu: bool = True,
                                 bm: int = 512, bn: int = 512,
                                 interpret: bool = False):
    """y = relu(norm(x_raw)) @ w, plus column stats of y — one pass."""
    m, k = x_raw.shape
    _, n = w.shape
    bm = _pick_block(m, bm)
    bn = _pick_block(n, bn)
    gm, gn = m // bm, n // bn
    acc_dtype = jnp.float64 if x_raw.dtype == jnp.float64 else jnp.float32

    a = (gamma * jax.lax.rsqrt(var.astype(jnp.float32) + eps)).astype(
        jnp.float32)
    b = (beta - mean * a).astype(jnp.float32)
    zeros = jnp.zeros_like(a)
    consts = jnp.stack([a, b, zeros, zeros], axis=0)      # (4, K)

    y, psum, psumsq = pl.pallas_call(
        partial(_kernel, out_dtype=x_raw.dtype, acc_dtype=acc_dtype,
                relu=relu),
        grid=(gm, gn),
        in_specs=[
            pl.BlockSpec((4, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((m, n), x_raw.dtype),
            jax.ShapeDtypeStruct((gm, 8, n), acc_dtype),
            jax.ShapeDtypeStruct((gm, 8, n), acc_dtype),
        ),
        interpret=interpret,
    )(consts, x_raw, w)
    return y, jnp.sum(psum, axis=(0, 1)), jnp.sum(psumsq, axis=(0, 1))


def reference_chain(x_raw, w, mean, var, gamma, beta, eps: float = 2e-5,
                    relu: bool = True):
    """The XLA-expressed equivalent chain (also the numeric oracle)."""
    a = gamma * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    b = beta - mean * a
    h = x_raw.astype(jnp.float32) * a + b
    if relu:
        h = jnp.maximum(h, 0.0)
    y = jnp.dot(h.astype(x_raw.dtype), w,
                preferred_element_type=jnp.float32).astype(x_raw.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)
