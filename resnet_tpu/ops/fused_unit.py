"""Chained Pallas ops for fused bottleneck units.

MEASURED OUTCOME (round 2, PERF_NOTES.md): the chain LOSES on the clock
and in the cost model (backward residual traffic); retained, tested,
off by default, as the documented negative result.

The round-1 profiling (PERF_NOTES.md) showed the ResNet-50 train step is
HBM-bound with ~32 ms of BN statistic/gradient reductions: XLA reads every
conv output once more for the batch-stats reduce (fwd) and again for
dgamma/dbeta (bwd). Swapping a single conv for a Pallas kernel LOSES
(it breaks XLA's producer/consumer elementwise fusion — the round-1
negative result); the winning structure is a CHAIN where every kernel owns
its input normalization (prologue) and its output statistics (epilogue):

  op A  matmul_stats:            y = x @ W            (+ Σy, Σy² epilogue)
  op B  norm_relu_matmul_stats:  y = relu(bn(x)) @ W  (+ Σy, Σy² epilogue)

so each activation is written once and read once — the stats ride along
in-register. 1x1 convs in NHWC are exactly these matmuls (reference:
mxnet cudnn fused conv+BN epilogues — SURVEY.md §2b conv row, §7 hard
part 1).

Backward: ONE Pallas kernel per op computes dx, dW, dgamma, dbeta (and the
stats cotangents) in a single pass over (gy, y, x) — the per-channel
reductions ride in the epilogue of the dx/dW matmuls, removing the
separate dgamma/dbeta sweeps. gy_eff (= gy + gΣ + 2y·gΣΣ, the stats
cotangent fold-in) is computed in-register, never materialized.

Every op has an XLA reference implementation (`reference_*`) used both as
the numeric oracle (f64 + interpret-mode tests) and as a fallback backend
(``backend='xla'``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(size: int, target: int) -> int:
    b = min(size, target)
    while size % b:
        b //= 2
    return max(b, 1)


def _acc_dtype(x):
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def _bwd_fits_vmem(k: int, n: int, itemsize: int) -> bool:
    """The one-pass backward keeps a (k, n) f32 dW block and a (n, k) W^T
    block resident for the whole grid; past ~14MB (of the 16MB scoped-vmem
    budget) even bm=128 streams don't fit. In R50 only the stage-4
    projection shortcut (k=1024, n=2048) trips this — it takes the XLA
    backward instead (its extra g-materialization is ~0.1 ms at that
    op's small M)."""
    fixed = 4 * k * n + k * n * itemsize
    streams = 2 * 128 * (2 * n + 2 * k) * itemsize
    return fixed + streams <= 14_000_000


# ---------------------------------------------------------------------------
# Forward kernel: [normalize -> relu ->] matmul -> (y, sum, sumsq)
# ---------------------------------------------------------------------------

def _fwd_kernel(c_ref, x_ref, w_ref, y_ref, sum_ref, sumsq_ref, *,
                out_dtype, acc_dtype, normalize, relu):
    x = x_ref[...]
    if normalize:
        # c_ref rows: [a, b] with xh = x*a + b (affine-folded BN)
        xh = x.astype(acc_dtype) * c_ref[0, :] + c_ref[1, :]
        if relu:
            xh = jnp.maximum(xh, 0.0)
        x = xh.astype(x_ref.dtype)
    y = jnp.dot(x, w_ref[...], preferred_element_type=acc_dtype)
    y_ref[...] = y.astype(out_dtype)
    bn = y.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, bn), 0)
    s = jnp.sum(y, axis=0, keepdims=True)
    ss = jnp.sum(y * y, axis=0, keepdims=True)
    sum_ref[0] = jnp.where(rows == 0, s, 0.0).astype(acc_dtype)
    sumsq_ref[0] = jnp.where(rows == 0, ss, 0.0).astype(acc_dtype)


def _fwd_call(x, w, consts, *, relu, bm=512, bn=1024, interpret=False):
    m, k = x.shape
    _, n = w.shape
    bm = _pick_block(m, bm)
    bn = _pick_block(n, bn)
    gm, gn = m // bm, n // bn
    acc = _acc_dtype(x)
    normalize = consts is not None
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x, w]
    if normalize:
        in_specs.insert(0, pl.BlockSpec((2, k), lambda i, j: (0, 0),
                                        memory_space=pltpu.VMEM))
        args.insert(0, consts)
        kernel = partial(_fwd_kernel, out_dtype=x.dtype, acc_dtype=acc,
                         normalize=True, relu=relu)
    else:
        kernel = partial(_fwd_kernel, None, out_dtype=x.dtype,
                         acc_dtype=acc, normalize=False, relu=relu)
    y, psum, psumsq = pl.pallas_call(
        kernel,
        grid=(gm, gn),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, n), x.dtype),
            jax.ShapeDtypeStruct((gm, 8, n), acc),
            jax.ShapeDtypeStruct((gm, 8, n), acc),
        ),
        interpret=interpret,
    )(*args)
    return y, jnp.sum(psum, axis=(0, 1)), jnp.sum(psumsq, axis=(0, 1))


# ---------------------------------------------------------------------------
# Backward kernel: one pass over (gy, y, x) -> dx, dW, dgamma, dbeta
# ---------------------------------------------------------------------------

def _bwd_kernel(c_ref, gy_ref, y_ref, x_ref, wt_ref, dx_ref,
                dw_ref, dg_ref, db_ref, *,
                acc_dtype, normalize, relu, out_dtype):
    i = pl.program_id(0)
    gm = pl.num_programs(0)
    nb = y_ref.shape[1]
    # g = gy + gsum + 2*y*gsumsq  (stats cotangents folded, in-register);
    # const rows are max(K, N)-wide — slice to the live extent
    gs = c_ref[2, :nb]
    gss = c_ref[3, :nb]
    y = y_ref[...].astype(acc_dtype)
    g = gy_ref[...].astype(acc_dtype) + gs + 2.0 * y * gss     # (bm, N)
    gb16 = g.astype(out_dtype)

    x = x_ref[...].astype(acc_dtype)                            # (bm, K)
    if normalize:
        a = c_ref[0, :x_ref.shape[1]]
        b = c_ref[1, :x_ref.shape[1]]
        xh = x * a + b
        act = jnp.maximum(xh, 0.0) if relu else xh
    else:
        act = x

    # dW accumulation across the M grid (sequential on TPU): the output
    # block's index map is constant, so it stays VMEM-resident across the
    # whole grid — accumulate into it directly (a separate scratch
    # doubled VMEM use and OOMed the stage-4 shapes)
    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
    dw_ref[...] += jax.lax.dot_general(
        act.astype(out_dtype), gb16,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)

    # dx via g @ W^T, with relu mask + alpha fold
    gact = jnp.dot(gb16, wt_ref[...], preferred_element_type=acc_dtype)
    if normalize:
        gxh = jnp.where(xh > 0.0, gact, 0.0) if relu else gact
        dx_ref[...] = (gxh * a).astype(out_dtype)
        # dgamma = sum(gxh * xhat); xhat = (xh - beta_hat) ... use
        # xhat = x*inv - mean*inv, but (a, b) already fold gamma: recover
        # xhat from the extra const rows [inv, -mean*inv]
        inv = c_ref[4, :x_ref.shape[1]]
        minv = c_ref[5, :x_ref.shape[1]]
        xhat = x * inv + minv
        dg = jnp.sum(gxh * xhat, axis=0, keepdims=True)
        db = jnp.sum(gxh, axis=0, keepdims=True)
        kb = x_ref.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, kb), 0)
        dg_ref[0] = jnp.where(rows == 0, dg, 0.0).astype(acc_dtype)
        db_ref[0] = jnp.where(rows == 0, db, 0.0).astype(acc_dtype)
    else:
        dx_ref[...] = gact.astype(out_dtype)
        kb = x_ref.shape[1]
        dg_ref[0] = jnp.zeros((8, kb), acc_dtype)
        db_ref[0] = jnp.zeros((8, kb), acc_dtype)


def _bwd_call(gy, gs, gss, y, x, w, consts4, *, relu, normalize,
              bm=256, interpret=False):
    """One-pass backward. consts4: (6, K') f32 rows [a, b, gs|pad, gss|pad,
    inv, -mean*inv] where rows 2/3 are actually N-sized (see packing below).
    Returns dx (M,K), dw (K,N) f32, dgamma (K,), dbeta (K,)."""
    m, k = x.shape
    _, n = w.shape
    # keep the resident set under the ~16MB scoped-vmem budget: the
    # (k, n) f32 dW block is fixed, the (bm, {n,k}) streams shrink with bm
    itemsize = jnp.dtype(x.dtype).itemsize
    while bm > 128 and (4 * k * n + n * k * itemsize
                        + 2 * bm * (2 * n + 2 * k) * itemsize) > 12_000_000:
        bm //= 2
    bm = _pick_block(m, bm)
    gm = m // bm
    acc = _acc_dtype(x)
    kn = max(k, n)
    # pack per-channel consts into one (6, max(K,N)) block in acc dtype
    def pad(v, size):
        return jnp.pad(v.astype(acc), (0, size - v.shape[0]))
    a, b, inv, minv = consts4
    consts = jnp.stack([pad(a, kn), pad(b, kn), pad(gs, kn), pad(gss, kn),
                        pad(inv, kn), pad(minv, kn)], axis=0)
    wt = w.T  # (N, K); XLA materializes once per step — small

    dx, dw, pdg, pdb = pl.pallas_call(
        partial(_bwd_kernel, acc_dtype=acc, normalize=normalize, relu=relu,
                out_dtype=x.dtype),
        grid=(gm,),
        in_specs=[
            pl.BlockSpec((6, kn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), x.dtype),
            jax.ShapeDtypeStruct((k, n), acc),
            jax.ShapeDtypeStruct((gm, 8, k), acc),
            jax.ShapeDtypeStruct((gm, 8, k), acc),
        ),
        interpret=interpret,
    )(consts, gy, y, x, wt)
    return dx, dw, jnp.sum(pdg, axis=(0, 1)), jnp.sum(pdb, axis=(0, 1))


# ---------------------------------------------------------------------------
# op A: matmul with stats epilogue (conv1 / shortcut of v1 units)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def matmul_stats(x, w, backend: str = "pallas", interpret: bool = False):
    """y = x @ w; also per-column sum and sum-of-squares of y."""
    return _matmul_stats_fwd_impl(x, w, backend, interpret)


def _matmul_stats_fwd_impl(x, w, backend, interpret):
    if backend == "pallas":
        return _fwd_call(x, w, None, relu=False, interpret=interpret)
    acc = _acc_dtype(x)
    y = jnp.dot(x, w, preferred_element_type=acc).astype(x.dtype)
    yf = y.astype(acc)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def _matmul_stats_fwd(x, w, backend, interpret):
    out = _matmul_stats_fwd_impl(x, w, backend, interpret)
    return out, (x, w, out[0])


def _matmul_stats_bwd(backend, interpret, res, cots):
    x, w, y = res
    gy, gs, gss = cots
    acc = _acc_dtype(x)
    if backend == "pallas" and _bwd_fits_vmem(
            x.shape[1], w.shape[1], jnp.dtype(x.dtype).itemsize):
        k = x.shape[1]
        zeros = jnp.zeros((k,), acc)
        dx, dw, _, _ = _bwd_call(
            gy, gs, gss, y, x, w, (zeros, zeros, zeros, zeros),
            relu=False, normalize=False, interpret=interpret)
        return dx, dw.astype(w.dtype)
    g = (gy.astype(acc) + gs + 2.0 * y.astype(acc) * gss).astype(x.dtype)
    dx = g @ w.T
    dw = x.T @ g
    return dx.astype(x.dtype), dw.astype(w.dtype)


matmul_stats.defvjp(_matmul_stats_fwd, _matmul_stats_bwd)


# ---------------------------------------------------------------------------
# op B: normalize -> relu -> matmul with stats epilogue (conv3 of v1 units)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def norm_relu_matmul_stats(x, w, mean, var, gamma, beta,
                           eps: float = 2e-5, relu: bool = True,
                           backend: str = "pallas",
                           interpret: bool = False):
    """y = relu((x - mean) * gamma/sqrt(var+eps) + beta) @ w, plus column
    stats of y — the chain link: consumes the PREVIOUS conv's raw output
    and statistics, emits this conv's raw output and statistics."""
    return _nrms_fwd_impl(x, w, mean, var, gamma, beta, eps, relu,
                          backend, interpret)


def _nrms_consts(mean, var, gamma, beta, eps, acc):
    inv = jax.lax.rsqrt(var.astype(acc) + eps)
    a = gamma.astype(acc) * inv
    b = beta.astype(acc) - mean.astype(acc) * a
    return a, b, inv


def _nrms_fwd_impl(x, w, mean, var, gamma, beta, eps, relu, backend,
                   interpret):
    acc = _acc_dtype(x)
    a, b, _ = _nrms_consts(mean, var, gamma, beta, eps, acc)
    if backend == "pallas":
        consts = jnp.stack([a, b], axis=0).astype(acc)
        return _fwd_call(x, w, consts, relu=relu, interpret=interpret)
    xh = x.astype(acc) * a + b
    if relu:
        xh = jnp.maximum(xh, 0.0)
    y = jnp.dot(xh.astype(x.dtype), w,
                preferred_element_type=acc).astype(x.dtype)
    yf = y.astype(acc)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def _nrms_fwd(x, w, mean, var, gamma, beta, eps, relu, backend, interpret):
    out = _nrms_fwd_impl(x, w, mean, var, gamma, beta, eps, relu, backend,
                         interpret)
    return out, (x, w, mean, var, gamma, beta, out[0])


def _nrms_bwd(eps, relu, backend, interpret, res, cots):
    x, w, mean, var, gamma, beta, y = res
    gy, gs, gss = cots
    acc = _acc_dtype(x)
    a, b, inv = _nrms_consts(mean, var, gamma, beta, eps, acc)
    if backend == "pallas" and _bwd_fits_vmem(
            x.shape[1], w.shape[1], jnp.dtype(x.dtype).itemsize):
        dx, dw, dgamma, dbeta = _bwd_call(
            gy, gs, gss, y, x, w,
            (a, b, inv, -mean.astype(acc) * inv),
            relu=relu, normalize=True, interpret=interpret)
    else:
        g = (gy.astype(acc) + gs + 2.0 * y.astype(acc) * gss)
        xh = x.astype(acc) * a + b
        gact = (g.astype(x.dtype) @ w.T).astype(acc)
        gxh = jnp.where(xh > 0.0, gact, 0.0) if relu else gact
        dx = (gxh * a).astype(x.dtype)
        act = jnp.maximum(xh, 0.0) if relu else xh
        dw = (act.astype(x.dtype).T @ g.astype(x.dtype)).astype(w.dtype)
        xhat = (x.astype(acc) - mean.astype(acc)) * inv
        dgamma = jnp.sum(gxh * xhat, axis=0)
        dbeta = jnp.sum(gxh, axis=0)
    # stats cotangents derive from dgamma/dbeta (see module docstring):
    #   dmean = -alpha * dbeta ;  dvar = -1/2 * alpha * inv * dgamma
    dmean = (-a * dbeta).astype(mean.dtype)
    dvar = (-0.5 * a * inv * dgamma).astype(var.dtype)
    return (dx, dw.astype(w.dtype), dmean, dvar,
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


norm_relu_matmul_stats.defvjp(_nrms_fwd, _nrms_bwd)


# ---------------------------------------------------------------------------
# XLA reference of the full op semantics (oracle for the VJP tests)
# ---------------------------------------------------------------------------

def reference_matmul_stats(x, w):
    acc = jnp.promote_types(x.dtype, jnp.float32)
    y = jnp.dot(x.astype(acc), w.astype(acc)).astype(x.dtype)
    yf = y.astype(acc)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def reference_norm_relu_matmul_stats(x, w, mean, var, gamma, beta,
                                     eps: float = 2e-5, relu: bool = True):
    acc = jnp.promote_types(x.dtype, jnp.float32)
    inv = jax.lax.rsqrt(var.astype(acc) + eps)
    xh = (x.astype(acc) - mean) * inv * gamma + beta
    if relu:
        xh = jnp.maximum(xh, 0.0)
    y = jnp.dot(xh.astype(x.dtype).astype(acc),
                w.astype(acc)).astype(x.dtype)
    yf = y.astype(acc)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)
