"""Chain execution of v1 bottleneck units (--unit-chain).

MEASURED OUTCOME (round 2, PERF_NOTES.md): both chain backends LOSE to
XLA's default schedule (cost model: xla-chain 143.8 GB, pallas-chain
101.8 GB vs baseline 80.5 GB) — kept as a tested execution-path switch
documenting the negative result.

Rebuilds the hot path of the reference's bottleneck residual unit
(ref:symbol/resnet.py residual_unit, bottle_neck=True, v1) with a dataflow
chosen for the TPU's HBM roof rather than translated op-by-op: the round-1
trace (PERF_NOTES.md) showed ~32 ms/step of `convert_reduce_fusion` — XLA
re-reading every conv output for the BN batch-stats reduce (fwd) and again
for dgamma/dbeta (bwd). In the chain, each 1x1 conv is a single MXU pass
(ops/fused_unit.py) that

  - normalizes its INPUT in the prologue, consuming the previous conv's
    RAW output plus that op's epilogue statistics (so no activation is
    ever re-read for normalization), and
  - emits its OUTPUT's (sum, sum-of-squares) in the epilogue (so no
    activation is ever re-read for statistics),

and the backward is one Pallas kernel per op producing dx/dW/dgamma/dbeta
in a single pass. The 3x3 conv stays on XLA's conv path (its input
normalize+ReLU fuses into the conv; only its own output stats remain a
reduce sweep — 1 of the 6 per-unit sweeps the standard path pays).

The param/variable tree is IDENTICAL to the standard modules
(`convN/kernel`, `bnN/{scale,bias}`, batch_stats `bnN/{mean,var}`), so
checkpoints interchange and `unit_chain` is purely an execution-path
switch; eval mode always takes the standard XLA path (running-average
normalize fuses into consumers — nothing to win).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from resnet_tpu.models.fused import _ConvKernel
from resnet_tpu.ops.fused_unit import matmul_stats, norm_relu_matmul_stats


class _BNParams(nn.Module):
    """nn.BatchNorm-shaped param/variable shell that does NOT normalize.

    Returns (scale, bias, mean, var) for a consumer op to fold into its
    prologue/epilogue, and maintains the running-stat EMA with the
    flax/MXNet momentum convention (ra = m*ra + (1-m)*batch)."""

    momentum: float

    @nn.compact
    def __call__(self, feat, batch_mean, batch_var,
                 use_running_average: bool):
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (feat,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (feat,),
                               jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = batch_mean, batch_var
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        return scale, bias, mean, var


def _stats_from_sums(s, ss, count):
    mean = s / count
    var = ss / count - mean * mean
    return mean, var


def chain_unit_v1(x, *, filters: int, mid: int, strides, dim_match: bool,
                  conv_init, bn_mom: float, bn_eps: float, dtype,
                  backend: str = "pallas", interpret: bool = False):
    """One v1 bottleneck unit, chain dataflow (train mode only).

    Per-unit HBM sweeps: standard path = 3 conv outputs re-read for stats
    (fwd) + 3 for dgamma/dbeta (bwd) (+2 for a projection shortcut); chain
    path = 1 (the 3x3's fwd stats) — everything else rides MXU epilogues.
    """
    n, h, w, cin = x.shape

    def conv1x1_stats(inp2d, feat, name):
        kernel = _ConvKernel(features=feat, name=name)(inp2d.shape[-1])
        k2d = kernel.reshape(inp2d.shape[-1], feat).astype(dtype)
        y, s, ss = matmul_stats(inp2d, k2d, backend, interpret)
        return y, *_stats_from_sums(s, ss, inp2d.shape[0])

    bnp = lambda name: _BNParams(momentum=bn_mom, name=name)
    x2d = x.reshape(n * h * w, cin).astype(dtype)

    # conv1 + bn1: stats ride the conv epilogue
    y1, m1, v1 = conv1x1_stats(x2d, mid, "conv1")
    g1, b1, m1, v1 = bnp("bn1")(mid, m1, v1, False)
    # normalize+ReLU of y1 fuses into conv2's input (XLA elementwise→conv)
    a1 = g1 * jax.lax.rsqrt(v1 + bn_eps)
    x2 = nn.relu(y1.astype(jnp.float32) * a1 + (b1 - m1 * a1))
    x2 = x2.astype(dtype).reshape(n, h, w, mid)

    # conv2: 3x3 (stride lives here — see models/resnet.py design note),
    # XLA conv; its output stats are the one remaining reduce sweep
    y2 = nn.Conv(mid, (3, 3), strides, padding=((1, 1), (1, 1)),
                 use_bias=False, kernel_init=conv_init, dtype=dtype,
                 name="conv2")(x2)
    n2, h2, w2, _ = y2.shape
    count2 = n2 * h2 * w2
    y2d = y2.reshape(count2, mid)
    y2f = y2d.astype(jnp.float32)
    m2, v2 = _stats_from_sums(jnp.sum(y2f, axis=0),
                              jnp.sum(y2f * y2f, axis=0), count2)
    g2, b2, m2, v2 = bnp("bn2")(mid, m2, v2, False)

    # conv3 consumes RAW y2 + bn2's stats (prologue normalize+ReLU);
    # bn3's stats ride its epilogue
    k3 = _ConvKernel(features=filters, name="conv3")(mid)
    k3 = k3.reshape(mid, filters).astype(dtype)
    y3, s3, ss3 = norm_relu_matmul_stats(
        y2d, k3, m2, v2, g2, b2, bn_eps, True, backend, interpret)
    m3, v3 = _stats_from_sums(s3, ss3, count2)
    g3, b3, m3, v3 = bnp("bn3")(filters, m3, v3, False)

    # shortcut: identity (dim_match) or projection conv+BN with epilogue
    # stats; either way the final normalize+add+ReLU is ONE elementwise
    # fusion over (y3, shortcut)
    if dim_match:
        assert strides == (1, 1) and cin == filters
        sc = x2d.astype(jnp.float32)
    else:
        xs = x[:, ::strides[0], ::strides[1], :]
        xs2d = xs.reshape(count2, cin).astype(dtype)
        ysc, msc, vsc = conv1x1_stats(xs2d, filters, "sc")
        gsc, bsc, msc, vsc = bnp("sc_bn")(filters, msc, vsc, False)
        asc = gsc * jax.lax.rsqrt(vsc + bn_eps)
        sc = ysc.astype(jnp.float32) * asc + (bsc - msc * asc)

    a3 = g3 * jax.lax.rsqrt(v3 + bn_eps)
    out = nn.relu(y3.astype(jnp.float32) * a3 + (b3 - m3 * a3) + sc)
    return out.astype(dtype).reshape(n2, h2, w2, filters)
