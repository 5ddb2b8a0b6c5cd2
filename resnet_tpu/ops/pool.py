"""Stem max-pool with a mask-based backward (execution knob).

Rebuilds the reference's 3x3/2 stem pooling op (ref:symbol/resnet.py
``Pooling(kernel=(3,3), stride=(2,2), pool_type='max')``;
mxnet:src/operator/nn/pooling — cuDNN picks ONE argmax per window in its
backward). XLA:TPU lowers the canonical max-pool gradient to
``select_and_scatter``, a window-serialized op measured at ~1.5 ms/step
on the R50 bs256 program (PERF_NOTES.md "Where the time goes") — one of
the last non-conv, non-reduce entries in the step trace.

``grad_mode="mask"`` swaps the backward for a parallel formulation: the
incoming cotangent of each pooling window is routed to the input
positions that EQUAL the window max, split evenly among ties
(``dy / tie_count`` — a valid subgradient; cuDNN/select_and_scatter
instead give the whole cotangent to the first argmax in scan order).
For windows with a unique maximum the two are bitwise identical, so on
continuous activations the semantics difference has measure zero; after
a ReLU, all-negative windows tie at 0.0 and the mask backward splits
the cotangent where the reference concentrates it (oracle + tie tests:
tests/test_pool.py). The formulation is 9 strided slices aligned to the
output grid, an equality mask, and 9 interior-padded adds — all
elementwise/pad ops XLA fuses, no serialized scatter.

Only the (3,3)/(2,2)/pad-1 geometry the model family uses is supported.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_NEG = float("-inf")


def _pool_fwd(x):
    return lax.reduce_window(
        x, jnp.asarray(_NEG, x.dtype), lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


def _patches(xp, h_out, w_out):
    """The 9 views of padded input aligned to the output grid."""
    n, _, _, c = xp.shape
    for di in range(3):
        for dj in range(3):
            yield di, dj, lax.slice(
                xp, (0, di, dj, 0),
                (n, di + 2 * h_out - 1, dj + 2 * w_out - 1, c),
                (1, 2, 2, 1))


@jax.custom_vjp
def max_pool_mask(x):
    """3x3 stride-2 pad-1 max pool; backward = even split among ties."""
    return _pool_fwd(x)


def _fwd(x):
    y = _pool_fwd(x)
    return y, (x, y)


def _bwd(res, dy):
    x, y = res
    n, h, w, c = x.shape
    h_out, w_out = y.shape[1], y.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=_NEG)
    ties = jnp.zeros(y.shape, jnp.float32)
    for _, _, patch in _patches(xp, h_out, w_out):
        ties = ties + (patch == y).astype(jnp.float32)
    share = (dy.astype(jnp.float32) / ties).astype(dy.dtype)
    dxp = jnp.zeros(xp.shape, dy.dtype)
    for di, dj, patch in _patches(xp, h_out, w_out):
        contrib = jnp.where(patch == y, share, jnp.zeros_like(share))
        # scatter the output-grid contribution back onto the padded input
        # grid: offset (di, dj), interior padding 1 (= stride 2)
        dxp = dxp + lax.pad(
            contrib, jnp.asarray(0, dy.dtype),
            ((0, 0, 0),
             (di, xp.shape[1] - di - (2 * h_out - 1), 1),
             (dj, xp.shape[2] - dj - (2 * w_out - 1), 1),
             (0, 0, 0)))
    return (dxp[:, 1:h + 1, 1:w + 1, :],)


max_pool_mask.defvjp(_fwd, _bwd)


def stem_max_pool(x, grad_mode: str = "sas"):
    """The family's stem pool. ``sas`` = canonical select_and_scatter
    backward (reference-exact argmax routing); ``mask`` = parallel
    tie-splitting backward (see module docstring)."""
    if grad_mode == "mask":
        return max_pool_mask(x)
    if grad_mode != "sas":
        raise ValueError(f"unknown pool grad_mode: {grad_mode!r}")
    import flax.linen as nn
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))
