"""Optimizers with exact MXNet update semantics, as optax transforms.

The reference trains with MXNet SGD-momentum (+ optional NAG), whose fused
kernel (mxnet src/operator/optimizer_op.cc ``sgd_mom_update``) is:

    mom    = momentum * mom - lr * (grad + wd * weight)
    weight = weight + mom

Note the learning rate lives INSIDE the momentum accumulator — at an lr-step
boundary the already-accumulated momentum keeps its magnitude and only new
contributions shrink. This differs transiently from textbook
``optax.sgd`` (which scales the whole trace by lr) and matters for exact
convergence parity, so we implement it directly. Weight decay is applied to
ALL parameters including BN gamma/beta and biases, matching MXNet's default.

On TPU this whole update fuses into the train step's XLA program — the
equivalent of the reference's fused CUDA kernel comes free from the compiler.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class MXNetSGDState(NamedTuple):
    count: jnp.ndarray           # int32 step counter (drives the schedule)
    momentum: optax.Updates


def radial_projection() -> optax.GradientTransformation:
    """Project conv-kernel gradients orthogonal to each output filter.

    Restores, in weight space, the invariance property batch-statistics
    BatchNorm enforces through its backward: when a conv's output channel c
    is normalized by statistics computed FROM that output, the loss is
    invariant to the scale of filter w_c, so the true gradient satisfies
    <g_c, w_c> = 0 — BN's backward projects the radial component out.
    Normalizing with stop-gradient statistics (``bn_ema``) drops that
    projection, and the unconstrained radial component feeds a norm-runaway
    loop (measured: the record-pipeline convergence bar explodes to CE~600,
    and the 8-step golden trajectory amplifies 1e-7 seeds to 1e-2 within 3
    steps). This transform reinstates the projection explicitly:

        g <- g - w * (<g, w> / <w, w>)      per output channel (HWIO: O)

    applied to every 4-D kernel (all convs in this family feed a BN; the
    2-D FC head and 1-D BN scale/bias pass through untouched). Cost is a
    few dot products over 25M weights — nanoseconds next to the 2.8B
    activation elements the frozen-stats mode saves per step. Weight decay
    (applied downstream inside mxnet_sgd) remains the only radial force,
    exactly as in batch-stats BN + wd training. During the bn_ema warmup
    phase (true batch-stats BN) the projection is a no-op up to float
    error, so one optimizer serves both programs of the Solver's switch.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("radial_projection requires params")

        def proj(g, p):
            if g.ndim != 4:
                return g
            axes = (0, 1, 2)
            num = jnp.sum(g * p, axes, keepdims=True)
            den = jnp.sum(p * p, axes, keepdims=True)
            return g - p * (num / jnp.maximum(den, 1e-12))

        return jax.tree.map(proj, grads, params), state

    return optax.GradientTransformation(init, update)


def mxnet_sgd(learning_rate: Union[float, Callable], momentum: float = 0.9,
              weight_decay: float = 1e-4,
              nesterov: bool = False) -> optax.GradientTransformation:
    """SGD with MXNet's lr-inside-momentum update rule (see module doc)."""

    def lr_at(count):
        return (learning_rate(count) if callable(learning_rate)
                else jnp.asarray(learning_rate, jnp.float32))

    def init(params):
        return MXNetSGDState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("mxnet_sgd requires params (weight decay)")
        lr = lr_at(state.count)

        if nesterov:
            # mxnet NAG (python/mxnet/optimizer.py NAG.update):
            #   mom   = momentum*mom + (grad + wd*w)
            #   delta = -lr * (grad + wd*w + momentum*mom)
            new_mom = jax.tree.map(
                lambda g, m, p: momentum * m + (g + weight_decay * p),
                grads, state.momentum, params)
            updates = jax.tree.map(
                lambda g, m, p: -lr * (g + weight_decay * p + momentum * m),
                grads, new_mom, params)
        else:
            new_mom = jax.tree.map(
                lambda g, m, p: momentum * m - lr * (g + weight_decay * p),
                grads, state.momentum, params)
            updates = new_mom
        return updates, MXNetSGDState(count=state.count + 1, momentum=new_mom)

    return optax.GradientTransformation(init, update)
