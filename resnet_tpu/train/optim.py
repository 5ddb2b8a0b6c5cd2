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
