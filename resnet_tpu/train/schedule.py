"""LR schedules: multi-factor step decay with linear warmup.

Rebuilds ref:core/scheduler.py ``WarmupMultiFactorScheduler(step, factor,
warmup, warmup_lr, warmup_step)`` — the reference's multi-step decay operating
in the ITERATION domain (epochs x steps_per_epoch), with linear warmup for
large-batch runs — as an optax-compatible schedule (callable step -> lr) that
is pure jnp so it traces into the jitted train step.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from resnet_tpu.config import Config


def warmup_multifactor(base_lr: float, steps: Sequence[int],
                       factor: float = 0.1, warmup: bool = False,
                       warmup_lr: float = 0.0, warmup_steps: int = 0):
    """step -> lr. ``steps`` are absolute iteration numbers (sorted).

    Matches MXNet semantics: lr = base_lr * factor^(#steps passed);
    during warmup, linear ramp warmup_lr -> base_lr over warmup_steps.
    """
    steps = jnp.asarray(list(steps), jnp.int32)

    def schedule(count):
        count = jnp.asarray(count, jnp.int32)
        n_passed = jnp.sum(count >= steps)
        lr = base_lr * factor ** n_passed.astype(jnp.float32)
        if warmup and warmup_steps > 0:
            frac = jnp.minimum(count.astype(jnp.float32) / warmup_steps, 1.0)
            wlr = warmup_lr + (base_lr - warmup_lr) * frac
            lr = jnp.where(count < warmup_steps, wlr, lr)
        return lr

    return schedule


def schedule_from_config(cfg: Config):
    """Epoch-domain config -> iteration-domain schedule.

    Reproduces the reference's epoch-size arithmetic
    (ref:train_resnet.py: steps = [e * num_examples // batch_size for e in
    lr_steps]).
    """
    t, d = cfg.train, cfg.data
    steps_per_epoch = max(d.num_examples // t.batch_size, 1)
    steps = [e * steps_per_epoch for e in t.lr_steps]
    return warmup_multifactor(
        base_lr=t.lr, steps=steps, factor=t.lr_factor, warmup=t.warmup,
        warmup_lr=t.warmup_lr, warmup_steps=t.warmup_epochs * steps_per_epoch)
