"""Train state: params + BN running stats + optimizer state + step.

The TPU analog of the reference's Module state (arg_params / aux_params /
optimizer state spread across MXNet executors and kvstore —
mxnet python/mxnet/module/module.py): here it is ONE immutable pytree that
flows through the jitted step function and is donated back, so XLA updates
parameters in place in HBM.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from resnet_tpu.config import Config
from resnet_tpu.models.registry import get_model
from resnet_tpu.train.optim import mxnet_sgd, radial_projection
from resnet_tpu.train.schedule import schedule_from_config


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray          # base PRNG key; per-step keys fold in `step`
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt)


def create_train_state(cfg: Config, rng=None) -> TrainState:
    """Build model, init params (MSRA), optimizer — ref:train_resnet.py setup."""
    model = get_model(cfg)
    if rng is None:
        rng = jax.random.key(cfg.train.seed)
    h, w, c = cfg.data.image_shape
    variables = model.init(rng, jnp.zeros((1, h, w, c), jnp.float32),
                           train=False)
    schedule = schedule_from_config(cfg)
    tx = mxnet_sgd(schedule, momentum=cfg.train.mom,
                   weight_decay=cfg.train.wd,
                   nesterov=cfg.train.optimizer == "nag")
    if getattr(cfg.train, "bn_ema", False) \
            and getattr(cfg.train, "bn_ema_project", True):
        # frozen-stats BN drops BatchNorm's implicit radial-gradient
        # projection; reinstate it in weight space or training diverges
        # (optim.radial_projection docstring)
        tx = optax.chain(radial_projection(), tx)
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.key_data(jax.random.fold_in(rng, 1)),
        apply_fn=model.apply,
        tx=tx,
    )
