"""Device mesh + sharding layout for data-parallel training.

TPU-native replacement for the reference's kvstore device placement
(ref:train_resnet.py context list from ``--gpus`` + mx.kvstore 'device'):
a 1-D ``data`` mesh over the chips; the batch is sharded along it, state is
replicated, and XLA lowers gradient reductions to ICI all-reduce.

A ``model`` axis is declared in the mesh helper for forward-compat but the
reference is DP-only (SURVEY.md §2c), so all current shardings use ``data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over ``num_devices`` (0 = all local devices)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharded(mesh: Mesh) -> NamedSharding:
    """Sharding for K-stacked batches ``(k, batch, ...)`` (multi-step
    dispatch, train.steps_per_dispatch): dim 0 is the scan axis, dim 1 is
    the batch axis sharded across the data mesh."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, sharded along dim 0.

    This is the ONLY host->device transfer in the hot loop (the analog of the
    reference's per-GPU ``load_data`` slice+copyto in
    mxnet executor_group.py); jax.device_put is async so it overlaps with the
    previous step's compute.
    """
    sharding = batch_sharded(mesh)
    return jax.device_put(batch, sharding)
