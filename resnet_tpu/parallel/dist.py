"""Multi-host distributed init (the dist_sync/launcher replacement).

Rebuilds SURVEY.md §2d/§3.5: the reference scales multi-node via
``tools/launch.py`` + ps-lite parameter servers (env rendezvous through
DMLC_ROLE / DMLC_PS_ROOT_URI / DMLC_NUM_WORKER). TPU-native, there is no
parameter server: every host calls ``jax.distributed.initialize`` and the
jitted step's psum runs over ICI/DCN collectives — sync-SGD semantics
identical to ``dist_sync`` with strictly less machinery.

Env rendezvous (set by tools/launch.py, our launcher):
    RESNET_TPU_COORDINATOR   host:port of process 0
    RESNET_TPU_NUM_PROCS     total processes
    RESNET_TPU_PROC_ID       this process's rank

On TPU pods these are usually unnecessary — jax.distributed.initialize()
auto-detects from the TPU metadata — so all three are optional.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax

_ENV_COORD = "RESNET_TPU_COORDINATOR"
_ENV_NPROC = "RESNET_TPU_NUM_PROCS"
_ENV_RANK = "RESNET_TPU_PROC_ID"


def maybe_init_distributed() -> bool:
    """Initialize multi-host JAX iff the launcher env is present."""
    if _ENV_COORD not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=os.environ[_ENV_COORD],
        num_processes=int(os.environ.get(_ENV_NPROC, "1")),
        process_id=int(os.environ.get(_ENV_RANK, "0")),
    )
    return True


def proc_info() -> Tuple[int, int]:
    """(num_parts, part_index) for input sharding — the exact analog of the
    reference's ImageRecordIter(num_parts=kv.num_workers, part_index=kv.rank).
    """
    return jax.process_count(), jax.process_index()


def is_primary() -> bool:
    """Rank-0 check (the reference checkpoints/logs on rank 0 only)."""
    return jax.process_index() == 0
