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


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all ranks through the COORDINATION SERVICE (never gloo).

    XLA:CPU's gloo collectives create their communicator contexts lazily
    at first dispatch, and context creation waits at most ~30s for the
    other ranks' keys. Rank startup/setup skew easily exceeds that on a
    loaded host (measured: one rank raced 35s ahead of the others on this
    1-core box, deadlining every collective in the job) — so the trainer
    barriers HERE, where the timeout is ours to choose, right before the
    first collective dispatch.
    """
    if jax.process_count() > 1:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def finalize_distributed() -> None:
    """Synchronized teardown for multi-process runs.

    Ranks reach the end of fit at slightly different times; if the
    coordination leader (rank 0) exits first, the remaining ranks' next
    coordination-service poll FATALs ("another task died") and the whole
    job reports failure after a fully successful run. Barrier (through
    the coordination service, same rationale as ``barrier``), then shut
    the distributed client down cleanly.
    """
    if jax.process_count() > 1:
        barrier("resnet_tpu:exit")
        jax.distributed.shutdown()


def proc_info() -> Tuple[int, int]:
    """(num_parts, part_index) for input sharding — the exact analog of the
    reference's ImageRecordIter(num_parts=kv.num_workers, part_index=kv.rank).
    """
    return jax.process_count(), jax.process_index()


def is_primary() -> bool:
    """Rank-0 check (the reference checkpoints/logs on rank 0 only)."""
    return jax.process_index() == 0
