"""Host->device prefetch: the double-buffered pipeline boundary.

Replaces the reference's C++ PrefetcherIter + per-GPU load_data copy
(mxnet src/io/iter_prefetcher.h; SURVEY.md §3.2 H2D boundary): we keep
``size`` batches in flight with async ``jax.device_put`` so the uint8 copy
of batch N+1 rides under the compute of batch N. jax dispatch is async, so
no thread is needed — the queue depth alone provides the overlap.
"""

from __future__ import annotations

import collections
from typing import Iterator

import jax
import numpy as np

from resnet_tpu.parallel.mesh import batch_sharded, stacked_batch_sharded


def prefetch_to_device(iterator: Iterator, size: int = 2,
                       mesh=None) -> Iterator:
    """Yield device-resident batches, keeping ``size`` in flight.

    With a mesh, batches land sharded along the data axis (the analog of the
    reference's batch slicing across GPUs, but as one logical array). In
    multi-host runs each process feeds its LOCAL shard (the iterator is
    already num_parts-sharded) and the batch is assembled as a global array
    — the jax equivalent of every worker reading its ImageRecordIter part.
    """
    queue = collections.deque()
    sharding = batch_sharded(mesh) if mesh is not None else None
    multihost = jax.process_count() > 1

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        if multihost:
            nproc = jax.process_count()
            return jax.tree.map(
                lambda arr: jax.make_array_from_process_local_data(
                    sharding, arr,
                    global_shape=(arr.shape[0] * nproc,) + arr.shape[1:]),
                batch)
        return jax.device_put(batch, sharding)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def prefetch_grouped(iterator: Iterator, k: int, size: int = 2,
                     mesh=None) -> Iterator:
    """Group ``k`` host batches into one stacked device batch for
    multi-step dispatch (train.steps_per_dispatch; steps._scan_steps).

    Yields ``(batch, n)`` pairs: full groups are stacked on a leading
    ``k`` axis (``n = k``, for the K-step scanned program); an epoch tail
    shorter than ``k`` falls back to SINGLE device batches with ``n = 1``
    (the caller runs those through its one-step program), so every record
    of the epoch is consumed with exact single-step semantics.

    Sharding mirrors :func:`prefetch_to_device`: dim 0 is the scan axis
    (replicated), dim 1 the data-sharded batch axis; multi-host processes
    feed their local shard of dim 1.
    """
    queue = collections.deque()
    flat_sharding = batch_sharded(mesh) if mesh is not None else None
    stk_sharding = stacked_batch_sharded(mesh) if mesh is not None else None
    multihost = jax.process_count() > 1

    def put(batch, sharding, stacked):
        if sharding is None:
            return jax.device_put(batch)
        if multihost:
            nproc = jax.process_count()
            def assemble(arr):
                gdim = 1 if stacked else 0
                gshape = list(arr.shape)
                gshape[gdim] *= nproc
                return jax.make_array_from_process_local_data(
                    sharding, arr, global_shape=tuple(gshape))
            return jax.tree.map(assemble, batch)
        return jax.device_put(batch, sharding)

    group = []
    for batch in iterator:
        group.append(batch)
        if len(group) == k:
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
            group = []
            queue.append((put(stacked, stk_sharding, True), k))
            if len(queue) >= size:
                yield queue.popleft()
    for batch in group:   # epoch tail < k: exact single-step fallback
        queue.append((put(batch, flat_sharding, False), 1))
    while queue:
        yield queue.popleft()
