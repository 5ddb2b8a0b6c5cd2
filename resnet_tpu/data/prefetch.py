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

from resnet_tpu.parallel.mesh import batch_sharded


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
