"""Prefetcher tests: ordering, depth, device placement, mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.data.prefetch import prefetch_to_device
from resnet_tpu.parallel.mesh import make_mesh


def _batches(n):
    for i in range(n):
        yield {"image": np.full((4, 2, 2, 3), i, np.uint8),
               "label": np.full((4,), i, np.int32)}


def test_order_preserved():
    out = list(prefetch_to_device(_batches(7), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert int(b["label"][0]) == i


def test_device_resident():
    (b,) = list(prefetch_to_device(_batches(1), size=2))
    assert isinstance(b["image"], jax.Array)


def test_mesh_sharded():
    mesh = make_mesh(8)
    out = list(prefetch_to_device(
        ({"image": np.zeros((16, 2, 2, 3), np.uint8),
          "label": np.arange(16, dtype=np.int32)} for _ in range(2)),
        size=2, mesh=mesh))
    arr = out[0]["label"]
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), np.arange(16))


def test_short_iterator_flushes():
    out = list(prefetch_to_device(_batches(2), size=8))
    assert len(out) == 2
