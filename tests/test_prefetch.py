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


def test_grouped_stacks_and_tail():
    from resnet_tpu.data.prefetch import prefetch_grouped
    out = list(prefetch_grouped(_batches(8), k=3, size=2))
    # 8 batches, k=3 -> two stacked groups + two single-batch tails
    assert [n for _, n in out] == [3, 3, 1, 1]
    g0 = out[0][0]
    assert g0["image"].shape == (3, 4, 2, 2, 3)
    np.testing.assert_array_equal(np.asarray(g0["label"])[:, 0], [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(out[1][0]["label"])[:, 0],
                                  [3, 4, 5])
    assert int(out[2][0]["label"][0]) == 6
    assert int(out[3][0]["label"][0]) == 7


def test_grouped_mesh_sharded():
    from resnet_tpu.data.prefetch import prefetch_grouped
    mesh = make_mesh(8)
    out = list(prefetch_grouped(
        ({"image": np.zeros((16, 2, 2, 3), np.uint8),
          "label": np.arange(16, dtype=np.int32)} for _ in range(2)),
        k=2, size=2, mesh=mesh))
    (g, n), = out
    assert n == 2
    assert g["label"].shape == (2, 16)
    # scan axis replicated, batch axis sharded 8 ways
    assert len(g["label"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["label"]),
                                  np.stack([np.arange(16)] * 2))
