"""Host-side rotate/shear (data/host_warp.py) — parity, determinism,
and the record-pipeline integration.

The host warp rebuilds the reference's CPU warpAffine placement
(ref: src/io/image_aug_default.cc rotation/shear); the parity pin here
guarantees it computes the SAME geometry as the in-graph path
(ops/augment.py rotate_images), so 'host' vs 'device' is purely a
placement/throughput choice (PERF_NOTES.md round 3: 11x step cost
on-device)."""

import numpy as np
import pytest

from resnet_tpu.data import host_warp


def _rand_canvas(n, h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (n, h, w, 3), dtype=np.uint8)


class TestParity:
    def test_identity_is_exact(self):
        img = _rand_canvas(1, 32, 32)[0]
        out = host_warp.warp_image(img, 0.0, 0.0)
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("ang_deg,shear", [
        (17.0, 0.0), (-9.0, 0.15), (0.0, 0.2), (30.0, -0.1)])
    def test_matches_device_rotate(self, ang_deg, shear):
        """Same angles through both backends -> same pixels (±1 u8 count:
        the host path quantizes u8->u8 like the reference's warpAffine;
        the device path stays float)."""
        import jax
        import jax.numpy as jnp

        from resnet_tpu.ops.augment import rotate_images

        img = _rand_canvas(4, 48, 40, seed=3)
        ang = np.full((4,), ang_deg * np.pi / 180.0, np.float32)
        sh = np.full((4,), shear, np.float32)
        dev = np.asarray(rotate_images(
            jnp.asarray(img, jnp.float32), jax.random.key(0), 0.0, 0.0,
            angles=jnp.asarray(ang), shears=jnp.asarray(sh)))
        host = host_warp.warp_batch(img, ang, sh).astype(np.float32)
        # one u8 quantization count, plus float slack for samples that
        # land exactly on a .5 rounding boundary
        assert np.abs(dev - host).max() <= 1.5

    def test_zero_border(self):
        """Content rotated past the edge blends with ZEROS (warpAffine's
        constant border), not clamped edge pixels."""
        img = np.full((32, 32, 3), 255, np.uint8)
        out = host_warp.warp_image(img, np.pi / 4, 0.0)
        # 45-degree rotation of a full square leaves zero corners
        assert out[0, 0].max() == 0 and out[-1, -1].max() == 0
        assert out[16, 16].min() == 255


class TestDeterminism:
    def test_batch_params_pure(self):
        a1, s1 = host_warp.batch_params(7, 2, 13, 32, 10.0, 0.1)
        a2, s2 = host_warp.batch_params(7, 2, 13, 32, 10.0, 0.1)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(s1, s2)
        a3, _ = host_warp.batch_params(7, 2, 14, 32, 10.0, 0.1)
        assert not np.array_equal(a1, a3)
        assert np.abs(a1).max() <= 10.0 * np.pi / 180.0
        assert np.abs(s1).max() <= 0.1

    def test_pool_order_stable(self):
        from concurrent.futures import ThreadPoolExecutor
        img = _rand_canvas(8, 24, 24, seed=1)
        a, s = host_warp.batch_params(0, 0, 0, 8, 20.0, 0.2)
        serial = host_warp.warp_batch(img, a, s)
        with ThreadPoolExecutor(4) as pool:
            pooled = host_warp.warp_batch(img, a, s, pool)
        np.testing.assert_array_equal(serial, pooled)


@pytest.mark.integration
class TestPipeline:
    """Record pipeline applies the warp; resume replays it identically."""

    @pytest.fixture()
    def rec_tree(self, tmp_path):
        from PIL import Image

        from resnet_tpu.data.im2rec import build_list, pack

        root = tmp_path / "src"
        rng = np.random.default_rng(0)
        for cls in range(2):
            d = root / f"class_{cls}"
            d.mkdir(parents=True)
            for i in range(12):
                arr = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg", quality=95)
        pack(str(root), str(tmp_path / "train"), build_list(str(root)))
        return str(tmp_path)

    def _cfg(self, rec_tree, angle):
        from resnet_tpu.config import Config
        cfg = Config()
        cfg.data.data_dir = rec_tree
        cfg.data.train_rec = "train.rec"
        cfg.data.pipeline = "record"
        cfg.data.num_classes = 2
        cfg.data.image_shape = (32, 32, 3)
        cfg.data.max_rotate_angle = angle
        cfg.data.preprocess_threads = 2
        cfg.train.batch_size = 8
        cfg.train.seed = 5
        return cfg

    def _stream(self, cfg, skip_to=0):
        from resnet_tpu.data.pipeline import RecordIter
        it = RecordIter(cfg, train=True)
        if skip_to:
            it.load_state_dict({"epoch": 0, "batch": skip_to,
                                "record": skip_to * 8})
        return [b["image"].copy() for b in it.epoch_iter(0)]

    def test_warp_applied_and_resumable(self, rec_tree):
        plain = self._stream(self._cfg(rec_tree, 0.0))
        warped = self._stream(self._cfg(rec_tree, 15.0))
        assert len(plain) == len(warped) == 3
        # rotation actually changed the canvases
        assert any(not np.array_equal(p, w) for p, w in zip(plain, warped))
        # mid-epoch resume replays the IDENTICAL warped stream (batch_params
        # is keyed on the absolute batch index, not the post-resume count)
        resumed = self._stream(self._cfg(rec_tree, 15.0), skip_to=1)
        assert len(resumed) == 2
        for full, rep in zip(warped[1:], resumed):
            np.testing.assert_array_equal(full, rep)

    def test_device_backend_skips_host_warp(self, rec_tree):
        cfg = self._cfg(rec_tree, 15.0)
        cfg.data.rotate_backend = "device"
        unwarped = self._stream(cfg)
        plain = self._stream(self._cfg(rec_tree, 0.0))
        for a, b in zip(plain, unwarped):
            np.testing.assert_array_equal(a, b)
