"""Data-plane tests: RecordIO format, im2rec round trip, native loader,
record pipeline — the analog of mxnet tests/python/unittest/test_io.py
(packs small fixtures on the fly, checks shapes/determinism/sharding
disjointness — SURVEY.md §4).
"""

import io
import os
import struct

import numpy as np
import pytest

from resnet_tpu.data import recordio as rio
from resnet_tpu.data.loader import MemoryIter, SyntheticIter, synthetic_cifar


@pytest.fixture(scope="module")
def tiny_imageset(tmp_path_factory):
    """16-image, 4-class JPEG tree + packed .rec/.idx."""
    from PIL import Image
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for cls in range(4):
        d = root / f"class_{cls}"
        d.mkdir()
        for i in range(4):
            arr = np.full((40 + 4 * cls, 48, 3), cls * 60 + 20, np.uint8)
            arr += rng.integers(0, 20, arr.shape, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg", quality=95)
    from resnet_tpu.data.im2rec import build_list, pack
    prefix = str(root / "train")
    entries = build_list(str(root))
    pack(str(root), prefix, entries, resize=0, quality=95)
    return {"root": str(root), "prefix": prefix, "entries": entries}


class TestRecordIOFormat:
    def test_round_trip(self, tmp_path):
        path = str(tmp_path / "t.rec")
        payloads = [b"hello", b"x" * 1000, b"", b"\x01\x02\x03"]
        with rio.RecordIOWriter(path, path + ".idx") as w:
            for p in payloads:
                w.write(p)
        r = rio.RecordIOReader(path, path + ".idx")
        assert list(r) == payloads
        # random access via idx
        assert r.read_at(r.offsets[1]) == payloads[1]

    def test_magic_in_payload(self, tmp_path):
        """dmlc splits records at embedded magic words; verify rejoin."""
        path = str(tmp_path / "t.rec")
        magic = struct.pack("<I", rio.MAGIC)
        payloads = [b"abcd" + magic + b"efgh",
                    magic * 3,
                    b"ab" + magic + b"cd"]  # unaligned magic: not split
        with rio.RecordIOWriter(path) as w:
            for p in payloads:
                w.write(p)
        assert list(rio.RecordIOReader(path)) == payloads

    def test_scan_offsets_matches_idx(self, tmp_path):
        path = str(tmp_path / "t.rec")
        with rio.RecordIOWriter(path, path + ".idx") as w:
            for i in range(10):
                w.write(bytes([i]) * (i + 1))
        r1 = rio.RecordIOReader(path, path + ".idx")
        r2 = rio.RecordIOReader(path)
        assert r2.scan_offsets() == r1.offsets

    def test_image_record_header(self):
        img = b"\xff\xd8fakejpeg"
        data = rio.pack_image_record(img, label=7.0, rec_id=42)
        rec = rio.unpack_image_record(data)
        assert rec.label == 7.0 and rec.id == 42 and rec.image == img

    def test_extra_labels(self):
        data = rio.pack_image_record(b"im", label=0.0,
                                     extra_labels=(3.0, 4.0))
        rec = rio.unpack_image_record(data)
        assert rec.label == 3.0 and rec.extra_labels == (3.0, 4.0)


class TestNativeLoader:
    def test_reads_packed_shard(self, tiny_imageset):
        from resnet_tpu.data.native import NativeRecordLoader
        ld = NativeRecordLoader(tiny_imageset["prefix"] + ".rec",
                                tiny_imageset["prefix"] + ".idx",
                                canvas_hw=(32, 32), threads=2)
        assert ld.num_records == 16
        ld.begin_epoch(0, shuffle=False, seed=0)
        images, labels, dims = ld.next_batch(16)
        assert images.shape == (16, 32, 32, 3)
        assert sorted(labels.tolist()) == sorted(
            [e[1] for e in tiny_imageset["entries"]])
        # class 0 images are dark (~30), class 3 bright (~200): decode sane
        by_label = {int(l): images[i].mean()
                    for i, l in enumerate(labels)}
        assert by_label[0] < by_label[3]

    def test_shuffle_deterministic(self, tiny_imageset):
        from resnet_tpu.data.native import NativeRecordLoader
        ld = NativeRecordLoader(tiny_imageset["prefix"] + ".rec", None,
                                canvas_hw=(16, 16), threads=1)
        ld.begin_epoch(3, shuffle=True, seed=7)
        _, l1, _ = ld.next_batch(16)
        ld.begin_epoch(3, shuffle=True, seed=7)
        _, l2, _ = ld.next_batch(16)
        ld.begin_epoch(4, shuffle=True, seed=7)
        _, l3, _ = ld.next_batch(16)
        assert l1.tolist() == l2.tolist()
        assert l1.tolist() != l3.tolist()

    def test_sharding_disjoint(self, tiny_imageset):
        """num_parts/part_index must partition the records (the mxnet
        test_io.py dist-sharding check)."""
        from resnet_tpu.data.native import NativeRecordLoader
        seen = []
        for part in range(4):
            ld = NativeRecordLoader(
                tiny_imageset["prefix"] + ".rec",
                tiny_imageset["prefix"] + ".idx",
                canvas_hw=(16, 16), threads=1, num_parts=4, part_index=part)
            assert ld.num_records == 4
            ld.begin_epoch(0, shuffle=False, seed=0)
            imgs, labels, _ = ld.next_batch(8)
            assert len(imgs) == 4  # partial batch at epoch end
            seen.extend(imgs.reshape(4, -1).sum(1).tolist())
        assert len(seen) == 16

    def test_corrupt_records_skipped(self, tmp_path, tiny_imageset):
        """Corrupt JPEGs must be dropped from the batch (the reference's
        ImageRecordIOParser2 skips bad imdecode results), not trained on
        as zero images with a wrapped label."""
        from PIL import Image
        from resnet_tpu.data.native import NativeRecordLoader
        path = str(tmp_path / "mix.rec")
        buf = io.BytesIO()
        Image.fromarray(np.full((20, 20, 3), 99, np.uint8)).save(
            buf, format="JPEG")
        good = buf.getvalue()
        with rio.RecordIOWriter(path) as w:
            w.write(rio.pack_image_record(good, label=1.0))
            w.write(rio.pack_image_record(b"\xff\xd8 not a jpeg", label=2.0))
            w.write(rio.pack_image_record(good, label=3.0))
        ld = NativeRecordLoader(path, None, canvas_hw=(16, 16), threads=1)
        ld.begin_epoch(0, shuffle=False, seed=0)
        images, labels, _ = ld.next_batch(3)
        assert labels.tolist() == [1.0, 3.0]
        assert len(images) == 2 and (labels >= 0).all()
        assert ld._decode_failures == 1

    def test_epoch_end_partial(self, tiny_imageset):
        from resnet_tpu.data.native import NativeRecordLoader
        ld = NativeRecordLoader(tiny_imageset["prefix"] + ".rec", None,
                                canvas_hw=(16, 16), threads=2)
        ld.begin_epoch(0, shuffle=False, seed=0)
        i1, _, _ = ld.next_batch(10)
        i2, _, _ = ld.next_batch(10)
        i3, _, _ = ld.next_batch(10)
        assert len(i1) == 10 and len(i2) == 6 and len(i3) == 0

    def test_letterbox_dims(self, tiny_imageset):
        """Letterbox mode: whole image inside the canvas, zero pad, dims =
        (orig_h, orig_w, eff_h, eff_w) — the full-image crop-domain
        contract the on-device augmenter relies on."""
        from resnet_tpu.data.native import NativeRecordLoader
        ld = NativeRecordLoader(tiny_imageset["prefix"] + ".rec",
                                tiny_imageset["prefix"] + ".idx",
                                canvas_hw=(32, 32), threads=1,
                                letterbox=True)
        ld.begin_epoch(0, shuffle=False, seed=0)
        images, labels, dims = ld.next_batch(16)
        assert dims.shape == (16, 4)
        # source images are (40+4*cls, 48): taller than wide for cls 3
        assert set(dims[:, 1].tolist()) == {48}
        for img, (oh, ow, eh, ew) in zip(images, dims):
            assert 1 <= eh <= 32 and 1 <= ew <= 32
            assert max(eh / oh, ew / ow) <= 32 / 47  # fit INSIDE
            # padding region is zero
            if eh < 32:
                assert img[eh:, :].max() == 0
            if ew < 32:
                assert img[:, ew:].max() == 0
            assert img[:eh, :ew].mean() > 5  # content present

    def test_multi_shard_set(self, tiny_imageset, tmp_path):
        """A sharded pack (im2rec-style train_000.rec...) reads as ONE
        dataset, with num_parts partitioning across the whole set."""
        from resnet_tpu.data.im2rec import pack
        from resnet_tpu.data.native import NativeRecordLoader
        prefix = str(tmp_path / "train")
        pack(tiny_imageset["root"], prefix, tiny_imageset["entries"],
             resize=0, quality=95, num_shards=3)
        import glob as _glob
        recs = sorted(_glob.glob(prefix + "_*.rec"))
        assert len(recs) == 3
        ld = NativeRecordLoader(recs, None, canvas_hw=(16, 16), threads=2)
        assert ld.num_records == 16
        ld.begin_epoch(0, shuffle=False, seed=0)
        _, labels, _ = ld.next_batch(16)
        assert sorted(labels.tolist()) == sorted(
            [e[1] for e in tiny_imageset["entries"]])
        # sharding disjointness across the shard SET
        seen = []
        for part in range(2):
            p = NativeRecordLoader(recs, None, canvas_hw=(16, 16),
                                   threads=1, num_parts=2, part_index=part)
            p.begin_epoch(0, shuffle=False, seed=0)
            _, pl, _ = p.next_batch(16)
            seen.extend(pl.tolist())
        assert sorted(seen) == sorted(labels.tolist())

    def test_skip_replays_stream(self, tiny_imageset):
        """skip(n) must land exactly where n sequential reads would."""
        from resnet_tpu.data.native import NativeRecordLoader
        ld = NativeRecordLoader(tiny_imageset["prefix"] + ".rec", None,
                                canvas_hw=(16, 16), threads=1)
        ld.begin_epoch(5, shuffle=True, seed=3)
        _, l_all, _ = ld.next_batch(16)
        ld.begin_epoch(5, shuffle=True, seed=3)
        ld.skip(6)
        _, l_rest, _ = ld.next_batch(16)
        assert l_rest.tolist() == l_all[6:].tolist()


class TestPythonLoaderParity:
    def test_matches_native(self, tiny_imageset):
        """The pure-Python fallback must agree with the C++ loader
        (independent implementations of decode+canvas — SURVEY.md §7.5)."""
        from resnet_tpu.data.native import (NativeRecordLoader,
                                            PythonRecordLoader)
        kw = dict(canvas_hw=(24, 24), threads=1)
        a = NativeRecordLoader(tiny_imageset["prefix"] + ".rec",
                               tiny_imageset["prefix"] + ".idx", **kw)
        b = PythonRecordLoader(tiny_imageset["prefix"] + ".rec",
                               tiny_imageset["prefix"] + ".idx", **kw)
        a.begin_epoch(0, False, 0)
        b.begin_epoch(0, False, 0)
        ia, la, _ = a.next_batch(16)
        ib, lb, _ = b.next_batch(16)
        assert la.tolist() == lb.tolist()
        # decoders/resizers differ in rounding; images must be close
        diff = np.abs(ia.astype(np.int32) - ib.astype(np.int32))
        assert diff.mean() < 3.0 and diff.max() <= 60


class TestRecordIter:
    def test_end_to_end(self, tiny_imageset):
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        cfg = Config()
        cfg.data.data_dir = tiny_imageset["root"]
        cfg.data.train_rec = "train.rec"
        cfg.data.train_idx = "train.idx"
        cfg.data.val_rec = "train.rec"
        cfg.data.val_idx = "train.idx"
        cfg.data.image_shape = (32, 32, 3)
        cfg.data.preprocess_threads = 2
        cfg.train.batch_size = 8
        train_it = RecordIter(cfg, train=True)
        assert train_it.steps_per_epoch == 2
        batches = list(train_it.epoch_iter(0))
        assert len(batches) == 2
        assert batches[0]["image"].shape == (8, 32, 32, 3)
        assert batches[0]["label"].dtype == np.int32

        val_it = RecordIter(cfg, train=False)
        vb = list(val_it.epoch_iter(0))
        assert val_it.steps_per_epoch == 2
        assert vb[-1]["mask"].sum() == 8  # full batches, mask all-ones

    def test_val_padding_mask(self, tiny_imageset):
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        cfg = Config()
        cfg.data.data_dir = tiny_imageset["root"]
        cfg.data.val_rec = "train.rec"
        cfg.data.val_idx = "train.idx"
        cfg.data.image_shape = (32, 32, 3)
        cfg.train.batch_size = 5
        val_it = RecordIter(cfg, train=False)
        vb = list(val_it.epoch_iter(0))
        assert val_it.steps_per_epoch == 4
        assert vb[-1]["mask"].tolist() == [1.0, 0.0, 0.0, 0.0, 0.0]

    def test_canvas_size(self):
        from resnet_tpu.data.pipeline import canvas_size
        assert canvas_size((224, 224)) == (256, 256)
        assert canvas_size((32, 32)) == (32, 32)
        # fidelity override (cfg.data.canvas_size) pins the edge directly
        assert canvas_size((224, 224), override=320) == (320, 320)

    def test_canvas_size_override_flows_to_loader(self, tiny_imageset):
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        cfg = Config()
        cfg.data.data_dir = tiny_imageset["root"]
        cfg.data.train_rec = "train.rec"
        cfg.data.image_shape = (32, 32, 3)
        cfg.data.canvas_size = 48
        cfg.train.batch_size = 4
        it = RecordIter(cfg, train=True)
        assert it.canvas_hw == (48, 48)
        b = next(it.epoch_iter(0))
        assert b["image"].shape[1:3] == (48, 48)
        # val transform unaffected (reference resize-256/center-crop path)
        cfg.data.val_rec = "train.rec"
        val_it = RecordIter(cfg, train=False)
        assert val_it.canvas_hw == (32, 32)

    def test_train_batches_carry_dims(self, tiny_imageset):
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        cfg = Config()
        cfg.data.data_dir = tiny_imageset["root"]
        cfg.data.train_rec = "train.rec"
        cfg.data.image_shape = (32, 32, 3)
        cfg.train.batch_size = 8
        it = RecordIter(cfg, train=True)
        b = next(iter(it.epoch_iter(0)))
        assert b["dims"].shape == (8, 4)
        assert (b["dims"][:, 1] == 48).all()  # source width

    def test_mid_epoch_resume_replays_stream(self, tiny_imageset):
        """state_dict/load_state_dict must resume the EXACT remaining
        batch stream mid-epoch (stronger than the reference's
        epoch-granular restart — SURVEY.md §3.4)."""
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        cfg = Config()
        cfg.data.data_dir = tiny_imageset["root"]
        cfg.data.train_rec = "train.rec"
        cfg.data.image_shape = (32, 32, 3)
        cfg.data.shuffle = True
        cfg.train.batch_size = 4
        it = RecordIter(cfg, train=True)
        gen = it.epoch_iter(2)
        first = [next(gen)["label"].tolist() for _ in range(2)]
        state = it.state_dict()
        # "record" = records consumed (== batch*bs with no corrupt drops)
        assert state == {"epoch": 2, "batch": 2, "record": 8}
        rest_original = [b["label"].tolist() for b in gen]

        it2 = RecordIter(cfg, train=True)
        it2.load_state_dict(state)
        rest_resumed = [b["label"].tolist() for b in it2.epoch_iter(2)]
        assert rest_resumed == rest_original
        assert len(first) + len(rest_resumed) == it.steps_per_epoch

    def test_cursor_state_tracks_consumed_not_produced(self, tiny_imageset):
        """Mid-epoch checkpoints use cursor_state(nbatch): the prefetch
        queue pulls the iterator AHEAD of the train step, so the cursor
        for "n batches trained" must come from the per-batch history, not
        the latest produced position — or resume would skip batches that
        were never trained on."""
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        cfg = Config()
        cfg.data.data_dir = tiny_imageset["root"]
        cfg.data.train_rec = "train.rec"
        cfg.data.image_shape = (32, 32, 3)
        cfg.train.batch_size = 4
        it = RecordIter(cfg, train=True)
        gen = it.epoch_iter(1)
        batches = [next(gen)["label"].tolist() for _ in range(3)]
        # iterator has PRODUCED 3 batches; the trainer only consumed 1
        cur = it.cursor_state(1)
        assert cur == {"epoch": 1, "batch": 1, "record": 4}
        assert it.state_dict()["batch"] == 3   # produced position differs
        for _ in gen:
            pass
        it2 = RecordIter(cfg, train=True)
        it2.load_state_dict(cur)
        replay = [b["label"].tolist() for b in it2.epoch_iter(1)]
        assert replay[:2] == batches[1:3]   # batches 2..3 replay exactly

    def test_multi_shard_record_iter(self, tiny_imageset, tmp_path):
        """RecordIter resolves an im2rec shard prefix to the full set."""
        from resnet_tpu.config import Config
        from resnet_tpu.data.im2rec import pack
        from resnet_tpu.data.pipeline import RecordIter
        pack(tiny_imageset["root"], str(tmp_path / "train"),
             tiny_imageset["entries"], resize=0, quality=95, num_shards=4)
        cfg = Config()
        cfg.data.data_dir = str(tmp_path)
        cfg.data.train_rec = "train.rec"   # no such file; shards exist
        cfg.data.image_shape = (32, 32, 3)
        cfg.train.batch_size = 8
        it = RecordIter(cfg, train=True)
        assert it.loader.num_records == 16
        labels = []
        for b in it.epoch_iter(0):
            labels.extend(b["label"].tolist())
        assert sorted(labels) == sorted(
            int(e[1]) for e in tiny_imageset["entries"])

    def test_val_transform_parity(self, tiny_imageset):
        """The .rec val path must equal the reference's transform:
        shorter-side resize to 8/7*data_shape + center crop (PIL oracle)."""
        import io as _io
        import jax.numpy as jnp
        from PIL import Image
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        from resnet_tpu.data.recordio import (RecordIOReader,
                                              unpack_image_record)
        from resnet_tpu.ops.augment import eval_center_crop
        cfg = Config()
        cfg.data.data_dir = tiny_imageset["root"]
        cfg.data.val_rec = "train.rec"
        cfg.data.val_idx = "train.idx"
        cfg.data.image_shape = (112, 112, 3)
        cfg.data.mean_rgb = (0.0, 0.0, 0.0)
        cfg.data.std_rgb = (1.0, 1.0, 1.0)
        cfg.train.batch_size = 16
        it = RecordIter(cfg, train=False)
        assert it.canvas_hw == (128, 128)  # 8/7 of 112
        batch = next(iter(it.epoch_iter(0)))
        out = np.asarray(eval_center_crop(
            jnp.asarray(batch["image"]), cfg.data, (112, 112)))
        # PIL oracle: resize shorter side to 128, center-crop 112
        reader = RecordIOReader(tiny_imageset["prefix"] + ".rec",
                                tiny_imageset["prefix"] + ".idx")
        rec = unpack_image_record(reader.read_at(reader.offsets[0]))
        img = Image.open(_io.BytesIO(rec.image)).convert("RGB")
        iw, ih = img.size
        s = max(128 / ih, 128 / iw)
        img = img.resize((max(128, round(iw * s)), max(128, round(ih * s))),
                         Image.BILINEAR)
        rw, rh = img.size
        arr = np.asarray(img)[(rh - 128) // 2:(rh - 128) // 2 + 128,
                              (rw - 128) // 2:(rw - 128) // 2 + 128]
        want = arr[8:120, 8:120].astype(np.float32)
        k = int(np.argmin([abs(float(l) - rec.label)
                           for l in batch["label"]]))
        # decoders/resizers differ in rounding; close, not bitwise
        diff = np.abs(out[k] - want)
        assert diff.mean() < 4.0


class TestMemoryIter:
    def test_determinism_and_sharding(self):
        images, labels = synthetic_cifar(64, 4, (8, 8, 3), seed=0)
        it = MemoryIter(images, labels, batch_size=8, seed=5)
        b1 = [b["label"].tolist() for b in it.epoch_iter(2)]
        b2 = [b["label"].tolist() for b in it.epoch_iter(2)]
        b3 = [b["label"].tolist() for b in it.epoch_iter(3)]
        assert b1 == b2 and b1 != b3
        parts = [MemoryIter(images, labels, 8, num_parts=2, part_index=i)
                 for i in range(2)]
        assert parts[0].steps_per_epoch == 4
        assert len(parts[0].images) + len(parts[1].images) == 64

    def test_synthetic_iter(self):
        it = SyntheticIter(4, (8, 8, 3), 10, steps_per_epoch=3)
        batches = list(it.epoch_iter(0))
        assert len(batches) == 3
        assert batches[0]["image"].shape == (4, 8, 8, 3)


class TestValTransformParity:
    """The val pipeline must equal the reference's resize-256/crop-224:
    shorter-side resize to 8/7*out (loader, letterbox=False) composed with
    the on-device center crop (ops/augment.eval_center_crop) == resize
    shorter side to 256 + center crop 224 directly (the MXNet val
    ImageRecordIter transform — SURVEY.md §2a loader row)."""

    def _oracle(self, arr, canvas=256, out=224):
        from PIL import Image
        ih, iw = arr.shape[:2]
        scale = canvas / min(ih, iw)
        rw = max(canvas, round(iw * scale))
        rh = max(canvas, round(ih * scale))
        img = Image.fromarray(arr).resize((rw, rh), Image.BILINEAR)
        full = np.asarray(img)
        y0, x0 = (rh - out) // 2, (rw - out) // 2
        return full[y0:y0 + out, x0:x0 + out]

    @pytest.fixture(scope="class")
    def tall_jpeg_rec(self, tmp_path_factory):
        from PIL import Image
        root = tmp_path_factory.mktemp("val")
        rng = np.random.default_rng(7)
        # non-square both ways: crop distribution differs from a square
        # canvas if the resize rule is wrong
        arrs = []
        for i, (h, w) in enumerate([(300, 420), (400, 280)]):
            y = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
            x = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
            arr = np.clip(y * 0.5 + x * 0.5
                          + rng.normal(0, 8, (h, w, 3)), 0, 255)
            arr = arr.astype(np.uint8)
            arrs.append(arr)
            Image.fromarray(arr).save(root / f"im{i}.jpg", quality=98)
        rec = str(root / "val.rec")
        with rio.RecordIOWriter(rec) as wtr:
            for i in range(2):
                wtr.write(rio.pack_image_record(
                    (root / f"im{i}.jpg").read_bytes(), label=float(i)))
        # decode the JPEGs back so the oracle sees the same pixels the
        # loaders decode (JPEG is lossy)
        from PIL import Image as I
        decoded = [np.asarray(I.open(root / f"im{i}.jpg").convert("RGB"))
                   for i in range(2)]
        return rec, decoded

    def _check(self, loader_cls, rec, decoded, tol_mean, tol_frac):
        import jax.numpy as jnp

        from resnet_tpu.config import DataConfig
        from resnet_tpu.ops.augment import eval_center_crop

        loader = loader_cls(rec, None, (256, 256), letterbox=False)
        loader.begin_epoch(0, False, 0)
        images, labels, _ = loader.next_batch(2)
        cfg = DataConfig(mean_rgb=(0.0, 0.0, 0.0), std_rgb=(1.0, 1.0, 1.0))
        out = np.asarray(eval_center_crop(jnp.asarray(images), cfg,
                                          (224, 224)))
        for i in range(2):
            want = self._oracle(decoded[int(labels[i])]).astype(np.float32)
            diff = np.abs(out[i] - want)
            assert diff.mean() < tol_mean, diff.mean()
            assert (diff <= 16).mean() > tol_frac, (diff > 16).mean()

    def test_python_loader_matches_oracle(self, tall_jpeg_rec):
        from resnet_tpu.data.native import PythonRecordLoader
        rec, decoded = tall_jpeg_rec
        # PIL both sides: pixel-exact up to the crop composition
        self._check(PythonRecordLoader, rec, decoded, 0.01, 1.0 - 1e-9)

    def test_native_loader_matches_oracle(self, tall_jpeg_rec):
        from resnet_tpu.data.native import (NativeRecordLoader,
                                            NativeUnavailable)
        rec, decoded = tall_jpeg_rec
        try:
            self._check(NativeRecordLoader, rec, decoded, 1.5, 0.999)
        except NativeUnavailable:
            pytest.skip("native loader unavailable")


class TestCorruptRecords:
    """Corrupt-record handling parity across loaders + the batch stream.

    The reference's ImageRecordIOParser2 drops records whose imdecode
    fails; both our loaders must do the same (label -1 sentinel filter),
    the train stream must drop the corrupt-shortened tail batch instead
    of zero-padding it, and the mid-epoch cursor must count CONSUMED
    records so resume still replays the exact stream."""

    @pytest.fixture(scope="class")
    def corrupt_rec(self, tmp_path_factory):
        from PIL import Image
        root = tmp_path_factory.mktemp("corrupt")
        rng = np.random.default_rng(3)
        with rio.RecordIOWriter(str(root / "train.rec"),
                                str(root / "train.idx")) as w:
            for i in range(10):
                if i == 4:
                    payload = b"\xff\xd8NOT-A-JPEG" + bytes(40)
                else:
                    import io as _io
                    arr = rng.integers(0, 255, (32, 40, 3)).astype(np.uint8)
                    buf = _io.BytesIO()
                    Image.fromarray(arr).save(buf, format="JPEG")
                    payload = buf.getvalue()
                w.write(rio.pack_image_record(payload, float(i), rec_id=i),
                        key=i)
        return str(root)

    def _loader_case(self, loader_cls, root):
        loader = loader_cls(root + "/train.rec", root + "/train.idx",
                            (32, 32), letterbox=True)
        loader.begin_epoch(0, False, 0)
        images, labels, dims = loader.next_batch(10)
        # record 4 dropped, not fed as a black image
        assert len(images) == 9
        assert 4.0 not in labels.tolist()
        assert (labels >= 0).all()
        assert loader.records_consumed == 10  # corrupt one still consumed
        return labels

    def test_python_loader_skips(self, corrupt_rec):
        from resnet_tpu.data.native import PythonRecordLoader
        labels = self._loader_case(PythonRecordLoader, corrupt_rec)
        assert labels.tolist() == [0, 1, 2, 3, 5, 6, 7, 8, 9]

    def test_native_loader_skips(self, corrupt_rec):
        from resnet_tpu.data.native import (NativeRecordLoader,
                                            NativeUnavailable)
        try:
            labels = self._loader_case(NativeRecordLoader, corrupt_rec)
        except NativeUnavailable:
            pytest.skip("native loader unavailable")
        assert labels.tolist() == [0, 1, 2, 3, 5, 6, 7, 8, 9]

    def test_train_stream_drops_short_tail(self, corrupt_rec):
        """10 records, 1 corrupt, bs=5: batch 1 tops up from the stream
        (5 good records consumed across 6), the tail has only 4 left ->
        dropped; no zero-padded/masked train batch is ever emitted."""
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        cfg = Config()
        cfg.data.data_dir = corrupt_rec
        cfg.data.train_rec = "train.rec"
        cfg.data.image_shape = (32, 32, 3)
        cfg.data.shuffle = False
        cfg.train.batch_size = 5
        it = RecordIter(cfg, train=True)
        batches = list(it.epoch_iter(0))
        assert len(batches) == 1
        assert batches[0]["image"].shape[0] == 5
        assert "mask" not in batches[0]
        assert batches[0]["label"].tolist() == [0, 1, 2, 3, 5]
        # cursor counts consumed records (6: five good + one corrupt)
        assert it.state_dict()["record"] == 6

    def test_mid_epoch_resume_with_corrupt_records(self, corrupt_rec):
        """Resume must seek by consumed records, not batch*bs."""
        from resnet_tpu.config import Config
        from resnet_tpu.data.pipeline import RecordIter
        cfg = Config()
        cfg.data.data_dir = corrupt_rec
        cfg.data.train_rec = "train.rec"
        cfg.data.image_shape = (32, 32, 3)
        cfg.data.shuffle = False
        cfg.train.batch_size = 3
        it = RecordIter(cfg, train=True)
        gen = it.epoch_iter(0)
        first = next(gen)  # consumes 0,1,2
        second = next(gen)  # consumes 3,4(corrupt),5 -> tops up with 6
        assert second["label"].tolist() == [3.0, 5.0, 6.0]
        state = it.state_dict()
        assert state["record"] == 7
        rest_original = [b["label"].tolist() for b in gen]

        it2 = RecordIter(cfg, train=True)
        it2.load_state_dict(state)
        rest_resumed = [b["label"].tolist() for b in it2.epoch_iter(0)]
        assert rest_resumed == rest_original == [[7.0, 8.0, 9.0]]
