"""Record-backed input pipeline: native decode pool + prefetch thread.

The rebuild of ``mx.io.ImageRecordIter``'s runtime behaviour
(SURVEY.md §3.3): a background thread drives the C++ decode pool
(data/_native) and keeps ``prefetch_buffer`` canvas batches queued; the
training loop pops ready batches. Decode of batch N+1 overlaps both the
host dispatch and the device compute of batch N. Augmentation happens on
device (ops/augment.py) — never here.

Shard sets: ``train_rec`` may be a single file, a glob (``train_*.rec``),
or an ``im2rec``-style prefix whose ``<prefix>_NNN.rec`` shards are
discovered automatically — the multi-shard packs the reference's
ImageRecordIter consumes (mxnet src/io/iter_image_recordio_2.cc). Records
are streamed (pread) so arbitrarily large packs train with flat RSS.

Canvas contract: train batches are LETTERBOXED uint8 canvases + per-image
dims, so the on-device random-resized-crop samples the FULL original image
with MXNet's sampling semantics (mxnet src/io/image_aug_default.cc). Val
batches are shorter-side-resized + center-cropped; for 224x224 output the
canvas is 256x256 — the reference's resize-256/crop-224 val transform.

Checkpoint state: ``state_dict()`` returns (epoch, batch) and resume seeks
the deterministic epoch stream to the exact batch — mid-epoch resume
replays the identical remaining stream (stronger than the reference, which
restarts the epoch — SURVEY.md §3.4 quirk).
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

from resnet_tpu.config import DataConfig
from resnet_tpu.data.loader import DataIter


def canvas_size(out_hw: Tuple[int, int],
                override: int = 0) -> Tuple[int, int]:
    """256 for 224 (the standard 8/7), identity for small (CIFAR) inputs.

    ``override`` (cfg.data.canvas_size) pins the train canvas edge
    directly — a fidelity/throughput knob: larger canvases preserve more
    source resolution for the on-device crop (less double-resampling vs
    the reference's full-image CPU crops) at a higher decode-resize, H2D
    and augment cost (measured sweep: PERF_NOTES.md).
    """
    if override:
        return override, override
    h, w = out_hw
    if h <= 64 and w <= 64:
        return h, w
    return (h * 8 + 6) // 7, (w * 8 + 6) // 7


def resolve_shards(data_dir: str, name: str) -> List[str]:
    """Resolve a rec spec to an ordered shard list.

    Accepts: a plain file, a glob pattern, or an im2rec prefix — im2rec
    writes ``prefix_000.rec .. prefix_NNN.rec`` when sharding
    (data/im2rec.py), and this finds them when ``prefix.rec`` is absent.
    """
    path = os.path.join(data_dir, name)
    if any(c in name for c in "*?["):
        recs = sorted(glob.glob(path))
    elif os.path.exists(path):
        recs = [path]
    else:
        stem = path[:-4] if path.endswith(".rec") else path
        recs = sorted(glob.glob(stem + "_[0-9]*.rec"))
    if not recs:
        raise FileNotFoundError(f"no .rec shards match {path!r}")
    return recs


class RecordIter(DataIter):
    """DataIter over a .rec shard set via the native loader."""

    def __init__(self, cfg, train: bool, num_parts: int = 1,
                 part_index: int = 0):
        d, t = cfg.data, cfg.train
        recs = resolve_shards(d.data_dir, d.train_rec if train else d.val_rec)
        # honor an explicitly configured index file for a single-file rec
        # (cfg.data.train_idx/val_idx); sharded sets derive per-shard names.
        # The configured name only WINS over the rec's own derived sibling
        # .idx when the user actually set it (name differs from the
        # dataclass default) or the sibling is absent — otherwise a stale
        # default-named train.idx from another dataset in the same dir
        # would silently pair with custom.rec and corrupt every offset.
        cfg_name = d.train_idx if train else d.val_idx
        default_name = (DataConfig.train_idx if train else DataConfig.val_idx)
        cfg_idx = os.path.join(d.data_dir, cfg_name)
        idxs = []
        for rec in recs:
            idx = rec[:-4] + ".idx" if rec.endswith(".rec") else rec + ".idx"
            if (len(recs) == 1 and os.path.exists(cfg_idx)
                    and (cfg_name != default_name
                         or not os.path.exists(idx))):
                idx = cfg_idx
            idxs.append(idx if os.path.exists(idx) else "")
        self.train = train
        self.shuffle = d.shuffle and train
        self.seed = t.seed
        # batch_size is GLOBAL; each host decodes its 1/num_parts slice
        self.batch_size = t.batch_size // max(num_parts, 1)
        self.prefetch_buffer = max(1, d.prefetch_buffer)
        # the canvas override is a TRAIN fidelity knob; the val transform
        # stays at the reference's fixed resize-256/center-crop-224
        self.canvas_hw = canvas_size(
            d.image_shape[:2],
            override=getattr(d, "canvas_size", 0) if train else 0)

        from resnet_tpu.data.native import make_record_loader
        self.loader = make_record_loader(
            recs, idxs, self.canvas_hw, threads=d.preprocess_threads,
            num_parts=num_parts, part_index=part_index,
            letterbox=train)
        # host-side rotate/shear (data/host_warp.py): the reference runs
        # warpAffine in its CPU augmenter threads, and on-device the
        # non-separable warp is a gather (11x step cost — PERF_NOTES.md),
        # so 'host' is the production placement. Train only; params are
        # a pure function of (seed, epoch, batch) so resume replays the
        # identical warp stream.
        self._warp = None
        self._warp_pool = None
        if (train and getattr(d, "rotate_backend", "host") == "host"
                and (d.max_rotate_angle > 0 or d.max_shear_ratio > 0)):
            from concurrent.futures import ThreadPoolExecutor
            self._warp = (d.max_rotate_angle, d.max_shear_ratio)
            self._warp_pool = ThreadPoolExecutor(
                max_workers=max(1, d.preprocess_threads))
        n = self.loader.num_records
        if train:
            self.steps_per_epoch = max(n // self.batch_size, 1)
        else:
            self.steps_per_epoch = (n + self.batch_size - 1) \
                // self.batch_size
        self._epoch = 0
        self._batches_done = 0
        self._records_done = 0   # records CONSUMED (incl. corrupt-dropped)
        self._resume = None  # (epoch, batch, record) to seek on epoch_iter

    # -- iteration ---------------------------------------------------------

    def _fill_batch(self):
        """Accumulate loader output until the batch is full or the epoch
        ends (corrupt records are dropped by the loader; the reference
        tops the batch up with the next records — match that)."""
        bs = self.batch_size
        parts = []
        have = 0
        while have < bs:
            out = self.loader.next_batch(bs - have)
            images, labels, dims = out
            if len(images) == 0:
                break
            parts.append((images, labels, dims))
            have += len(images)
        if not parts:
            return None
        if len(parts) == 1:
            # the common no-corrupt-records case: no copy
            return parts[0]
        images = np.concatenate([p[0] for p in parts])
        labels = np.concatenate([p[1] for p in parts])
        dims = (np.concatenate([p[2] for p in parts])
                if parts[0][2] is not None else None)
        return images, labels, dims

    def epoch_iter(self, epoch: int) -> Iterator[dict]:
        self._epoch = epoch
        self._batches_done = 0
        self._records_done = 0
        self.loader.begin_epoch(epoch, self.shuffle, self.seed)
        start_batch = 0
        start_record = 0
        if self._resume and self._resume[0] == epoch and self._resume[1]:
            # mid-epoch resume: seek the deterministic stream by RECORDS
            # consumed (not batch*bs — corrupt-record drops make a batch
            # consume more than batch_size records)
            start_batch = min(self._resume[1], self.steps_per_epoch)
            start_record = self._resume[2]
            self.loader.skip(start_record)
            self._batches_done = start_batch
            self._records_done = start_record
        self._resume = None
        # batch-index -> cumulative records map for cursor_state(): the
        # prefetch queue pulls this generator AHEAD of the train step, so a
        # mid-epoch checkpoint needs the record count as of the CONSUMED
        # batch, not the latest produced one
        self._cursor_hist = {start_batch: start_record}
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_buffer)
        stop = threading.Event()

        def producer():
            # producer-local cumulative count: the self._records_done
            # fallback would read a consumer-updated field from this thread
            # and undercount by up to the prefetch depth (corrupting the
            # mid-epoch resume seek for loaders lacking records_consumed)
            local_consumed = start_record
            try:
                for k in range(start_batch, self.steps_per_epoch):
                    if stop.is_set():
                        return
                    out = self._fill_batch()
                    if out is None:
                        break
                    if self.train and len(out[0]) < self.batch_size:
                        # drop the corrupt-shortened tail batch: training
                        # on a zero-padded batch would bias gradients, and
                        # a new 'mask' pytree key would recompile the step
                        break
                    if self._warp is not None:
                        from resnet_tpu.data import host_warp
                        angles, shears = host_warp.batch_params(
                            self.seed, epoch, k, len(out[0]), *self._warp)
                        out = (host_warp.warp_batch(
                            out[0], angles, shears, self._warp_pool),
                            out[1], out[2])
                    local_consumed += len(out[0])
                    consumed = getattr(self.loader, "records_consumed",
                                       local_consumed)
                    q.put((self._to_batch(*out), consumed))
            finally:
                q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                batch, consumed = item
                self._batches_done += 1
                self._records_done = consumed
                self._cursor_hist[self._batches_done] = consumed
                yield batch
        finally:
            stop.set()
            # drain so the producer can finish putting
            while th.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    th.join(timeout=0.1)

    def _to_batch(self, images: np.ndarray, labels: np.ndarray,
                  dims: Optional[np.ndarray]) -> dict:
        n = len(images)
        bs = self.batch_size
        batch = {"image": images, "label": labels.astype(np.int32)}
        if dims is not None:
            batch["dims"] = dims
        if n < bs:
            # pad + mask (val tail; the reference pads by wrapping — we mask)
            pad = bs - n
            batch["image"] = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], np.uint8)])
            batch["label"] = np.concatenate(
                [batch["label"], np.zeros(pad, np.int32)])
            batch["mask"] = np.concatenate(
                [np.ones(n, np.float32), np.zeros(pad, np.float32)])
            if dims is not None:
                batch["dims"] = np.concatenate(
                    [dims, np.ones((pad, 4), np.int32)])
        elif not self.train:
            batch["mask"] = np.ones(bs, np.float32)
        return batch

    # -- checkpoint state --------------------------------------------------

    def state_dict(self) -> dict:
        return {"epoch": self._epoch, "batch": self._batches_done,
                "record": self._records_done}

    def cursor_state(self, nbatch: int) -> dict:
        """Cursor for "``nbatch`` batches consumed" (see DataIter docs).

        The record count comes from the per-batch history; for batches
        produced before this process (shouldn't happen) fall back to the
        no-drop estimate nbatch*batch_size.
        """
        hist = getattr(self, "_cursor_hist", {})
        record = hist.get(nbatch, nbatch * self.batch_size)
        for k in [k for k in hist if k < nbatch]:   # prune consumed entries
            del hist[k]
        return {"epoch": self._epoch, "batch": nbatch, "record": record}

    def load_state_dict(self, state: dict) -> None:
        self._epoch = state.get("epoch", 0)
        batch = state.get("batch", 0)
        # older checkpoints lack the record cursor: batch*bs is exact when
        # no records were dropped (the only case those checkpoints saw)
        record = state.get("record", batch * self.batch_size)
        self._resume = (self._epoch, batch, record)
