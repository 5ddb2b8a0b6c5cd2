"""Record-backed input pipeline: native decode pool + prefetch thread.

The rebuild of ``mx.io.ImageRecordIter``'s runtime behaviour
(SURVEY.md §3.3): a background thread drives the C++ decode pool
(data/_native) and keeps ``prefetch_buffer`` canvas batches queued; the
training loop pops ready batches. Decode of batch N+1 overlaps both the
host dispatch and the device compute of batch N. Augmentation happens on
device (ops/augment.py) — never here.

Canvas contract: train AND val batches are fixed-size uint8 NHWC canvases
(shorter-side-resized + center-cropped by the native code). The on-device
augmenter random-resized-crops from the canvas (train) or center-crops
(val). For 224x224 output the canvas is 256x256 — the classic 8/7 ratio the
reference's val pipeline uses (resize 256, crop 224).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Tuple

import numpy as np

from resnet_tpu.data.loader import DataIter


def canvas_size(out_hw: Tuple[int, int]) -> Tuple[int, int]:
    """256 for 224 (the standard 8/7), identity for small (CIFAR) inputs."""
    h, w = out_hw
    if h <= 64 and w <= 64:
        return h, w
    return (h * 8 + 6) // 7, (w * 8 + 6) // 7


class RecordIter(DataIter):
    """DataIter over a .rec shard via the native loader."""

    def __init__(self, cfg, train: bool, num_parts: int = 1,
                 part_index: int = 0):
        d, t = cfg.data, cfg.train
        rec = os.path.join(d.data_dir, d.train_rec if train else d.val_rec)
        idx = os.path.join(d.data_dir, d.train_idx if train else d.val_idx)
        if not os.path.exists(idx):
            idx = None
        self.train = train
        self.shuffle = d.shuffle and train
        self.seed = t.seed
        # batch_size is GLOBAL; each host decodes its 1/num_parts slice
        self.batch_size = t.batch_size // max(num_parts, 1)
        self.prefetch_buffer = max(1, d.prefetch_buffer)
        self.canvas_hw = canvas_size(d.image_shape[:2])

        from resnet_tpu.data.native import make_record_loader
        self.loader = make_record_loader(
            rec, idx, self.canvas_hw, threads=d.preprocess_threads,
            num_parts=num_parts, part_index=part_index)
        n = self.loader.num_records
        if train:
            self.steps_per_epoch = max(n // self.batch_size, 1)
        else:
            self.steps_per_epoch = (n + self.batch_size - 1) \
                // self.batch_size

    # -- iteration ---------------------------------------------------------

    def epoch_iter(self, epoch: int) -> Iterator[dict]:
        self._epoch = epoch
        self.loader.begin_epoch(epoch, self.shuffle, self.seed)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_buffer)
        stop = threading.Event()

        def producer():
            try:
                for _ in range(self.steps_per_epoch):
                    if stop.is_set():
                        return
                    images, labels = self.loader.next_batch(self.batch_size)
                    if len(images) == 0:
                        break
                    q.put(self._to_batch(images, labels))
            finally:
                q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can finish putting
            while th.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    th.join(timeout=0.1)

    def _to_batch(self, images: np.ndarray, labels: np.ndarray) -> dict:
        n = len(images)
        bs = self.batch_size
        batch = {"image": images, "label": labels.astype(np.int32)}
        if n < bs:
            # pad + mask (val tail; the reference pads by wrapping — we mask)
            pad = bs - n
            batch["image"] = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], np.uint8)])
            batch["label"] = np.concatenate(
                [batch["label"], np.zeros(pad, np.int32)])
            batch["mask"] = np.concatenate(
                [np.ones(n, np.float32), np.zeros(pad, np.float32)])
        elif not self.train:
            batch["mask"] = np.ones(bs, np.float32)
        return batch

    # -- checkpoint state --------------------------------------------------

    def state_dict(self) -> dict:
        return {"epoch": getattr(self, "_epoch", 0)}

    def load_state_dict(self, state: dict) -> None:
        self._epoch = state.get("epoch", 0)
