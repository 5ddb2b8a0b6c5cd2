"""ctypes binding for the native ingest library (_native/recordio_loader.cc).

The Python↔C boundary of the data plane: calls release the GIL (ctypes
does this for us), so the C++ decode pool runs concurrently with the
training loop's dispatch thread. Auto-builds the .so on first use via the
Makefile (g++ is a baked dependency of this image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librecordio_loader.so")
_build_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def ensure_built(force: bool = False) -> str:
    src = os.path.join(_NATIVE_DIR, "recordio_loader.cc")
    if force or (not os.path.exists(_SO_PATH)
                 or os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
        with _build_lock:
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, text=True)
            except (subprocess.CalledProcessError, OSError) as e:
                detail = getattr(e, "stderr", str(e))
                raise NativeUnavailable(
                    f"native loader build failed: {detail}") from e
    return _SO_PATH


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        path = ensure_built()
        lib = ctypes.CDLL(path)
        lib.rtpu_open.restype = ctypes.c_int
        lib.rtpu_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.rtpu_num_records.restype = ctypes.c_long
        lib.rtpu_num_records.argtypes = [ctypes.c_void_p]
        lib.rtpu_begin_epoch.restype = ctypes.c_int
        lib.rtpu_begin_epoch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint]
        lib.rtpu_next_batch.restype = ctypes.c_int
        lib.rtpu_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int)]
        lib.rtpu_close.restype = None
        lib.rtpu_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class PythonRecordLoader:
    """Pure-Python fallback with the NativeRecordLoader interface.

    PIL decode + NumPy bilinear canvas; used when the C++ build is
    unavailable (and as an independent test double for the native path —
    SURVEY.md §7.5)."""

    def __init__(self, rec_path: str, idx_path: Optional[str],
                 canvas_hw: Tuple[int, int], threads: int = 0,
                 num_parts: int = 1, part_index: int = 0):
        from resnet_tpu.data.recordio import RecordIOReader
        self._reader = RecordIOReader(rec_path, idx_path)
        if self._reader.offsets is None:
            self._reader.scan_offsets()
        self._offsets = self._reader.offsets[part_index::num_parts]
        self.canvas_hw = canvas_hw
        self.num_records = len(self._offsets)
        self._order = np.arange(self.num_records)
        self._cursor = 0

    def begin_epoch(self, epoch: int, shuffle: bool, seed: int) -> None:
        self._cursor = 0
        self._order = np.arange(self.num_records)
        if shuffle:
            np.random.default_rng((seed, epoch)).shuffle(self._order)

    def next_batch(self, batch_size: int):
        import io as _io

        from PIL import Image

        from resnet_tpu.data.recordio import unpack_image_record
        h, w = self.canvas_hw
        todo = min(batch_size, self.num_records - self._cursor)
        images = np.empty((todo, h, w, 3), np.uint8)
        labels = np.empty((todo,), np.float32)
        for i in range(todo):
            off = self._offsets[self._order[self._cursor + i]]
            rec = unpack_image_record(self._reader.read_at(off))
            img = Image.open(_io.BytesIO(rec.image)).convert("RGB")
            iw, ih = img.size
            scale = max(h / ih, w / iw)
            rw, rh = max(w, round(iw * scale)), max(h, round(ih * scale))
            img = img.resize((rw, rh), Image.BILINEAR)
            x0, y0 = (rw - w) // 2, (rh - h) // 2
            images[i] = np.asarray(img)[y0:y0 + h, x0:x0 + w]
            labels[i] = rec.label
        self._cursor += todo
        return images, labels

    def close(self) -> None:
        self._reader.close()


def make_record_loader(rec_path: str, idx_path: Optional[str],
                       canvas_hw: Tuple[int, int], threads: int = 4,
                       num_parts: int = 1, part_index: int = 0):
    """Native loader, falling back to pure Python if the build fails."""
    try:
        return NativeRecordLoader(rec_path, idx_path, canvas_hw, threads,
                                  num_parts, part_index)
    except NativeUnavailable:
        return PythonRecordLoader(rec_path, idx_path, canvas_hw, threads,
                                  num_parts, part_index)


class NativeRecordLoader:
    """One .rec shard -> uint8 canvas batches, decoded by the C++ pool."""

    def __init__(self, rec_path: str, idx_path: Optional[str],
                 canvas_hw: Tuple[int, int], threads: int = 4,
                 num_parts: int = 1, part_index: int = 0):
        lib = get_lib()
        handle = ctypes.c_void_p()
        rc = lib.rtpu_open(
            rec_path.encode(), (idx_path or "").encode(),
            canvas_hw[0], canvas_hw[1], threads, num_parts, part_index,
            ctypes.byref(handle))
        if rc != 0:
            raise IOError(f"rtpu_open({rec_path}) failed rc={rc}")
        self._lib = lib
        self._h = handle
        self.canvas_hw = canvas_hw
        self.num_records = int(lib.rtpu_num_records(self._h))

    def begin_epoch(self, epoch: int, shuffle: bool, seed: int) -> None:
        self._lib.rtpu_begin_epoch(self._h, epoch, int(shuffle),
                                   seed & 0xFFFFFFFF)

    def next_batch(self, batch_size: int):
        """Returns (images uint8 (n,H,W,3), labels float32 (n,)) with
        n <= batch_size; n < batch_size means epoch exhausted."""
        h, w = self.canvas_hw
        images = np.empty((batch_size, h, w, 3), np.uint8)
        labels = np.empty((batch_size,), np.float32)
        count = ctypes.c_int(0)
        rc = self._lib.rtpu_next_batch(
            self._h, batch_size,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(count))
        n = count.value
        if rc < 0:
            # -rc records failed to decode (zero-filled, label -1)
            pass
        return images[:n], labels[:n]

    def close(self) -> None:
        if self._h:
            self._lib.rtpu_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
