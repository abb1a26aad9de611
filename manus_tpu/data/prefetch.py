"""Background-prefetching batch pipeline + native batch assembly.

Replaces the reference's torch DataLoader worker machinery
(train_utils.py:15-27): a producer thread keeps a small queue of ready
batches ahead of the training loop (overlapping host data work with the
TPU step), and the per-view crop assembly runs in the C++ image-ops
library when available (manus_tpu/native), with a numpy fallback.
"""
from __future__ import annotations

import ctypes
import queue
import threading
from typing import Callable, Optional

import numpy as np

from manus_tpu.native import get_lib


def assemble_batch_native(
    crops: list[np.ndarray],  # V x [ch, cw, 4] uint8
    bboxes: np.ndarray,  # [V, 4] int32
    height: int,
    width: int,
    bg: np.ndarray,  # [3] float32
    downscale: int = 1,
    n_threads: int = 4,
):
    """Paste crops into frames, composite, optionally box-downscale.

    Returns (rgb [V, H/k, W/k, 3] f32, mask [V, H/k, W/k, 1] f32).
    """
    v = len(crops)
    lib = get_lib()
    h2, w2 = height // downscale, width // downscale
    if lib is not None:
        flat = np.concatenate([np.ascontiguousarray(c).reshape(-1) for c in crops])
        offsets = np.zeros(v, np.int64)
        sizes = [c.size for c in crops]
        offsets[1:] = np.cumsum(sizes)[:-1]
        rgb = np.empty((v, h2, w2, 3), np.float32)
        mask = np.empty((v, h2, w2, 1), np.float32)
        bg = np.ascontiguousarray(bg, np.float32)
        bboxes = np.ascontiguousarray(bboxes, np.int32)
        ret = lib.assemble_batch(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            v, height, width, downscale,
            bg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_threads,
        )
        if ret == 0:
            return rgb, mask
    # numpy fallback
    rgb = np.broadcast_to(bg, (v, height, width, 3)).copy()
    mask = np.zeros((v, height, width, 1), np.float32)
    for i, crop in enumerate(crops):
        xmin, ymin, xmax, ymax = bboxes[i]
        a = crop[..., 3:].astype(np.float32) / 255.0
        c = crop[..., :3].astype(np.float32) / 255.0
        rgb[i, ymin:ymax, xmin:xmax] = c * a + bg * (1 - a)
        mask[i, ymin:ymax, xmin:xmax] = a
    if downscale > 1:
        rgb = rgb.reshape(v, h2, downscale, w2, downscale, 3).mean((2, 4))
        mask = mask.reshape(v, h2, downscale, w2, downscale, 1).mean((2, 4))
    return rgb.astype(np.float32), mask.astype(np.float32)


class PrefetchLoader:
    """Runs `sample_fn` in a background thread, keeping `depth` batches
    ready so host data work overlaps device steps."""

    def __init__(self, sample_fn: Callable[[], object], depth: int = 2):
        self._sample = sample_fn
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            while not self._stop.is_set():
                batch = self._sample()
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on next __next__
            self._exc = e

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            if self._exc is not None:
                raise self._exc
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                continue

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2.0)
