"""Batch loader: shuffled epochs, drop_last, background prefetch to device.

Replaces torch DataLoader(shuffle=True, drop_last=True, num_workers=4)
(train_video.py:364-368).  Host assembly is a cheap slice/stack (frames are
pre-normalized per scale), so one background thread that overlaps assembly +
``jax.device_put`` with the device step is enough to hide the host side
entirely — the TPU-native analogue of worker processes.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

__all__ = ["BatchLoader"]


class BatchLoader:
    """Infinite iterator over (real, real_zero) device batches."""

    def __init__(self, dataset, batch_size: int, seed: int,
                 scale_idx: int, prefetch: int = 2, device=None):
        """``device`` may be a Device, a Sharding, or a callable
        (array -> placed array) applied to each batch element."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.scale_idx = scale_idx
        self.device = device
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _index_stream(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        if n <= 0:
            raise ValueError(
                "dataset is empty — for videos this means the clip has "
                "<= fps_lcm frames (datasets/video.py:41-42 semantics)")
        if n < self.batch_size:
            # The reference's DataLoader(drop_last=True) would yield nothing
            # here and spin forever (train_video.py:112-115); we sample with
            # replacement instead so tiny --data-rep configs still train.
            while True:
                yield self.rng.integers(0, n, self.batch_size)
        while True:
            perm = self.rng.permutation(n)
            # drop_last=True: only full batches
            for start in range(0, n - self.batch_size + 1, self.batch_size):
                yield perm[start:start + self.batch_size]

    def _worker(self) -> None:
        try:
            stream = self._index_stream()
            while not self._stop.is_set():
                indices = next(stream)
                real, real_zero = self.dataset.batch(self.rng, indices,
                                                     self.scale_idx)
                if callable(self.device):
                    batch = (self.device(real), self.device(real_zero))
                else:
                    batch = jax.device_put((real, real_zero), self.device)
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # noqa: BLE001 — re-raised in __next__
            self._error = exc

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[jax.Array, jax.Array]:
        # poll so a dead worker surfaces its exception instead of a silent
        # permanent hang on queue.get()
        while True:
            if self._error is not None:
                raise RuntimeError("BatchLoader worker died") from self._error
            try:
                return self._queue.get(timeout=1.0)
            except queue.Empty:
                continue

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
