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
from typing import Optional, Tuple

import jax
import numpy as np

__all__ = ["BatchLoader"]


class BatchLoader:
    """Infinite iterator over (real, real_zero) device batches.

    Every draw (shuffle order, hflip coins) is a PURE FUNCTION of
    (seed, batch index) — the same (seed, iteration)-keyed construction as
    the device cache (data/device_cache.py), so a mid-scale resume with
    ``start_iteration`` consumes exactly the batches the uninterrupted run
    would have (tests/test_noise_and_data.py::
    test_loader_start_iteration_resumes_stream).
    Epoch/shuffle/drop_last semantics match the reference DataLoader
    (train_video.py:364-368): epoch e is permutation(n) under key
    (seed, 'perm', e), consumed in full batches."""

    def __init__(self, dataset, batch_size: int, seed: int,
                 scale_idx: int, prefetch: int = 2, device=None,
                 start_iteration: int = 0):
        """``device`` may be a Device, a Sharding, or a callable
        (array -> placed array) applied to each batch element."""
        self.dataset = dataset
        self.batch_size = batch_size
        self._seed = int(seed)
        self.scale_idx = scale_idx
        self.device = device
        self._it0 = int(start_iteration)
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _indices_for(self, it: int, n: int,
                     perm_memo: dict) -> np.ndarray:
        if n < self.batch_size:
            # The reference's DataLoader(drop_last=True) would yield nothing
            # here and spin forever (train_video.py:112-115); we sample with
            # replacement instead so tiny --data-rep configs still train.
            rng = np.random.default_rng([self._seed, 1, it])
            return rng.integers(0, n, self.batch_size)
        per_epoch = n // self.batch_size  # drop_last=True: full batches only
        epoch, slot = divmod(it, per_epoch)
        if perm_memo.get("epoch") != epoch:
            perm_memo["epoch"] = epoch
            perm_memo["perm"] = np.random.default_rng(
                [self._seed, 2, epoch]).permutation(n)
        start = slot * self.batch_size
        return perm_memo["perm"][start:start + self.batch_size]

    def _worker(self) -> None:
        try:
            n = len(self.dataset)
            if n <= 0:
                raise ValueError(
                    "dataset is empty — for videos this means the clip has "
                    "<= fps_lcm frames (datasets/video.py:41-42 semantics)")
            it = self._it0
            perm_memo: dict = {}
            while not self._stop.is_set():
                indices = self._indices_for(it, n, perm_memo)
                real, real_zero = self.dataset.batch(
                    np.random.default_rng([self._seed, 3, it]), indices,
                    self.scale_idx)
                it += 1
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
