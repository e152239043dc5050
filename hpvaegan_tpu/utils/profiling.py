"""Profiling helpers (SURVEY §5.1 — absent in the reference).

Two tools:
* ``trace(logdir)`` — context manager around ``jax.profiler`` for full XLA
  traces viewable in TensorBoard/Perfetto.
* ``StepTimer`` — cheap wall-clock step statistics for the training loop.
  Through remote TPU transports, async dispatch makes naive per-step timing
  meaningless; the timer therefore reports dispatch-rate AND periodically
  synchronizes on a fetched scalar to give honest amortized step times.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax.profiler
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Amortized steps/sec with periodic device synchronization."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._count = 0
        self._t0: Optional[float] = None
        self.steps_per_sec = float("nan")

    def step(self, sync_value=None) -> None:
        """Call once per iteration; pass a device scalar (e.g. the loss)
        every so often to serialize against the device."""
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self._count += 1
        if sync_value is not None and self._count % self.sync_every == 0:
            float(sync_value)  # device fence
            dt = time.perf_counter() - self._t0
            self.steps_per_sec = self._count / dt

    def reset(self) -> None:
        self._count = 0
        self._t0 = None
