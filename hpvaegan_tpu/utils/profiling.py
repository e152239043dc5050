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
    """Amortized steps/sec with periodic device synchronization.

    Wired into the trainers' progress bars: through the async-dispatch
    relay, tqdm's own rate measures dispatch speed, not execution speed —
    this timer fences on a fetched scalar every ``sync_every`` steps and
    reports honest throughput."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._count = 0
        self._last_sync = 0
        self._t0: Optional[float] = None
        self._warmed = False
        self.steps_per_sec = float("nan")

    def step(self, sync_value=None, n: int = 1) -> None:
        """Call once per dispatch (``n`` = iterations it covered, e.g. the
        lax.scan chunk size); pass a device scalar (e.g. the loss) to
        serialize against the device every ``sync_every`` steps.

        Everything up to and including the FIRST fence is treated as
        warmup — through the axon relay a fresh process's first scalar
        fetch can stall 10-50 s server-side (and late compiles land
        there too), which would otherwise poison the amortized rate of
        short scales.  The first fence still reports a rate (so runs
        shorter than two fences show *something*), but marks it as
        warmup-inclusive; the second fence onward reports the clean
        post-warmup amortized rate."""
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self._count += n
        if sync_value is not None and \
                self._count - self._last_sync >= self.sync_every:
            float(sync_value)  # device fence
            now = time.perf_counter()
            self.steps_per_sec = self._count / (now - self._t0)
            if not self._warmed:
                self._warmed = True
                self._t0 = now
                self._count = 0
                self._last_sync = 0
                return
            self._last_sync = self._count

    @property
    def suffix(self) -> str:
        """' | N.NN it/s (amortized)' once a fenced measurement exists;
        the first-fence value is flagged '(incl. warmup)' because it still
        contains compiles and the relay's first-fetch stall."""
        if self.steps_per_sec != self.steps_per_sec:  # NaN: no fence yet
            return ""
        if self._warmed and self._last_sync == 0:
            return f" | {self.steps_per_sec:.2f} it/s (incl. warmup)"
        return f" | {self.steps_per_sec:.2f} it/s (amortized)"

    def reset(self) -> None:
        self._count = 0
        self._last_sync = 0
        self._t0 = None
        self._warmed = False
        self.steps_per_sec = float("nan")
