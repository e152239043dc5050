"""Hang watchdog for long TPU runs (SURVEY §5.3 failure detection).

Through the remote TPU relay a dead connection can wedge a device fetch
FOREVER (observed live: a training process blocked in a futex for 75+
minutes with zero CPU, no error ever surfacing).  The reference has no
analogue (eager CPU/CUDA calls fail loudly); through a relay transport,
silent wedges are a real failure mode the framework must convert into a
clean, resumable exit.

``Watchdog`` is a daemon thread that checks a heartbeat the training loop
updates after every dispatched chunk.  If the heartbeat goes stale for
longer than ``timeout_s``, it logs a CRITICAL diagnosis and terminates the
process with exit code 75 (EX_TEMPFAIL) — per-scale checkpoints + resume
(`--netG <experiment>/netG`) make the run preemption-tolerant, so an outer
wrapper can relaunch and lose at most the current scale's progress.

Pick the timeout generously: it must exceed the longest legitimate gap
between completed chunks — a cold XLA compile (~260 s through the relay)
plus the slowest chunk (scale 9 parity: ~2.5 s/iter x scan window).  The
``--watchdog`` default of 0 disables it; 1200 s is a sane production value.
"""
from __future__ import annotations

import logging
import os
import threading
import time

__all__ = ["Watchdog"]


class Watchdog:
    def __init__(self, timeout_s: float, context: str = "",
                 on_fire=None, poll_s: float | None = None):
        """``on_fire(age_s, context)`` overrides the default log+exit(75)
        action (used by tests)."""
        self.timeout_s = float(timeout_s)
        self.context = context
        self._on_fire = on_fire or self._default_fire
        self._poll_s = poll_s if poll_s is not None \
            else max(1.0, self.timeout_s / 4.0)
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "Watchdog":
        if self.timeout_s > 0 and self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True,
                                            name="hang-watchdog")
            self._thread.start()
        return self

    def beat(self, context: str | None = None) -> None:
        """The loop made progress (a chunk's fence returned)."""
        if context is not None:
            self.context = context
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    # ---- internals ----

    def _loop(self) -> None:
        while not self._stop.wait(self._poll_s):
            age = time.monotonic() - self._last
            if age > self.timeout_s:
                self._on_fire(age, self.context)
                return

    @staticmethod
    def _default_fire(age: float, context: str) -> None:
        logging.critical(
            f"watchdog: no training progress for {age:.0f}s "
            f"(last: {context or 'unknown'}) — the TPU relay connection is "
            f"likely wedged.  Exiting 75 (EX_TEMPFAIL); resume from the "
            f"last per-scale checkpoint with --netG <experiment>/netG.")
        logging.shutdown()
        os._exit(75)
