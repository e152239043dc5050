"""HBM-OOM fallback ladder shared by both trainers.

On TPU, a step program that exceeds HBM raises at COMPILE time (the
executable's static memory assignment fails) — before any donated input
buffer is consumed — so the dispatch can safely escalate one memory
mechanism and rebuild the scale's step programs:

    (plain) -> --remat -> --gp-chunked -> --remat-blocks

Each rung is gradient-exact (tests/test_remat.py); the ladder stops
escalating once all three are enabled and re-raises.

Rung order is measured, not guessed: at pyramid scale 9 (13 frames,
256 px, bf16) remat+gp-chunked runs 0.71 it/s vs remat+remat-blocks
0.50 it/s (BENCHMARKS.md) — the WGAN-GP double-backprop is the dominant
HBM peak, so chunking it per-sample both frees more memory and costs
less recompute than per-conv-block remat.  (For the BatchNorm baselines
critic the GP stays batched — train-mode stats couple samples — so that
rung is a no-op there and the ladder escalates once more to
--remat-blocks.)
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict

__all__ = ["oom_dispatch", "is_hbm_oom", "escalate"]


def is_hbm_oom(exc: BaseException) -> bool:
    msg = str(exc)
    if "RESOURCE_EXHAUSTED" in msg or "Ran out of memory" in msg:
        return True
    # Through the axon remote-compile relay an HBM OOM is reported as an
    # opaque INTERNAL error ("remote_compile: HTTP 500: tpu_compile_helper
    # subprocess exit code 1"); the real "Ran out of memory in hbm" detail
    # is printed by the relay, not carried in the exception.  A compile-time
    # HTTP 500 on a step family that compiled at smaller scales is
    # overwhelmingly an OOM, so the ladder treats it as one — worst case a
    # genuine compiler bug re-raises after all three rungs are enabled.
    return ("remote_compile" in msg
            and "tpu_compile_helper subprocess exit code 1" in msg)


def escalate(cfg) -> str | None:
    """Enable the next memory rung on ``cfg`` (measured order, see module
    docstring); returns its description, or None when all three are already
    on.  Shared by the runtime dispatch below and the compile-ahead thread
    (train/precompile.py), which discovers next-scale OOMs off the critical
    path."""
    if cfg.remat and cfg.remat_blocks and cfg.gp_chunked:
        return None
    if not cfg.remat:
        cfg.remat = True
        return "rematerialization (--remat)"
    if not cfg.gp_chunked:
        cfg.gp_chunked = True
        return "per-sample gradient penalty (--gp-chunked)"
    cfg.remat_blocks = True
    return "per-block rematerialization (--remat-blocks)"


def oom_dispatch(cfg, scale_idx: int,
                 rebuild: Callable[[], Dict[str, Callable]]):
    """Returns ``dispatch(name, *args)`` running ``rebuild()``'s steps with
    automatic memory-ladder escalation on compile-time HBM OOM."""
    steps = rebuild()

    def dispatch(name: str, *args, **kwargs) -> Any:
        nonlocal steps
        try:
            return steps[name](*args, **kwargs)
        except Exception as e:  # jaxlib XlaRuntimeError has no stable import
            if not is_hbm_oom(e):
                raise
            what = escalate(cfg)
            if what is None:
                raise
            logging.warning(
                f"scale {scale_idx}: step does not fit HBM — enabling "
                f"{what} and recompiling")
            steps = rebuild()
            return dispatch(name, *args, **kwargs)

    return dispatch
