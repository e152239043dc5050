"""Multi-host initialization (SURVEY §5.8: jax.distributed + XLA
collectives over ICI/DCN replace the reference's single-process
DataParallel).

Single-slice TPU pods need no explicit setup — ``jax.devices()`` sees every
chip on the host and the mesh in ``parallel/mesh.py`` covers them.  For
multi-host (pod slices / multi-slice DCN), call ``maybe_initialize`` once at
entry-point startup: it wires jax.distributed from the standard TPU
environment (or explicit coordinator args) and returns the process info.

This path cannot be exercised in a single-host environment; it is thin
plumbing over ``jax.distributed.initialize`` kept separate so the trainers
stay host-count agnostic: global batch stays sharded over the 'data' mesh
axis, and gradient all-reduces ride the same sharded-autodiff collectives
regardless of process count.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

__all__ = ["maybe_initialize"]


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Returns (process_index, process_count).
    """
    import jax

    explicit = coordinator_address is not None
    env_hint = any(k in os.environ for k in
                   ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if explicit or env_hint:
        kwargs = {}
        if explicit:
            kwargs = dict(coordinator_address=coordinator_address,
                          num_processes=num_processes,
                          process_id=process_id)
        try:
            jax.distributed.initialize(**kwargs)
            logging.info(
                f"jax.distributed initialized: process "
                f"{jax.process_index()}/{jax.process_count()}")
        except Exception as exc:  # already initialized / single host
            logging.warning(f"jax.distributed.initialize skipped: {exc}")
    return jax.process_index(), jax.process_count()
