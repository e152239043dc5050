"""Persistent XLA compilation cache.

Per-scale recompilation is inherent to the progressive pyramid (each scale
has different static shapes); caching compiled executables on disk makes
re-runs, resumes, and benchmarks start in seconds instead of minutes —
especially through remote-compile TPU transports.
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "HPVAEGAN_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hpvaegan_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # unwritable cache dir, or older jax without these flags —
        # degrade to no-cache rather than failing the caller (entry() has
        # no filesystem dependency of its own)
