"""Noise generation with explicit PRNG keys.

The reference samples from torch's global RNG (utils/images.py:39-57).  The
TPU-native rebuild threads explicit ``jax.random`` keys everywhere so jitted
steps are pure and reproducible across hosts/devices.  The quirky reference
semantics are preserved: the (sic) ``'benoulli'`` type name is accepted, and
unknown types fall through to uniform.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["generate_noise"]


def generate_noise(key: jax.Array, ref: Optional[jnp.ndarray] = None,
                   size: Optional[Sequence[int]] = None, type: str = "normal",
                   emb_size: Optional[int] = None,
                   dtype=jnp.float32) -> jnp.ndarray:
    """N(0,1) noise shaped like ``ref`` or ``size`` (utils/images.py:39-57)."""
    if ref is not None:
        shape = ref.shape
        dtype = ref.dtype
    elif size is not None:
        shape = tuple(size)
    else:
        raise ValueError("ref or size must be applied")

    if type == "normal":
        return jax.random.normal(key, shape, dtype=dtype)
    if type in ("benoulli", "bernoulli"):  # reference typo kept as alias
        return jax.random.bernoulli(key, 0.5, shape).astype(dtype)
    if type == "int":
        assert emb_size is not None and size is not None
        return jax.random.randint(key, shape, 0, emb_size)
    return jax.random.uniform(key, shape, dtype=dtype)  # default == uniform
