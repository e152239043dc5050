"""align_corners=True separable linear resize, built for the TPU MXU.

The reference resizes with ``F.interpolate(mode='bilinear'/'trilinear',
align_corners=True)`` (utils/images.py:9-26).  XLA's ``jax.image.resize`` is
align_corners=False (half-pixel), so instead of a gather-based port we express
each axis resize as a dense (out, in) interpolation matrix and contract it
with the tensor — resizing becomes a chain of matmuls that XLA tiles straight
onto the MXU.  For pyramid sizes (<=256) the dense matrix is tiny, is built
once per (in, out) pair at trace time (static shapes), and fuses with
surrounding elementwise work.

Numerical contract (verified against torch in tests/test_resize.py):
linear interpolation with source coordinate ``i * (in-1) / (out-1)``
(align_corners=True), no antialiasing on downsample — exactly torch's
behavior for these modes.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "interp_matrix",
    "resize_axis",
    "resize_linear",
    "interpolate_2d",
    "interpolate_3d",
    "upscale_2d",
    "upscale_3d",
]


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) align_corners=True linear interp matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        # torch maps the single output to source coordinate 0
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def interp_matrix(in_size: int, out_size: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(in_size, out_size), dtype=dtype)


def resize_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Resize one axis via a matmul with the interp matrix."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = interp_matrix(in_size, out_size, dtype=x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = moved @ m.T            # (..., in) @ (in, out) -> (..., out)  [MXU]
    return jnp.moveaxis(out, -1, axis)


def resize_linear(x: jnp.ndarray, sizes: Sequence[int],
                  axes: Sequence[int]) -> jnp.ndarray:
    """Separable align_corners=True linear resize over the given axes.

    Axes are processed shrink-first so the intermediate tensors are as small
    as possible (pure FLOP/bandwidth optimization; result is identical).
    """
    order = sorted(range(len(axes)), key=lambda i: sizes[i] / x.shape[axes[i]])
    for i in order:
        x = resize_axis(x, sizes[i], axes[i])
    return x


def interpolate_2d(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or NTHWC, applied per-frame) tensors.

    Mirrors utils/images.py:9-19: 5-D input is treated as a batch of frames
    and resized spatially only.
    """
    if x.ndim == 4:      # NHWC
        return resize_linear(x, size, axes=(1, 2))
    if x.ndim == 5:      # NTHWC — per-frame bilinear
        return resize_linear(x, size, axes=(2, 3))
    raise ValueError(f"expected 4D/5D, got {x.ndim}D")


def interpolate_3d(x: jnp.ndarray, size: Tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear resize of NTHWC tensors (utils/images.py:22-26)."""
    if x.ndim != 5:
        raise ValueError("input must be 5D (B, T, H, W, C)")
    return resize_linear(x, size, axes=(1, 2, 3))


def upscale_2d(image: jnp.ndarray, index: int, pyramid) -> jnp.ndarray:
    """Resize an image to pyramid level ``index`` (utils/images.py:96-105)."""
    assert index > 0
    return interpolate_2d(image, pyramid.shape2d(index))


def upscale_3d(video: jnp.ndarray, index: int, pyramid) -> jnp.ndarray:
    """Joint space-time resize to level ``index`` (utils/images.py:83-93)."""
    assert index > 0
    return interpolate_3d(video, pyramid.shape3d(index))
