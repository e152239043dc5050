"""Width-packed convolution: fold W-pixel pairs into channels to feed the
MXU full 128-wide tiles at nfc=64.

Motivation (measured, benchmarks/conv_micro*.py, BENCHMARKS.md r2): at the
default nfc=64 a 3x3x3 conv sustains ~26 TF/s on v5e because C=64 fills
half the 128-lane MXU tile, while the same conv at C=128 sustains ~72
TF/s; output-channel widening is nearly free (the conv is input-window
bound).  Packing adjacent W pixels into channels doubles both channel
dims at the cost of structurally-zero kernel blocks (1.33x FLOPs) — a
net ~2x predicted wall-time win per conv.

This is an *execution-path* transform, not a model change: packed
forwards consume the exact same parameter trees as the unpacked modules
and are numerically identical up to f32 summation order (tested in
tests/test_wpack.py).  No reference counterpart — the reference's cuDNN
convs pick tiles internally (train_video.py uses stock torch Conv3d).

Representations (channels-last, W = second-to-last axis, C = last):

* ``Q(x)``: x zero-padded by (1, 1) along W, then pairs folded:
  column q holds (x_ext[2q], x_ext[2q+1]) as channels [0:C] / [C:2C].
  Width (W+2)/2; requires W even.
* ``P(y)``: unpadded pair packing: column m = (y[2m], y[2m+1]).
  Width W/2.

A packed conv maps Q(x) -> P(y) with a VALID 2-tap kernel along packed W
(T/H keep their symmetric SAME padding); ``rephase`` converts P -> Q for
the next conv with one column-shift + channel-half swap (no unpacking).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "can_wpack",
    "qpack",
    "unpack_p",
    "rephase",
    "pack_kernel",
    "pack_bias",
    "conv_packed",
]


def can_wpack(x_shape, min_w: int = 64) -> bool:
    """Packed path applies when W is even and large enough to matter."""
    w = x_shape[-2]
    return w % 2 == 0 and w >= min_w


def qpack(x: jnp.ndarray) -> jnp.ndarray:
    """(..., W, C) -> Q-rep (..., (W+2)/2, 2C).  W must be even."""
    w, c = x.shape[-2], x.shape[-1]
    assert w % 2 == 0, f"wpack needs even W, got {w}"
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (0, 0)]
    x = jnp.pad(x, pad)
    return x.reshape(*x.shape[:-2], (w + 2) // 2, 2 * c)


def unpack_p(y: jnp.ndarray) -> jnp.ndarray:
    """P-rep (..., M, 2C) -> (..., 2M, C)."""
    m, c2 = y.shape[-2], y.shape[-1]
    c = c2 // 2
    return y.reshape(*y.shape[:-2], m, 2, c).reshape(*y.shape[:-2], 2 * m, c)


def rephase(p: jnp.ndarray) -> jnp.ndarray:
    """P-rep of y -> Q-rep of y (i.e. re-introduce the (1,1) W zero-pad).

    Q(y)[q] = (y[2q-1], y[2q]) = (P[q-1] second half, P[q] first half),
    zero-filled at the boundaries.  One column shift + channel-half swap —
    stays in the packed layout (no lane-crossing reshape).
    """
    c = p.shape[-1] // 2
    shift = [(0, 0)] * (p.ndim - 2)
    lo = jnp.pad(p[..., c:], shift + [(1, 0), (0, 0)])   # width M+1
    hi = jnp.pad(p[..., :c], shift + [(0, 1), (0, 0)])   # width M+1
    return jnp.concatenate([lo, hi], axis=-1)


def pack_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(kt, kh, 3, Ci, Co) [or (kh, 3, Ci, Co) for 2D] ->
    (kt, kh, 2, 2Ci, 2Co) packed kernel mapping Q -> P.

    Derivation: with x_ext = pad(x, (1,1)) and y[w] = sum_dw K[dw]
    x_ext[w+dw], the packed output column w' covers (y[2w'], y[2w'+1])
    from packed input taps q in {w', w'+1}:

      p=0: dw=0 -> (q0, pin0), dw=1 -> (q0, pin1), dw=2 -> (q1, pin0)
      p=1: dw=0 -> (q0, pin1), dw=1 -> (q1, pin0), dw=2 -> (q1, pin1)

    Blocks are laid out [pin, ci] x [p, co]; 2 of 8 blocks are zero.
    """
    assert k.shape[-3] == 3, f"wpack supports ker_size 3 along W, got {k.shape}"
    k0, k1, k2 = k[..., 0, :, :], k[..., 1, :, :], k[..., 2, :, :]
    zeros = jnp.zeros_like(k0)
    q0 = jnp.concatenate([jnp.concatenate([k0, zeros], -1),
                          jnp.concatenate([k1, k0], -1)], -2)
    q1 = jnp.concatenate([jnp.concatenate([k2, k1], -1),
                          jnp.concatenate([zeros, k2], -1)], -2)
    return jnp.stack([q0, q1], axis=-3)


def pack_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(Co,) -> (2Co,): output blocks are [p=0 | p=1] of the same channels."""
    return jnp.concatenate([b, b])


def conv_packed(xq: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                dtype=None) -> jnp.ndarray:
    """Q-rep input + *unpacked* kernel (.., 3, Ci, Co) -> P-rep output.

    T/H (all leading spatial dims) get symmetric SAME padding for their
    kernel extent; packed W is VALID over the 2 packed taps.  ``dtype``
    mirrors flax.nn.Conv's compute-dtype promotion (bf16 convs keep f32
    params).
    """
    kq = pack_kernel(kernel)
    ndim = kq.ndim - 2  # spatial dims incl. packed W
    if dtype is not None:
        xq = xq.astype(dtype)
        kq = kq.astype(dtype)
    dims = ("NHWC", "HWIO", "NHWC") if ndim == 2 else ("NTHWC", "THWIO",
                                                       "NTHWC")
    dn = jax.lax.conv_dimension_numbers(xq.shape, kq.shape, dims)
    pads = [(s // 2, s // 2) for s in kq.shape[:ndim - 1]] + [(0, 0)]
    y = jax.lax.conv_general_dilated(
        xq, kq, window_strides=(1,) * ndim, padding=pads,
        dimension_numbers=dn)
    if bias is not None:
        y = y + pack_bias(bias).astype(y.dtype)
    return y
