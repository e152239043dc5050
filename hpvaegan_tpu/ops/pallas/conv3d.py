"""Pallas TPU kernel: fused 3x3x3 conv (SAME) + bias + LeakyReLU.

The reference's hot op is the ConvBlock3D stack (conv+norm+act,
networks_3d.py:48-56).  This kernel expresses the 3D convolution the way the
MXU wants it: 27 shifted (rows, C_in) x (C_in, C_out) matmuls accumulated in
f32 VMEM.

Design notes:
* Grid (B, T, H-blocks).  All inputs arrive as *Blocked* views with clamped
  index maps — the pallas pipeline DMAs them; no manual DMA (partial-lane
  slices of <128-channel arrays are not DMA-able on TPU).
* Temporal taps: three views of the input at t-1/t/t+1, edge frames zeroed
  by a scalar mask.
* Spatial H taps: each program assembles an (Hb+2)-row window in scratch
  from its H-block plus two single-row halo views; H shifts become static
  row slices of the window.
* Spatial W taps: ``pltpu.roll`` + an iota edge mask (full-tile accesses).
* Ragged H (H % Hb != 0): rows beyond H are zero-masked on input; output
  writes beyond H are masked by the pipeline itself.

Training integrates via jax.custom_vjp with an XLA backward that recovers
the LeakyReLU mask from the sign of the saved output (``conv3d_lrelu``).
Falls back to the XLA path for T < 3.

Measured on TPU v5e (chained timing, f32, see /tmp history in round-1 log):

  (2, 5, 102, 102, 64->64):  pallas 3.62 ms (6.4 TF/s)   xla 1.11 ms (20.8)
  (2, 13, 256, 256, 64->64): pallas 19.6 ms (19.2 TF/s)  xla 14.4 ms (26.2)
  (2, 4, 33, 33, 64->64):    pallas 2.56 ms              xla 1.39 ms

VERDICT: XLA's conv lowering wins at every pyramid shape (main losses here:
C=64 occupies half the 128-lane MXU, and the per-tap roll+mask VPU work),
so the production path keeps lax.conv and this kernel stays as a validated
reference implementation / optimization testbed rather than the default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_lrelu_pallas", "conv3d_lrelu", "fits_vmem",
           "pick_h_block"]

NEG_SLOPE = 0.2  # reference lrelu slope (networks_3d.py:21)
_VMEM_BUDGET = 9 * 1024 * 1024


def _vmem_cost(hb: int, w: int, c_in: int, c_out: int) -> int:
    cip, cop = max(c_in, 128), max(c_out, 128)
    taps = 2 * 3 * hb * w * cip * 4          # double-buffered pipeline
    halos = 2 * 6 * w * cip * 4
    window = (hb + 2) * w * cip * 4
    acc = hb * w * cop * 4
    out = 2 * hb * w * cop * 4
    weights = 27 * cip * cop * 4
    return taps + halos + window + acc + out + weights


def pick_h_block(h: int, w: int, c_in: int, c_out: int) -> int:
    """Largest H block that fits the VMEM budget (0 if none)."""
    for hb in (128, 64, 32, 16, 8, 4):
        if hb <= h and _vmem_cost(hb, w, c_in, c_out) < _VMEM_BUDGET:
            return hb
    if _vmem_cost(h, w, c_in, c_out) < _VMEM_BUDGET:
        return h
    return 0


def fits_vmem(t: int, h: int, w: int, c_in: int, c_out: int,
              budget_bytes: int = _VMEM_BUDGET) -> bool:
    return pick_h_block(h, w, c_in, c_out) > 0


def _wshift(x: jnp.ndarray, dw: int, w: int) -> jnp.ndarray:
    """(rows, W, C): shift so output col x reads input col x+dw-1, zero
    outside (SAME padding)."""
    s = (1 - dw) % w
    out = pltpu.roll(x, shift=s, axis=1) if s else x
    cols = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], w), 1)
    src = cols + dw - 1
    # cast BEFORE adding the minor dim: Mosaic only reshapes 32-bit vectors
    valid = ((src >= 0) & (src < w)).astype(x.dtype)
    return out * valid[:, :, None]


def _kernel(*refs, t_total: int, h_total: int, hb: int, w: int, c_in: int,
            c_out: int, neg_slope: float):
    (tap_m1, tap_0, tap_p1, top_m1, top_0, top_p1, bot_m1, bot_0, bot_p1,
     w_ref, b_ref, out_ref, win_ref, acc_ref) = refs
    ti = pl.program_id(1)
    hbi = pl.program_id(2)
    row0 = hbi * hb  # global row of this block's first row

    taps = (tap_m1, tap_0, tap_p1)
    tops = (top_m1, top_0, top_p1)
    bots = (bot_m1, bot_0, bot_p1)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 0) + row0

    for dt in range(3):
        if dt == 0:
            t_ok = ti >= 1
        elif dt == 2:
            t_ok = ti < t_total - 1
        else:
            t_ok = ti >= 0  # always true, keeps types uniform
        # ---- assemble the (Hb+2)-row window for this temporal tap ----
        # NOTE: masks use where(), not multiply — out-of-bounds ragged-block
        # reads can be NaN garbage and 0*NaN = NaN.
        body = taps[dt][0, 0]  # (Hb, W, C)
        body_ok = jnp.logical_and(t_ok, (rows < h_total)).astype(
            jnp.float32)[:, :, None]
        win_ref[1:hb + 1] = jnp.where(body_ok > 0, body, 0.0)
        top_ok = jnp.logical_and(t_ok, row0 >= 1)
        win_ref[0:1] = jnp.where(top_ok, tops[dt][0, 0], 0.0)
        bot_ok = jnp.logical_and(t_ok, row0 + hb < h_total)
        win_ref[hb + 1:hb + 2] = jnp.where(bot_ok, bots[dt][0, 0], 0.0)

        for dh in range(3):
            rows_slice = win_ref[dh:dh + hb]
            for dw in range(3):
                patch = _wshift(rows_slice, dw, w)
                acc_ref[:] += jnp.dot(
                    patch.reshape(hb * w, c_in), w_ref[dt, dh, dw],
                    preferred_element_type=jnp.float32)

    y = acc_ref[:] + b_ref[:][None, :]
    y = jnp.where(y >= 0, y, neg_slope * y)
    out_ref[0, 0] = y.reshape(hb, w, c_out)


def conv3d_lrelu_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        neg_slope: float = NEG_SLOPE,
                        interpret: bool = False) -> jnp.ndarray:
    """x: (B, T, H, W, C_in); w: (3, 3, 3, C_in, C_out); b: (C_out,)."""
    B, T, H, W, C_in = x.shape
    C_out = w.shape[-1]
    HB = pick_h_block(H, W, C_in, C_out)
    if T < 3 or HB == 0:
        return _xla_reference(x, w, b, neg_slope)
    n_hb = pl.cdiv(H, HB)

    def tap(dt):
        return pl.BlockSpec(
            (1, 1, HB, W, C_in),
            lambda bi, ti, hbi, dt=dt: (bi, jnp.clip(ti + dt, 0, T - 1),
                                        hbi, 0, 0),
            memory_space=pltpu.VMEM)

    def halo(dt, where):
        # single global row: top = row0-1, bottom = row0+HB (clamped)
        def imap(bi, ti, hbi, dt=dt, where=where):
            if where == "top":
                r = jnp.clip(hbi * HB - 1, 0, H - 1)
            else:
                r = jnp.clip(hbi * HB + HB, 0, H - 1)
            return (bi, jnp.clip(ti + dt, 0, T - 1), r, 0, 0)
        return pl.BlockSpec((1, 1, 1, W, C_in), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [tap(-1), tap(0), tap(1)]
    in_specs += [halo(dt, "top") for dt in (-1, 0, 1)]
    in_specs += [halo(dt, "bot") for dt in (-1, 0, 1)]
    in_specs += [
        pl.BlockSpec((3, 3, 3, C_in, C_out), lambda bi, ti, hbi: (0,) * 5,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C_out,), lambda bi, ti, hbi: (0,),
                     memory_space=pltpu.VMEM),
    ]

    return pl.pallas_call(
        functools.partial(_kernel, t_total=T, h_total=H, hb=HB, w=W,
                          c_in=C_in, c_out=C_out, neg_slope=neg_slope),
        grid=(B, T, n_hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, HB, W, C_out),
                               lambda bi, ti, hbi: (bi, ti, hbi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, C_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HB + 2, W, C_in), jnp.float32),
            pltpu.VMEM((HB * W, C_out), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x, x, x, x, x, x, x, w, b)


def _xla_reference(x, w, b, neg_slope=NEG_SLOPE):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))
    y = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                     dimension_numbers=dn)
    y = y + b
    return jnp.where(y >= 0, y, neg_slope * y)


@jax.custom_vjp
def conv3d_lrelu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray):
    """Differentiable fused conv3d+bias+lrelu: Pallas forward, XLA backward
    (LeakyReLU mask recovered from the output's sign)."""
    return conv3d_lrelu_pallas(x, w, b)


def _fwd(x, w, b):
    y = conv3d_lrelu_pallas(x, w, b)
    return y, (x, w, y)


def _bwd(res, dy):
    x, w, y = res
    dpre = jnp.where(y >= 0, dy, NEG_SLOPE * dy)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))
    dx = jax.lax.conv_transpose(dpre, w, (1, 1, 1), "SAME",
                                dimension_numbers=dn, transpose_kernel=True)
    # dw via grad of the conv primal (XLA emits the fused correlation)
    _, vjp = jax.vjp(
        lambda wk: jax.lax.conv_general_dilated(x, wk, (1, 1, 1), "SAME",
                                                dimension_numbers=dn), w)
    (dw,) = vjp(dpre)
    db = jnp.sum(dpre, axis=(0, 1, 2, 3))
    return dx, dw, db


conv3d_lrelu.defvjp(_fwd, _bwd)
