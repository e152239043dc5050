"""Pallas TPU kernel v2: lane-packed 3x3x3 conv for the C=64 hot path.

The r2 trace (BENCHMARKS.md "Trace-level attribution") shows XLA's 3D
conv at the scale-9 shape costs ~16 ms of MXU fusion at 24 TF/s plus
~8 ms of patch/halo materialization through HBM — data movement, not
FLOPs, is the bound, and no lax-level re-expression beats it
(benchmarks/conv_micro4.py).  This kernel keeps the halo in VMEM and
fixes both MXU half-tile problems of the round-1 kernel
(ops/pallas/conv3d.py):

* **N packing**: activations are viewed as (B, T, H, W/2, 128) — a free
  bitcast outside the kernel — so each output lane group holds TWO
  adjacent W positions x 64 channels: the MXU's 128 output lanes are
  full instead of half.
* **K packing**: per (temporal, H) tap the 3 W-lane-groups x 128 lanes
  fold into one (hb*W/2, 384) @ (384, 128) matmul — contraction depth
  3 full K tiles instead of 3 half tiles.  The packed weight matrix is
  50% structurally zero (each output parity uses 3 of the 6 candidate
  W positions), so the kernel runs 2x the useful MACs at full-tile MXU
  occupancy, with no HBM-side patch materialization at all.

Scope: ker 3x3x3, stride 1, SAME zero padding, C_in = C_out = 64, even
W, T >= 3 (the generator-stage and critic body convs that dominate the
161px+ pyramid scales).  Everything else falls back to lax.conv.

Training integrates via ``conv3d64`` (jax.custom_vjp): dx reuses this
same kernel (transposed conv of a stride-1 SAME 3-tap kernel == conv
with taps flipped and in/out channels swapped); dw/db stay on XLA's
correlation path (measured at parity with its forward, conv_micro3.py).

Reference op: ConvBlock3D conv, /root/reference/modules/networks_3d.py:48-56.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d64", "conv3d64_pallas", "conv3d64_dw_pallas", "pconv_ok",
           "pconv_wins", "build_w2"]

_VMEM_BUDGET = 9 * 1024 * 1024

# CPU tests flip this to run the kernel through the pallas interpreter
# (tests/test_pconv.py); on TPU it stays False.
INTERPRET = False

# Tests flip this to route tiny shapes through the kernel regardless of
# the profitability gate below; PCONV_FORCE=1 does the same for
# benchmark A/Bs at non-qualifying W (benchmarks/per_scale_ours.py).
import os as _os
FORCE = _os.environ.get("PCONV_FORCE", "") == "1"


def pconv_wins(x_shape) -> bool:
    """Measured-profitability gate, applied on top of ``pconv_ok`` by the
    model routing (models/blocks.py): the packed kernel only beats XLA
    when the W lane-group count (W/2) fills whole 128-wide MXU tiles,
    i.e. W % 256 == 0 — the scale-9 shape class.  At W=162/204 (default
    pyramid scales 7-8) the critic-only step measured 20-23% SLOWER
    (BENCHMARKS.md r2 per-scale A/B), so ``--pconv`` self-gates and is
    safe to pass for a whole multi-scale run."""
    return FORCE or (x_shape[3] // 2) % 128 == 0


def pconv_ok(x_shape, w_shape, dtype=None) -> bool:
    """Shape gate for the packed kernel.

    ``dtype`` is the COMPUTE dtype the kernel would run in — the VMEM-fit
    check must use its element size (f32 windows are 2x bf16's; gating
    with the wrong size would route a shape whose block picker then finds
    no feasible hb and divides by zero).  None = f32 (the conservative
    default; bf16 callers pass their dtype to unlock the larger shapes)."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    B, T, H, W, Ci = x_shape
    if w_shape != (3, 3, 3, 64, 64) or Ci != 64:
        return False
    if T < 3 or W % 2 != 0 or H < 8:
        return False
    esize = 2 if dtype == jnp.bfloat16 else 4
    return _pick_hb(H, W // 2, esize) > 0


def _vmem_cost(hb: int, wg: int, esize: int) -> int:
    taps = 3 * 2 * hb * wg * 128 * esize
    halos = 6 * 2 * wg * 128 * esize
    win = (hb + 2) * (wg + 2) * 128 * esize
    patch = hb * wg * 384 * esize
    acc = hb * wg * 128 * 4
    out = 2 * hb * wg * 128 * esize
    w2 = 3 * 1152 * 128 * esize
    return taps + halos + win + patch + acc + out + w2


def _pick_hb(h: int, wg: int, esize: int) -> int:
    # bf16 native tiling is (16, 128): blocks shorter than 16 rows leave
    # every sublane tile half-empty and halve the MXU feed rate
    for hb in (16, 32, 8, 4):
        if hb <= h and _vmem_cost(hb, wg, esize) < _VMEM_BUDGET:
            return hb
    return 0


def build_w2(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """(3,3,3,64,64) -> (3, 1152, 128) packed weight matrices, one per
    temporal tap.

    Row index = ((dh*3 + g)*2 + p)*64 + ci  — g indexes the W lane
    group at offset g-1 from the output's group, p the position parity
    inside it.  Col index = q*64 + co — q the output parity.  The
    input position for (g, p) relative to output parity q is the W
    shift 2g - 2 + p - q; taps outside {-1, 0, 1} are zero.
    """
    g = jnp.arange(3)[:, None, None]
    p = jnp.arange(2)[None, :, None]
    q = jnp.arange(2)[None, None, :]
    dws = 2 * g - 2 + p - q                      # (3, 2, 2)
    valid = (dws >= -1) & (dws <= 1)
    idx = jnp.clip(dws + 1, 0, 2)
    wg_ = w[:, :, idx]                           # (3, 3, 3, 2, 2, 64, 64)
    wg_ = jnp.where(valid[None, None, :, :, :, None, None], wg_, 0)
    # [dt, dh, g, p, q, ci, co] -> [dt, dh, g, p, ci, q, co]
    wg_ = wg_.transpose(0, 1, 2, 3, 5, 4, 6)
    return wg_.reshape(3, 3, 3 * 2 * 64, 2 * 64).astype(dtype)


def _kernel(*refs, t_total: int, h_total: int, hb: int, wg: int,
            neg_slope):
    (tap_m1, tap_0, tap_p1, top_m1, top_0, top_p1, bot_m1, bot_0, bot_p1,
     w2_ref, b2_ref, out_ref, win_ref, patch_ref, acc_ref) = refs
    ti = pl.program_id(1)
    hbi = pl.program_id(2)
    row0 = hbi * hb

    taps = (tap_m1, tap_0, tap_p1)
    tops = (top_m1, top_0, top_p1)
    bots = (bot_m1, bot_0, bot_p1)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hb, wg), 0) + row0
    zcol = jnp.zeros((hb + 2, 1, 128), dtype=win_ref.dtype)

    for dt in range(3):
        if dt == 0:
            t_ok = ti >= 1
        elif dt == 2:
            t_ok = ti < t_total - 1
        else:
            t_ok = ti >= 0
        # ---- (hb+2, wg+2) window: H halo rows + zero W edge groups ----
        # where(), not multiply: ragged out-of-bounds reads can be NaN.
        body = taps[dt][0, 0]
        body_ok = jnp.logical_and(t_ok, rows < h_total).astype(
            jnp.float32)[:, :, None]
        win_ref[1:hb + 1, 1:wg + 1] = jnp.where(body_ok > 0, body, 0)
        top_ok = jnp.logical_and(t_ok, row0 >= 1)
        win_ref[0:1, 1:wg + 1] = jnp.where(top_ok, tops[dt][0, 0], 0)
        bot_ok = jnp.logical_and(t_ok, row0 + hb < h_total)
        win_ref[hb + 1:hb + 2, 1:wg + 1] = jnp.where(bot_ok, bots[dt][0, 0],
                                                     0)
        win_ref[:, 0:1] = zcol
        win_ref[:, wg + 1:wg + 2] = zcol
        # ---- per H-tap: 3-group patch -> (hb*wg, 384) @ (384, 128) ----
        for dh in range(3):
            for g in range(3):
                patch_ref[:, :, g * 128:(g + 1) * 128] = \
                    win_ref[dh:dh + hb, g:g + wg]
            acc_ref[:] += jnp.dot(patch_ref[:].reshape(hb * wg, 384),
                                  w2_ref[dt, dh],
                                  preferred_element_type=jnp.float32)

    y = acc_ref[:] + b2_ref[:][None, :].astype(jnp.float32)
    if neg_slope is not None:
        y = jnp.where(y >= 0, y, neg_slope * y)
    out_ref[0, 0] = y.reshape(hb, wg, 128).astype(out_ref.dtype)


def conv3d64_pallas(x: jnp.ndarray, w: jnp.ndarray, b=None,
                    neg_slope=None, interpret: bool = False) -> jnp.ndarray:
    """Packed-lane conv3d.  x: (B,T,H,W,64) with even W, w: (3,3,3,64,64),
    optional bias (64,) and fused LeakyReLU.  Output dtype == x.dtype."""
    B, T, H, W, C = x.shape
    assert pconv_ok(x.shape, w.shape, dtype=x.dtype), (x.shape, w.shape,
                                                       x.dtype)
    wg_n = W // 2
    esize = 2 if x.dtype == jnp.bfloat16 else 4
    hb = _pick_hb(H, wg_n, esize)
    n_hb = pl.cdiv(H, hb)

    xp = x.reshape(B, T, H, wg_n, 128)
    w2 = build_w2(w, x.dtype)
    b2 = (jnp.zeros((128,), x.dtype) if b is None
          else jnp.concatenate([b, b]).astype(x.dtype))

    def tap(dt):
        return pl.BlockSpec(
            (1, 1, hb, wg_n, 128),
            lambda bi, ti, hbi, dt=dt: (bi, jnp.clip(ti + dt, 0, T - 1),
                                        hbi, 0, 0),
            memory_space=pltpu.VMEM)

    def halo(dt, where):
        def imap(bi, ti, hbi, dt=dt, where=where):
            if where == "top":
                r = jnp.clip(hbi * hb - 1, 0, H - 1)
            else:
                r = jnp.clip(hbi * hb + hb, 0, H - 1)
            return (bi, jnp.clip(ti + dt, 0, T - 1), r, 0, 0)
        return pl.BlockSpec((1, 1, 1, wg_n, 128), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [tap(-1), tap(0), tap(1)]
    in_specs += [halo(dt, "top") for dt in (-1, 0, 1)]
    in_specs += [halo(dt, "bot") for dt in (-1, 0, 1)]
    in_specs += [
        pl.BlockSpec((3, 3, 384, 128), lambda bi, ti, hbi: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128,), lambda bi, ti, hbi: (0,),
                     memory_space=pltpu.VMEM),
    ]

    yp = pl.pallas_call(
        functools.partial(_kernel, t_total=T, h_total=H, hb=hb, wg=wg_n,
                          neg_slope=neg_slope),
        grid=(B, T, n_hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, hb, wg_n, 128),
                               lambda bi, ti, hbi: (bi, ti, hbi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H, wg_n, 128), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hb + 2, wg_n + 2, 128), x.dtype),
            pltpu.VMEM((hb, wg_n, 384), x.dtype),
            pltpu.VMEM((hb * wg_n, 128), jnp.float32),
        ],
        interpret=interpret or INTERPRET,
    )(xp, xp, xp, xp, xp, xp, xp, xp, xp, w2, b2)
    return yp.reshape(B, T, H, W, C)


def _dw_kernel(*refs, t_total: int, h_total: int, hb: int, wg: int):
    """Weight-gradient: dW2[dt, dh] += patch(dt, dh)^T @ dy_tile, i.e. the
    forward kernel's matmul with the contraction moved to the row axis —
    the packed dW2 (3, 3, 384, 128) accumulates in VMEM across the whole
    grid (constant out index map) and is unpacked to (3,3,3,64,64) by the
    adjoint of build_w2 outside the kernel."""
    (tap_m1, tap_0, tap_p1, top_m1, top_0, top_p1, bot_m1, bot_0, bot_p1,
     dy_ref, out_ref, win_ref, patch_ref) = refs
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    hbi = pl.program_id(2)
    row0 = hbi * hb

    @pl.when(jnp.logical_and(jnp.logical_and(bi == 0, ti == 0), hbi == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    taps = (tap_m1, tap_0, tap_p1)
    tops = (top_m1, top_0, top_p1)
    bots = (bot_m1, bot_0, bot_p1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (hb, wg), 0) + row0
    zcol = jnp.zeros((hb + 2, 1, 128), dtype=win_ref.dtype)
    dyf = dy_ref[0, 0].reshape(hb * wg, 128)
    # ragged last H block: zero the out-of-range dy rows so they cannot
    # contribute (the forward masks its INPUT window; dw must mask the
    # cotangent rows too).  where(), not multiply: ragged out-of-bounds
    # reads can be NaN, and NaN * 0 stays NaN.  The mask is built directly
    # in the flattened (hb*wg, 1) shape — Mosaic can't reshape a 2D
    # vector into a (N, 1) column.
    flat = jax.lax.broadcasted_iota(jnp.int32, (hb * wg, 1), 0)
    dy_ok = (row0 + flat // wg < h_total).astype(jnp.float32)
    dyf = jnp.where(dy_ok > 0, dyf, 0)

    for dt in range(3):
        if dt == 0:
            t_ok = ti >= 1
        elif dt == 2:
            t_ok = ti < t_total - 1
        else:
            t_ok = ti >= 0
        body = taps[dt][0, 0]
        body_ok = jnp.logical_and(t_ok, rows < h_total).astype(
            jnp.float32)[:, :, None]
        win_ref[1:hb + 1, 1:wg + 1] = jnp.where(body_ok > 0, body, 0)
        top_ok = jnp.logical_and(t_ok, row0 >= 1)
        win_ref[0:1, 1:wg + 1] = jnp.where(top_ok, tops[dt][0, 0], 0)
        bot_ok = jnp.logical_and(t_ok, row0 + hb < h_total)
        win_ref[hb + 1:hb + 2, 1:wg + 1] = jnp.where(bot_ok, bots[dt][0, 0],
                                                     0)
        win_ref[:, 0:1] = zcol
        win_ref[:, wg + 1:wg + 2] = zcol
        for dh in range(3):
            for g in range(3):
                patch_ref[:, :, g * 128:(g + 1) * 128] = \
                    win_ref[dh:dh + hb, g:g + wg]
            out_ref[dt, dh] += jax.lax.dot_general(
                patch_ref[:].reshape(hb * wg, 384), dyf,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def conv3d64_dw_pallas(x: jnp.ndarray, dy: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Packed-lane weight gradient: dw of lax.conv(x, w, SAME) wrt w given
    cotangent dy, keeping the patch windows in VMEM (no HBM patch
    materialization).  Returns (3, 3, 3, 64, 64) in f32."""
    B, T, H, W, C = x.shape
    assert pconv_ok(x.shape, (3, 3, 3, 64, 64), dtype=x.dtype)
    wg_n = W // 2
    esize = 2 if x.dtype == jnp.bfloat16 else 4
    hb = _pick_hb(H, wg_n, esize)
    n_hb = pl.cdiv(H, hb)

    xp = x.reshape(B, T, H, wg_n, 128)
    dyp = dy.astype(x.dtype).reshape(B, T, H, wg_n, 128)

    def tap(dt):
        return pl.BlockSpec(
            (1, 1, hb, wg_n, 128),
            lambda bi, ti, hbi, dt=dt: (bi, jnp.clip(ti + dt, 0, T - 1),
                                        hbi, 0, 0),
            memory_space=pltpu.VMEM)

    def halo(dt, where):
        def imap(bi, ti, hbi, dt=dt, where=where):
            if where == "top":
                r = jnp.clip(hbi * hb - 1, 0, H - 1)
            else:
                r = jnp.clip(hbi * hb + hb, 0, H - 1)
            return (bi, jnp.clip(ti + dt, 0, T - 1), r, 0, 0)
        return pl.BlockSpec((1, 1, 1, wg_n, 128), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [tap(-1), tap(0), tap(1)]
    in_specs += [halo(dt, "top") for dt in (-1, 0, 1)]
    in_specs += [halo(dt, "bot") for dt in (-1, 0, 1)]
    in_specs += [pl.BlockSpec((1, 1, hb, wg_n, 128),
                              lambda bi, ti, hbi: (bi, ti, hbi, 0, 0),
                              memory_space=pltpu.VMEM)]

    dW2 = pl.pallas_call(
        functools.partial(_dw_kernel, t_total=T, h_total=H, hb=hb, wg=wg_n),
        grid=(B, T, n_hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, 3, 384, 128),
                               lambda bi, ti, hbi: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, 384, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hb + 2, wg_n + 2, 128), x.dtype),
            pltpu.VMEM((hb, wg_n, 384), x.dtype),
        ],
        interpret=interpret or INTERPRET,
    )(xp, xp, xp, xp, xp, xp, xp, xp, xp, dyp)

    # unpack: build_w2 is linear in w, so dw = its VJP applied to dW2
    zero_w = jnp.zeros((3, 3, 3, 64, 64), jnp.float32)
    _, vjp = jax.vjp(lambda w: build_w2(w, jnp.float32), zero_w)
    (dw,) = vjp(dW2)
    return dw


# dw path of conv3d64's backward: True (default) = the packed-lane kernel
# above — a reproducible +1.6% scale-9 step win over XLA's correlation
# (0.748/0.748 vs 0.736 it/s across fresh processes, BENCHMARKS.md r3);
# PCONV_DW=0 restores the r2 XLA split for A/Bs.
DW_PALLAS = _os.environ.get("PCONV_DW", "1") == "1"


def _dw_xla(x, dy):
    """XLA-correlation weight gradient — the differentiable reference
    formulation (vjp of the linear conv w.r.t. its kernel)."""
    _, vjp = jax.vjp(
        lambda wk: jax.lax.conv_general_dilated(
            x, wk.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=_dn(x.shape, (3, 3, 3, 64, 64))),
        jnp.zeros((3, 3, 3, 64, 64), jnp.float32))
    (dw,) = vjp(dy.astype(x.dtype))
    return dw


@jax.custom_jvp
def _dw(x, dy):
    return conv3d64_dw_pallas(x, dy)


@_dw.defjvp
def _dw_jvp(primals, tangents):
    """dw(x, dy) is bilinear: its tangent is the XLA correlation of each
    tangent against the other primal.  This keeps reverse-over-reverse
    (the WGAN-GP composition in tests; the production GP always uses the
    lax critic) differentiable through the raw pallas dw call."""
    x, dy = primals
    tx, tdy = tangents
    return _dw(x, dy), _dw_xla(tx, dy) + _dw_xla(x, tdy)


def _flip_swap(w: jnp.ndarray) -> jnp.ndarray:
    """Kernel of the transposed (input-gradient) conv: taps flipped on all
    three spatial axes, in/out channels swapped."""
    return w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)


def _dn(x_shape, w_shape):
    return jax.lax.conv_dimension_numbers(x_shape, w_shape,
                                          ("NTHWC", "THWIO", "NTHWC"))


@jax.custom_vjp
def conv3d64(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray):
    """Differentiable packed conv3d + bias (no activation): Pallas forward
    AND Pallas input-gradient; XLA weight-gradient.

    The backward is expressed in terms of ``conv3d64`` itself (not the raw
    ``pallas_call``), so reverse-over-reverse differentiation — the WGAN-GP
    double-backprop through the critic (losses/__init__.py) — re-enters the
    custom rule instead of hitting the underivable pallas primitive."""
    return conv3d64_pallas(x, w.astype(x.dtype), b)


def _fwd(x, w, b):
    return conv3d64(x, w, b), (x, w, b)


def _bwd(res, dy):
    x, w, b = res
    dyc = dy.astype(x.dtype)
    dx = conv3d64(dyc, _flip_swap(w),
                  jnp.zeros((w.shape[-2],), dtype=b.dtype))
    if DW_PALLAS:
        dw = _dw(x, dyc).astype(w.dtype)
    else:
        _, vjp = jax.vjp(
            lambda wk: jax.lax.conv_general_dilated(
                x, wk.astype(x.dtype), (1, 1, 1), "SAME",
                dimension_numbers=_dn(x.shape, w.shape)), w)
        (dw,) = vjp(dyc)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(b.dtype)
    return dx.astype(dy.dtype), dw, db


conv3d64.defvjp(_fwd, _bwd)
