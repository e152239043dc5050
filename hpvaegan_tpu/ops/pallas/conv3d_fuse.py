"""Pallas TPU kernel v3: two fused 3x3x3 convs with the intermediate
activation resident in VMEM (the "multi-conv fusion" strategy class).

Motivation (VERDICT r2 item 1): the scale-9 step is conv-DATA-MOVEMENT
bound — every conv in the critic body round-trips a ~200 MB activation
through HBM between 3x3x3 convs (convolution fusions run at 110 GB/s,
plus ~330 ms of patch/halo materialization; BENCHMARKS.md "Trace-level
attribution").  All five previously tested strategies re-express SINGLE
convs; this kernel eliminates the inter-conv HBM round-trip for a PAIR
of consecutive conv(+bias+lrelu) layers:

    y = lrelu(conv(lrelu(conv(x, w1) + b1), w2) + b2)

Layout/packing reuses the r2 packed-lane scheme (ops/pallas/conv3d_pack.py
``build_w2``): activations viewed as (B, T, H, W/2, 128) so W-pixel pairs
fill all 128 MXU lanes and each (dt, dh) tap is one full-tile
(rows, 384) @ (384, 128) matmul.

Streaming structure: grid (B, n_hb, T) with T innermost.  A 3-slot VMEM
buffer caches the intermediate z slices across T steps — per step exactly
ONE new z slice is computed (conv1, hb+2 rows: the H halo conv2 needs),
the buffer rotates, and conv2 contracts the three cached slices into the
output tile.  conv1 therefore runs once per T slice (no temporal
recompute), and per output tile the kernel reads 3 x-tap tiles + 12 halo
rows and writes 1 tile — vs 2x(3 reads + 1 write) plus the full
intermediate round-trip for the unfused pair.

Scope: ker 3x3x3, stride 1, SAME zero padding, C_in = C_mid = C_out = 64,
even W, T >= 3 — the WDiscriminator3D body chain
(/root/reference/modules/networks_3d.py:163-181, consecutive SN convs +
LeakyReLU(0.2), no normalization between).  Everything else falls back
to the single-conv paths.

Training integrates via ``conv3d64_pair`` (jax.custom_vjp): the forward
variant used under differentiation also emits z once (for residuals);
the backward chains the r2 packed dx kernel through the two LeakyReLU
masks (sign(z) == sign(pre1) since lrelu is sign-preserving) and keeps
XLA's correlation for dw1/dw2 — exactly the unfused gradient semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv3d_pack import build_w2, conv3d64, _flip_swap, _dn

__all__ = ["conv3d64_pair", "conv3d64_pair_pallas", "pfuse_ok",
           "pfuse_wins"]

_VMEM_BUDGET = 12 * 1024 * 1024

# CPU tests flip this to run through the pallas interpreter
# (tests/test_pfuse.py); on TPU it stays False.
INTERPRET = False

import os as _os
FORCE = _os.environ.get("PFUSE_FORCE", "") == "1"


def pfuse_wins(x_shape) -> bool:
    """Measured-profitability gate (same shape class as pconv_wins): full
    128-wide W lane-group tiles, i.e. W % 256 == 0."""
    return FORCE or (x_shape[3] // 2) % 128 == 0


def _vmem_cost(hb: int, wg: int, esize: int, with_mid: bool) -> int:
    mains = 2 * 3 * hb * wg * 128 * esize          # double-buffered taps
    halos = 2 * 12 * wg * 128 * esize
    w2s = 2 * 2 * 3 * 3 * 384 * 128 * esize
    outs = 2 * (2 if with_mid else 1) * hb * wg * 128 * esize
    zbuf = 3 * (hb + 2) * wg * 128 * esize
    win = (hb + 4) * (wg + 2) * 128 * esize
    patch = (hb + 2) * wg * 384 * esize
    acc = (hb + 2) * wg * 128 * 4
    return mains + halos + w2s + outs + zbuf + win + patch + acc


def _pick_hb(h: int, wg: int, esize: int, with_mid: bool) -> int:
    for hb in (16, 8, 4):
        if hb <= h and _vmem_cost(hb, wg, esize, with_mid) < _VMEM_BUDGET:
            return hb
    return 0


def pfuse_ok(x_shape, w_shape, dtype=None) -> bool:
    """Shape gate: both convs must be (3,3,3,64,64); VMEM must fit the
    fused working set (the mid-emitting differentiable variant — the
    strictest case) at the compute dtype."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    B, T, H, W, Ci = x_shape
    if w_shape != (3, 3, 3, 64, 64) or Ci != 64:
        return False
    if T < 3 or W % 2 != 0 or H < 8:
        return False
    esize = 2 if dtype == jnp.bfloat16 else 4
    return _pick_hb(H, W // 2, esize, with_mid=True) > 0


def _pair_kernel(*refs, t_total: int, h_total: int, hb: int, wg: int,
                 slope: float, with_mid: bool):
    (m0, m1, m2,
     t0a, t0b, t1a, t1b, t2a, t2b,
     b0a, b0b, b1a, b1b, b2a, b2b,
     w1_ref, w2_ref, bb_ref, *rest) = refs
    if with_mid:
        out_ref, mid_ref, zbuf, win, patch, acc = rest
    else:
        out_ref, zbuf, win, patch, acc = rest
        mid_ref = None
    hbi = pl.program_id(1)
    ti = pl.program_id(2)
    row0 = hbi * hb

    mains = (m0, m1, m2)
    tops = ((t0a, t0b), (t1a, t1b), (t2a, t2b))
    bots = ((b0a, b0b), (b1a, b1b), (b2a, b2b))

    # global H rows of the z slice being produced: [row0 - 1, row0 + hb + 1)
    zrows = jax.lax.broadcasted_iota(jnp.int32, (hb + 2, wg), 0) + row0 - 1
    body_rows = jax.lax.broadcasted_iota(jnp.int32, (hb, wg), 0) + row0
    zcol = jnp.zeros((hb + 4, 1, 128), dtype=win.dtype)

    def conv1_into(slot: int, d_offsets) -> None:
        """One conv1 application: z[tz] over rows [row0-1, row0+hb+1),
        written to zbuf[slot].  ``d_offsets[k]`` is the DELIVERED tap index
        (0..2 = x[ti+d]) feeding temporal tap k, or None for a
        zero tap (x T index out of range by construction).  tz is implied:
        x T index of tap k is (tz - 1 + k); masks below re-derive validity
        from ti + d against t_total."""
        acc[:] = jnp.zeros_like(acc)
        for k, d in enumerate(d_offsets):
            if d is None:
                continue
            t_ok = jnp.logical_and(ti + d >= 0, ti + d <= t_total - 1)
            # ---- (hb+4, wg+2) input window for this tap ----
            # where(), not multiply: ragged out-of-bounds reads can be NaN
            body = mains[d][0, 0]
            # f32 mask + trailing-dim insert: Mosaic can't minor-dim an i1
            # vector (same workaround as conv3d_pack._kernel)
            body_ok = jnp.logical_and(t_ok, body_rows < h_total).astype(
                jnp.float32)[:, :, None]
            win[2:hb + 2, 1:wg + 1] = jnp.where(body_ok > 0, body, 0)
            top_a, top_b = tops[d]
            win[0:1, 1:wg + 1] = jnp.where(
                jnp.logical_and(t_ok, row0 >= 2), top_a[0, 0], 0)
            win[1:2, 1:wg + 1] = jnp.where(
                jnp.logical_and(t_ok, row0 >= 1), top_b[0, 0], 0)
            bot_a, bot_b = bots[d]
            win[hb + 2:hb + 3, 1:wg + 1] = jnp.where(
                jnp.logical_and(t_ok, row0 + hb < h_total), bot_a[0, 0], 0)
            win[hb + 3:hb + 4, 1:wg + 1] = jnp.where(
                jnp.logical_and(t_ok, row0 + hb + 1 < h_total), bot_b[0, 0],
                0)
            win[:, 0:1] = zcol
            win[:, wg + 1:wg + 2] = zcol
            # ---- per H-tap: 3-group patch -> ((hb+2)*wg, 384) @ (384,128)
            for dh in range(3):
                for g in range(3):
                    patch[:, :, g * 128:(g + 1) * 128] = \
                        win[dh:dh + hb + 2, g:g + wg]
                acc[:] += jnp.dot(patch[:].reshape((hb + 2) * wg, 384),
                                  w1_ref[k, dh],
                                  preferred_element_type=jnp.float32)
        z = acc[:] + bb_ref[0][None, :].astype(jnp.float32)
        z = jnp.where(z >= 0, z, slope * z).reshape(hb + 2, wg, 128)
        zok = jnp.logical_and(zrows >= 0, zrows < h_total).astype(
            jnp.float32)[:, :, None]
        zbuf[slot] = jnp.where(zok > 0, z, 0).astype(zbuf.dtype)

    # ---- rotate the z cache and produce the one new slice ----
    @pl.when(ti == 0)
    def _():
        zbuf[0] = jnp.zeros_like(zbuf[0])            # z[-1] = SAME zero pad
        conv1_into(1, (None, 0, 1))                  # z[0]: x[-1..1]
        conv1_into(2, (0, 1, 2) if t_total > 1 else (None, None, None))

    @pl.when(ti > 0)
    def _():
        zbuf[0] = zbuf[1]
        zbuf[1] = zbuf[2]
        # z[ti+1]: x[ti..ti+2]; zero when ti+1 >= T
        @pl.when(ti + 1 <= t_total - 1)
        def _():
            conv1_into(2, (0, 1, 2))

        @pl.when(ti + 1 > t_total - 1)
        def _():
            zbuf[2] = jnp.zeros_like(zbuf[2])

    # ---- conv2 over the three cached z slices (all masks pre-applied) ----
    acc2 = jnp.zeros((hb * wg, 128), jnp.float32)
    for k in range(3):
        win[0:hb + 2, 1:wg + 1] = zbuf[k]
        win[0:hb + 2, 0:1] = zcol[:hb + 2]
        win[0:hb + 2, wg + 1:wg + 2] = zcol[:hb + 2]
        for dh in range(3):
            for g in range(3):
                patch[:hb, :, g * 128:(g + 1) * 128] = \
                    win[dh:dh + hb, g:g + wg]
            acc2 += jnp.dot(patch[:hb].reshape(hb * wg, 384),
                            w2_ref[k, dh],
                            preferred_element_type=jnp.float32)
    y = acc2 + bb_ref[1][None, :].astype(jnp.float32)
    y = jnp.where(y >= 0, y, slope * y)
    out_ref[0, 0] = y.reshape(hb, wg, 128).astype(out_ref.dtype)
    if with_mid:
        mid_ref[0, 0] = zbuf[1, 1:hb + 1]            # z[ti], body rows


def conv3d64_pair_pallas(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                         w2: jnp.ndarray, b2: jnp.ndarray,
                         slope: float = 0.2, with_mid: bool = False,
                         interpret: bool = False):
    """Fused lrelu(conv(lrelu(conv(x, w1)+b1), w2)+b2).  x: (B,T,H,W,64)
    with even W; w1, w2: (3,3,3,64,64).  Returns y, or (y, z) when
    ``with_mid`` (z = the post-lrelu intermediate, for VJP residuals)."""
    B, T, H, W, C = x.shape
    assert pfuse_ok(x.shape, w1.shape, dtype=x.dtype), (x.shape, x.dtype)
    wg_n = W // 2
    esize = 2 if x.dtype == jnp.bfloat16 else 4
    hb = _pick_hb(H, wg_n, esize, with_mid)
    n_hb = pl.cdiv(H, hb)

    xp = x.reshape(B, T, H, wg_n, 128)
    w1p = build_w2(w1, x.dtype)
    w2p = build_w2(w2, x.dtype)
    bb = jnp.stack([jnp.concatenate([b1, b1]),
                    jnp.concatenate([b2, b2])]).astype(x.dtype)

    def tap(dt):
        return pl.BlockSpec(
            (1, 1, hb, wg_n, 128),
            lambda bi, hbi, ti, dt=dt: (bi, jnp.clip(ti + dt, 0, T - 1),
                                        hbi, 0, 0),
            memory_space=pltpu.VMEM)

    def halo(dt, row_off):
        def imap(bi, hbi, ti, dt=dt, row_off=row_off):
            if row_off < 0:
                r = jnp.clip(hbi * hb + row_off, 0, H - 1)
            else:
                r = jnp.clip(hbi * hb + hb + row_off, 0, H - 1)
            return (bi, jnp.clip(ti + dt, 0, T - 1), r, 0, 0)
        return pl.BlockSpec((1, 1, 1, wg_n, 128), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [tap(0), tap(1), tap(2)]
    for dt in (0, 1, 2):           # top halo rows: row0-2, row0-1
        in_specs += [halo(dt, -2), halo(dt, -1)]
    for dt in (0, 1, 2):           # bottom halo rows: row0+hb, row0+hb+1
        in_specs += [halo(dt, 0), halo(dt, 1)]
    in_specs += [
        pl.BlockSpec((3, 3, 384, 128), lambda bi, hbi, ti: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, 384, 128), lambda bi, hbi, ti: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 128), lambda bi, hbi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, 1, hb, wg_n, 128),
                            lambda bi, hbi, ti: (bi, ti, hbi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((B, T, H, wg_n, 128), x.dtype)]
    out_specs = [out_spec]
    if with_mid:
        out_shape.append(jax.ShapeDtypeStruct((B, T, H, wg_n, 128), x.dtype))
        out_specs.append(out_spec)

    outs = pl.pallas_call(
        functools.partial(_pair_kernel, t_total=T, h_total=H, hb=hb,
                          wg=wg_n, slope=slope, with_mid=with_mid),
        grid=(B, n_hb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, hb + 2, wg_n, 128), x.dtype),
            pltpu.VMEM((hb + 4, wg_n + 2, 128), x.dtype),
            pltpu.VMEM((hb + 2, wg_n, 384), x.dtype),
            pltpu.VMEM(((hb + 2) * wg_n, 128), jnp.float32),
        ],
        interpret=interpret or INTERPRET,
    )(xp, xp, xp, *([xp] * 12), w1p, w2p, bb)
    y = outs[0].reshape(B, T, H, W, C)
    if with_mid:
        return y, outs[1].reshape(B, T, H, W, C)
    return y


_SLOPE = 0.2  # LeakyReLU slope of the critic body (networks_3d.py:18-26)


@jax.custom_vjp
def conv3d64_pair(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                  w2: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Differentiable fused conv+lrelu pair.  Primal (inference) path skips
    the intermediate entirely; under differentiation the forward emits z
    once as the VJP residual."""
    return conv3d64_pair_pallas(x, w1.astype(x.dtype), b1,
                                w2.astype(x.dtype), b2, slope=_SLOPE)


def _fwd(x, w1, b1, w2, b2):
    y, z = conv3d64_pair_pallas(x, w1.astype(x.dtype), b1,
                                w2.astype(x.dtype), b2, slope=_SLOPE,
                                with_mid=True)
    return y, (x, z, y, w1, w2, b1, b2)


def _bwd(res, dy):
    """Unfused gradient chain (exactly the pair's composite VJP):
    d_pre2 = dy * lrelu'(y); dz via the packed dx kernel; d_pre1 likewise;
    dx via the packed dx kernel; dw/db on XLA's correlation (the measured
    r2 split, conv3d_pack._bwd)."""
    x, z, y, w1, w2, b1, b2 = res
    dyc = dy.astype(x.dtype)
    # lrelu is sign-preserving: mask from the POST-activation sign
    d_pre2 = jnp.where(y >= 0, dyc, jnp.asarray(_SLOPE, dyc.dtype) * dyc)
    zero64 = jnp.zeros((64,), dtype=b1.dtype)
    dz = conv3d64(d_pre2, _flip_swap(w2), zero64)
    d_pre1 = jnp.where(z >= 0, dz, jnp.asarray(_SLOPE, dz.dtype) * dz)
    dx = conv3d64(d_pre1, _flip_swap(w1), zero64)

    def corr(inp, wk):
        return jax.lax.conv_general_dilated(
            inp, wk.astype(inp.dtype), (1, 1, 1), "SAME",
            dimension_numbers=_dn(inp.shape, wk.shape))

    _, vjp2 = jax.vjp(lambda wk: corr(z, wk), w2)
    (dw2,) = vjp2(d_pre2)
    _, vjp1 = jax.vjp(lambda wk: corr(x, wk), w1)
    (dw1,) = vjp1(d_pre1)
    db2 = jnp.sum(d_pre2.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(
        b2.dtype)
    db1 = jnp.sum(d_pre1.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(
        b1.dtype)
    return dx.astype(dy.dtype), dw1, db1, dw2, db2


conv3d64_pair.defvjp(_fwd, _bwd)
