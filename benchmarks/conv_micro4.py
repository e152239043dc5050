"""Conv formulation shoot-out at the scale-9 hot shape.

The r2 trace (step_cost.py TRACE=1) shows each full-res 3D conv costs
~16 ms of 'convolution fusion' PLUS ~8 ms of patch/halo materialization
('pad_maximum' / 'bitcast_select' loop fusions moving 1.3-4.5 GB), and
bf16 is no faster than f32 — the conv path is data-movement-bound, not
MXU-bound.  This times numerically-equivalent reformulations of the
(3,3,3,64,64) conv at (2,13,256,256,64):

  conv3d    native lax 3D conv (baseline)
  tfold     fold the 3 temporal taps into channels: concat of T-shifted
            copies -> (B,T,H,W,192), one 2D conv (3,3,192,64).  SAME MACs.
  tsum      decompose into 3 per-T-tap 2D convs on shifted slices, summed.
  conv2d    plain 2D conv at (B*T,H,W,64) (3,3,64,64) — NOT equivalent,
            lower bound for "what does XLA's 2D path cost at C=64".
  conv2d192 plain 2D conv (3,3,192,64) on materialized (B,T,H,W,192) —
            isolates the conv cost of tfold from the concat cost.

Each formulation is checked numerically against conv3d once (CPU-safe
tolerance for bf16), then chain-timed.

Usage: [N=6] [CPU=1] python benchmarks/conv_micro4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hpvaegan_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

N = int(os.environ.get("N", "6"))
DT = jnp.bfloat16
key = jax.random.PRNGKey(0)

if os.environ.get("CPU", "0") == "1":
    B, T, H, W, C = 1, 5, 32, 32, 8
else:
    B, T, H, W, C = 2, 13, 256, 256, 64

x0 = (jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, W, C)) * 0.5
      ).astype(DT)
w0 = (jax.random.normal(jax.random.fold_in(key, 2), (3, 3, 3, C, C)) * 0.02
      ).astype(DT)


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


def _tshift_cat(x):
    """(B,T,H,W,C) -> (B,T,H,W,3C): channels [t-1, t, t+1] (zero-padded)."""
    zp = jnp.zeros_like(x[:, :1])
    xm = jnp.concatenate([zp, x[:, :-1]], axis=1)   # value at t-1
    xp = jnp.concatenate([x[:, 1:], zp], axis=1)    # value at t+1
    return jnp.concatenate([xm, x, xp], axis=-1)


def _w_tfold(w):
    """(3,3,3,C,C) kt-major -> (3,3,3C,C) matching _tshift_cat order."""
    # w[kt] multiplies x[t-1+kt]; channel block kt of the folded input
    # holds x at t-1+kt, so fold kt into the input-channel axis in order.
    return jnp.concatenate([w[0], w[1], w[2]], axis=2)


def tfold(x, w):
    xf = _tshift_cat(x).reshape(B * T, H, W, 3 * C)
    wf = _w_tfold(w)
    return jax.lax.conv_general_dilated(
        xf, wf, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")).reshape(B, T, H, W, C)


def tsum(x, w):
    zp = jnp.zeros_like(x[:, :1])
    shifts = [jnp.concatenate([zp, x[:, :-1]], axis=1), x,
              jnp.concatenate([x[:, 1:], zp], axis=1)]
    out = None
    for kt in range(3):
        y = jax.lax.conv_general_dilated(
            shifts[kt].reshape(B * T, H, W, C), w[kt], (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    return out.reshape(B, T, H, W, C)


def conv2d(x, w):  # NOT equivalent — 2D cost reference only
    xx = x.reshape(B * T, H, W, C)
    return jax.lax.conv_general_dilated(
        xx, w[1], (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv2d192(xf, w):  # NOT equivalent on its own — conv part of tfold
    wf = _w_tfold(w)
    return jax.lax.conv_general_dilated(
        xf.reshape(B * T, H, W, 3 * C), wf, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# numeric check (tfold/tsum vs conv3d)
ref = jax.jit(conv3d)(x0, w0)
for name, fn in (("tfold", tfold), ("tsum", tsum)):
    got = jax.jit(fn)(x0, w0)
    err = float(jnp.max(jnp.abs((got - ref).astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    assert err <= 0.02 * max(scale, 1.0), (name, err, scale)
    print(f"{name}: max|diff|={err:.4f} (ref max {scale:.2f}) OK",
          flush=True)

xf0 = jax.jit(_tshift_cat)(x0)


def timeit(label, fn, *args):
    f = jax.jit(fn)
    c = jnp.float32(0)

    def step(c, *a):
        y = f(a[0] + c.astype(DT) * 0, *a[1:])
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    step = jax.jit(step)
    for _ in range(2):
        c = step(c, *args)
        float(c)
    t0 = time.perf_counter()
    for _ in range(N):
        c = step(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / N
    flops = 2 * B * T * H * W * C * C * 27
    print(f"{label:>10}: {dt * 1e3:7.2f} ms  ({flops / dt / 1e12:5.1f} TF/s"
          f" useful)", flush=True)


timeit("conv3d", conv3d, x0, w0)
timeit("tfold", tfold, x0, w0)
timeit("tsum", tsum, x0, w0)
timeit("conv2d", conv2d, x0, w0)      # 1/3 the MACs — scale mentally
timeit("conv2d192", conv2d192, xf0, w0)
