"""dx-reformulation micro: XLA's native conv backward-input vs an explicit
flipped-weight FORWARD conv (pure XLA, no Pallas).

Motivation (BENCHMARKS.md "Packed-lane Pallas conv v2"): the pconv kernel's
grad-path win comes from its dx avoiding XLA's transposed-conv lowering,
but the kernel self-gates to W % 256 == 0.  For a stride-1 SAME odd-kernel
conv, backward-input is mathematically a plain SAME conv with the kernel
spatially flipped and I/O swapped — if XLA executes that formulation
faster than its native transpose lowering, the win generalizes to the
ragged shapes (scales 7-8) pconv can't serve.

Times, per shape/dtype: fwd, dx alone (native vjp vs flipped conv), and
fwd+dx+dw (native grad vs custom-vjp with flipped dx, dw kept native).

Usage: [N=6] [SHAPE9=1] [CPU=1] python benchmarks/conv_micro6.py
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

if os.environ.get("CPU", "0") == "1":
    SHAPES = [(1, 4, 16, 12, 64)]
else:
    SHAPES = [(2, 13, 256, 256, 64), (2, 7, 204, 204, 64),
              (2, 7, 162, 162, 64)]
    if os.environ.get("SHAPE9", "0") == "1":
        SHAPES = SHAPES[:1]

N = int(os.environ.get("N", "6"))
key = jax.random.PRNGKey(0)


def timeit(label, fn, *args, flops=None):
    f = jax.jit(fn)
    c = jnp.float32(0)

    def step(c, x, *a):
        y = f(x + c.astype(x.dtype) * 0, *a)
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    step = jax.jit(step)
    x, rest = args[0], args[1:]
    try:
        for _ in range(2):
            c = step(c, x, *rest)
            float(c)
        t0 = time.perf_counter()
        for _ in range(N):
            c = step(c, x, *rest)
        float(c)
        dt = (time.perf_counter() - t0) / N
    except Exception as e:
        print(f"{label:>26}: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return None
    tf = f" ({flops / dt / 1e12:5.1f} TF/s)" if flops else ""
    print(f"{label:>26}: {dt * 1e3:7.2f} ms{tf}", flush=True)
    return dt


for shape in SHAPES:
    B, T, H, W, C = shape
    fl = 2 * B * T * H * W * C * C * 27
    x32 = (jax.random.normal(key, shape) * 0.5).astype(jnp.float32)
    w32 = (jax.random.normal(jax.random.fold_in(key, 1),
                             (3, 3, 3, C, C)) * 0.05)
    g32 = (jax.random.normal(jax.random.fold_in(key, 2), shape) * 0.1)
    dn = jax.lax.conv_dimension_numbers(shape, w32.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), "SAME", dimension_numbers=dn)

    # --- dx alone ---
    def dx_native(g, w, x):
        _, vjp = jax.vjp(lambda x: conv(x, w), x)
        return vjp(g)[0]

    def dx_flip(g, w, x):
        wf = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
        return conv(g, wf)

    # --- full grad paths ---
    def both_native(x, w, g):
        gx, gw = jax.vjp(lambda x, w: conv(x, w), x, w)[1](g)
        return gx.astype(jnp.float32) * 1e-6 + jnp.sum(jnp.abs(gw)) * 0

    def make_flipconv():
        @jax.custom_vjp
        def fconv(x, w):
            return conv(x, w)

        def fwd(x, w):
            return fconv(x, w), (x, w)

        def bwd(res, g):
            x, w = res
            wf = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
            dx = conv(g, wf)
            dw = jax.vjp(lambda w: conv(x, w), w)[1](g)[0]  # dw stays native
            return dx, dw

        fconv.defvjp(fwd, bwd)
        return fconv

    fconv = make_flipconv()

    def both_flip(x, w, g):
        gx, gw = jax.vjp(lambda x, w: fconv(x, w), x, w)[1](g)
        return gx.astype(jnp.float32) * 1e-6 + jnp.sum(jnp.abs(gw)) * 0

    def fwdpass(x, w):
        return conv(x, w)

    print(f"--- {shape} ---", flush=True)
    # numeric identity check first (CPU-cheap shapes only skip)
    a = jax.jit(dx_native)(g32[..., :], w32, x32)
    b = jax.jit(dx_flip)(g32, w32, x32)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"  dx flip-vs-native rel err: {err:.2e}", flush=True)
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        x, g = x32.astype(dt), g32.astype(dt)
        timeit(f"fwd {dt_name}", fwdpass, x, w32, flops=fl)
        timeit(f"dx native {dt_name}", dx_native, g, w32, x, flops=fl)
        timeit(f"dx flipconv {dt_name}", dx_flip, g, w32, x, flops=fl)
        timeit(f"fwd+dx+dw native {dt_name}", both_native, x, w32, g,
               flops=3 * fl)
        timeit(f"fwd+dx+dw flipdx {dt_name}", both_flip, x, w32, g,
               flops=3 * fl)
