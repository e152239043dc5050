"""Packed Pallas conv (ops/pallas/conv3d_pack.py) vs XLA at the hot shapes.

Times forward, dx (via the same kernel, flipped weights) and the full
custom-vjp both-grads path, bf16 and f32, chained through the relay.

Usage: [N=6] python benchmarks/conv_micro5.py
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

import hpvaegan_tpu.ops.pallas.conv3d_pack as cp

if os.environ.get("CPU", "0") == "1":
    cp.INTERPRET = True
    SHAPES = [(1, 4, 16, 12, 64)]
else:
    SHAPES = [(2, 13, 256, 256, 64), (2, 7, 204, 204, 64),
              (2, 7, 162, 162, 64)]
    if os.environ.get("SHAPE9", "0") == "1":
        SHAPES = SHAPES[:1]

N = int(os.environ.get("N", "6"))
key = jax.random.PRNGKey(0)


def timeit(label, fn, x, *args, flops=None):
    f = jax.jit(fn)
    c = jnp.float32(0)

    def step(c, x, *a):
        y = f(x + c.astype(x.dtype) * 0, *a)
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    step = jax.jit(step)
    try:
        for _ in range(2):
            c = step(c, x, *args)
            float(c)
        t0 = time.perf_counter()
        for _ in range(N):
            c = step(c, x, *args)
        float(c)
        dt = (time.perf_counter() - t0) / N
    except Exception as e:
        print(f"{label:>22}: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return
    tf = f" ({flops / dt / 1e12:5.1f} TF/s)" if flops else ""
    print(f"{label:>22}: {dt * 1e3:7.2f} ms{tf}", flush=True)


for shape in SHAPES:
    B, T, H, W, C = shape
    fl = 2 * B * T * H * W * C * C * 27
    x32 = (jax.random.normal(key, shape) * 0.5).astype(jnp.float32)
    w32 = (jax.random.normal(jax.random.fold_in(key, 1),
                             (3, 3, 3, C, C)) * 0.05)
    b32 = jax.random.normal(jax.random.fold_in(key, 2), (C,)) * 0.1
    dn = jax.lax.conv_dimension_numbers(shape, w32.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))

    def xla_fwd(x, w, b):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=dn) + b.astype(x.dtype)

    def p_fwd(x, w, b):
        return cp.conv3d64_pallas(x, w.astype(x.dtype), b.astype(x.dtype))

    def xla_both(x, w, b):
        g = jax.grad(lambda x, w, b: jnp.sum(
            xla_fwd(x, w, b).astype(jnp.float32) * 1e-6), (0, 1))(x, w, b)
        return g[0].astype(jnp.float32) * 0 + 1.0 \
            + jnp.sum(jnp.abs(g[1])) * 0  # force both

    def p_both(x, w, b):
        g = jax.grad(lambda x, w, b: jnp.sum(
            cp.conv3d64(x, w, b).astype(jnp.float32) * 1e-6), (0, 1))(x, w, b)
        return g[0].astype(jnp.float32) * 0 + 1.0 + jnp.sum(jnp.abs(g[1])) * 0

    print(f"--- {shape} ---", flush=True)
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        x = x32.astype(dt)
        timeit(f"xla fwd {dt_name}", xla_fwd, x, w32, b32, flops=fl)
        timeit(f"pallas fwd {dt_name}", p_fwd, x, w32, b32, flops=fl)
        timeit(f"xla fwd+dx+dw {dt_name}", xla_both, x, w32, b32,
               flops=3 * fl)
        timeit(f"pallas fwd+dx+dw {dt_name}", p_both, x, w32, b32,
               flops=3 * fl)
