"""Single-conv micro-benchmark: what does one 3^3 conv actually sustain?

Answers the r2 MFU question at the op level: f32 vs bf16, C=64 vs C=128,
with/without fused BN-style elementwise tail — at the scale-9 hot shape.
Chain-timed (dependent outputs, one scalar fetch).

Usage: [N=8] python benchmarks/conv_micro.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

N = int(os.environ.get("N", "8"))
key = jax.random.PRNGKey(0)

CASES = [
    # (label, B, T, H, W, Cin, Cout, dtype)
    ("s9 f32  C64", 2, 13, 256, 256, 64, 64, jnp.float32),
    ("s9 bf16 C64", 2, 13, 256, 256, 64, 64, jnp.bfloat16),
    ("s9 bf16 C128", 2, 13, 256, 256, 128, 128, jnp.bfloat16),
    ("s9 f32  C128", 2, 13, 256, 256, 128, 128, jnp.float32),
    ("s5 f32  C64", 2, 5, 102, 102, 64, 64, jnp.float32),
    ("s5 bf16 C64", 2, 5, 102, 102, 64, 64, jnp.bfloat16),
    ("s5 bf16 C128", 2, 5, 102, 102, 128, 128, jnp.bfloat16),
]


def bench(label, B, T, H, W, Ci, Co, dtype):
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (B, T, H, W, Ci)).astype(dtype)
    w = (jax.random.normal(jax.random.fold_in(key, 2),
                           (3, 3, 3, Ci, Co)) * 0.02).astype(dtype)

    scale = jnp.asarray(1.0 / (1.0 + H), dtype)
    half = jnp.asarray(0.5, dtype)

    @jax.jit
    def f(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            preferred_element_type=jnp.float32)
        # keep dtype + shape stable for chaining
        return (y.astype(dtype) * scale)[..., :Ci] + x * half

    xc = f(x)
    float(jnp.mean(xc.astype(jnp.float32)))  # compile+settle
    xc = f(xc)
    float(jnp.mean(xc.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(N):
        xc = f(xc)
    float(jnp.mean(xc.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N
    flops = 2 * B * T * H * W * Ci * Co * 27
    print(f"{label:>14}: {dt * 1e3:7.2f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)


for case in CASES:
    bench(*case)
