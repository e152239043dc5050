"""Backward-pass micro-benchmark: packed vs unpacked conv gradients.

The r2 wpack forward micro showed ~1.3x (conv_micro2.py) but the full
train step measured flat — the step is gradient-dominated, and XLA's
derived backward convs (input-transpose + kernel-grad) for the packed
(3,3,2,128,128) shape may not inherit the forward's efficiency.  This
times fwd, fwd+dx, fwd+dw, fwd+both for the scale-9 hot shapes.

Usage: [N=6] python benchmarks/conv_micro3.py
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
key = jax.random.PRNGKey(0)
DT = jnp.bfloat16

CASES = [
    ("base 64",   (2, 13, 256, 256, 64),  (3, 3, 3, 64, 64)),
    ("wpack 128", (2, 13, 256, 128, 128), (3, 3, 2, 128, 128)),
]


def run(label, xshape, kshape, mode):
    sp = len(kshape) - 2
    dn = ("NTHWC", "THWIO", "NTHWC")
    pads = [(k // 2, (k - 1) // 2) for k in kshape[:sp]]
    x0 = (jax.random.normal(jax.random.fold_in(key, 1), xshape) * 0.5
          ).astype(DT)
    w0 = (jax.random.normal(jax.random.fold_in(key, 2), kshape) * 0.02
          ).astype(DT)

    def conv(x, w):
        # no preferred_element_type: its f32 cotangent breaks the bf16
        # transpose rule; bf16 out matches the model's conv dtype anyway
        y = jax.lax.conv_general_dilated(
            x, w, (1,) * sp, pads, dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    if mode == "fwd":
        @jax.jit
        def f(x, w):
            return conv(x, w)
    elif mode == "dx":
        @jax.jit
        def f(x, w):
            return jnp.sum(jnp.abs(jax.grad(conv, 0)(x, w)).astype(
                jnp.float32)) * 1e-6
    elif mode == "dw":
        @jax.jit
        def f(x, w):
            return jnp.sum(jnp.abs(jax.grad(conv, 1)(x, w)).astype(
                jnp.float32)) * 1e-6
    else:  # both
        @jax.jit
        def f(x, w):
            gx, gw = jax.grad(conv, (0, 1))(x, w)
            return (jnp.sum(jnp.abs(gx).astype(jnp.float32))
                    + jnp.sum(jnp.abs(gw).astype(jnp.float32))) * 1e-6

    # chain via a scalar carry folded into x
    c = jnp.float32(0)
    for _ in range(2):  # compile + settle x2
        c = f(x0 + c.astype(DT) * 0, w0)
        float(c)
    t0 = time.perf_counter()
    for _ in range(N):
        c = f(x0 + c.astype(DT) * 0, w0)
    float(c)
    dt = (time.perf_counter() - t0) / N
    print(f"{label:>10} {mode:>4}: {dt * 1e3:7.2f} ms", flush=True)


for mode in ("fwd", "dx", "dw", "both"):
    for case in CASES:
        run(case[0], case[1], case[2], mode)
