#!/usr/bin/env python
"""Fused conv-pair kernel (ops/pallas/conv3d_fuse.py) micro A/B on TPU.

Checks exactness vs the unfused chain at the scale-9 shape class, then
chain-times forward and forward+backward for: XLA unfused pair, pconv
unfused pair (2x conv3d64), and the fused pair kernel.

Usage: [SHAPE=2,13,256,256] [DTYPE=bf16] python benchmarks/pfuse_micro.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpvaegan_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import hpvaegan_tpu.ops.pallas.conv3d_fuse as cf
import hpvaegan_tpu.ops.pallas.conv3d_pack as cp

SHAPE = tuple(int(v) for v in os.environ.get("SHAPE", "2,13,256,256").split(","))
DTYPE = jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16" else jnp.float32
N = int(os.environ.get("N", "30"))


def lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=dn) + b.astype(x.dtype)


def xla_pair(x, w1, b1, w2, b2):
    return lrelu(conv(lrelu(conv(x, w1, b1)).astype(x.dtype), w2, b2))


def pconv_pair(x, w1, b1, w2, b2):
    z = lrelu(cp.conv3d64(x, w1, b1))
    return lrelu(cp.conv3d64(z.astype(x.dtype), w2, b2))


def chain(fn, args, n, tag):
    """Dependent chain ended by one scalar fetch (CLAUDE.md protocol)."""
    x = args[0]
    t0 = time.perf_counter()
    cur = x
    for i in range(n):
        cur = fn(cur, *args[1:])
        cur = cur * (1.0 + 1e-6 * i)  # dependency, negligible work
    val = float(jnp.sum(cur[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{tag}: {dt:.2f} ms/call  (fetch {val:.3e})", flush=True)
    return dt


def chain_grad(fn, args, n, tag):
    g = jax.jit(jax.grad(lambda x, *rest: jnp.sum(
        fn(x, *rest).astype(jnp.float32) ** 2), argnums=(0, 1, 3)))
    x = args[0]
    t0 = time.perf_counter()
    cur = x
    for i in range(n):
        dx, dw1, dw2 = g(cur, *args[1:])
        cur = (cur + 1e-6 * dx.astype(cur.dtype))
    val = float(jnp.sum(cur[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{tag}: {dt:.2f} ms/call  (fetch {val:.3e})", flush=True)
    return dt


def main():
    print(f"device={jax.devices()[0].platform} shape={SHAPE} "
          f"dtype={DTYPE.__name__}", flush=True)
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (*SHAPE, 64)) * 0.5).astype(DTYPE)
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 64, 64)) * 0.05
    b1 = jax.random.normal(jax.random.fold_in(key, 2), (64,)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, 3, 64, 64)) * 0.05
    b2 = jax.random.normal(jax.random.fold_in(key, 4), (64,)) * 0.1
    args = (x, w1, b1, w2, b2)

    fns = {
        "xla  ": jax.jit(xla_pair),
        "pconv": jax.jit(pconv_pair),
        "pfuse": jax.jit(cf.conv3d64_pair),
    }
    # ---- exactness on the real hardware ----
    ref = fns["xla  "](*args).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    for tag, fn in fns.items():
        got = fn(*args).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref))) / max(scale, 1.0)
        print(f"{tag} rel err vs xla: {err:.2e}", flush=True)

    print("-- forward --", flush=True)
    for tag, fn in fns.items():
        chain(fn, args, N, tag)
    print("-- fwd+bwd (dx, dw1, dw2) --", flush=True)
    for tag, fn in {k: v for k, v in fns.items()}.items():
        chain_grad(fn, args, max(N // 3, 5), tag)


if __name__ == "__main__":
    main()
