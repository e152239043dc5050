"""Conv efficiency isolation: which dimension starves the MXU at C=64?

Cases isolate input-channel vs output-channel width, the 2D-with-T-unrolled
layout, and the space-to-depth transform shape — all bf16, chain-timed.

Usage: [N=8] python benchmarks/conv_micro2.py
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

N = int(os.environ.get("N", "8"))
key = jax.random.PRNGKey(0)
DT = jnp.bfloat16

# (label, input shape, kernel (spatial..., Ci, Co))
CASES = [
    ("3D 64->64",   (2, 13, 256, 256, 64),  (3, 3, 3, 64, 64)),
    ("3D 64->128",  (2, 13, 256, 256, 64),  (3, 3, 3, 64, 128)),
    ("3D 128->64",  (2, 13, 256, 256, 128), (3, 3, 3, 128, 64)),
    # T window unrolled into channels: same FLOPs as 3D 64->64
    ("2D 192->64",  (26, 256, 256, 192),    (3, 3, 192, 64)),
    # space-to-depth(2x2) of the 64->64 conv: 4C channels, half spatial,
    # kernel covers a 4x4 window via 2x2 taps (1.78x the FLOPs)
    ("s2d 256->256", (2, 13, 128, 128, 256), (3, 2, 2, 256, 256)),
    # both dims wide at the s9 shape (upper bound for this family)
    ("3D 128->128", (2, 13, 256, 256, 128), (3, 3, 3, 128, 128)),
    # 3D conv decomposed: one T-tap = a 2D 3x3 conv over B*T frames
    # (x3 of these + 2 adds == the 3D 64->64 conv exactly)
    ("2D 64->64",   (26, 256, 256, 64),     (3, 3, 64, 64)),
    # separable-direction probes
    ("3D k133",     (2, 13, 256, 256, 64),  (1, 3, 3, 64, 64)),
    ("3D k311",     (2, 13, 256, 256, 64),  (3, 1, 1, 64, 64)),
    # s2d WITH wide output only (64->64 original -> 256 in, 256 out needed
    # for exactness; this probes 256->128 half-tile)
    ("s2d 256->128", (2, 13, 128, 128, 256), (3, 2, 2, 256, 128)),
    # 2D s2d: frames at 128px with 256 channels, 2x2 kernel
    ("2D s2d 256->256", (26, 128, 128, 256), (2, 2, 256, 256)),
    # W-only pack of the 64->64 conv: W-pairs folded into channels, 2-tap
    # packed W kernel (exact transform = 1.33x FLOPs, all-128 channels)
    ("wpack 128->128", (2, 13, 256, 128, 128), (3, 3, 2, 128, 128)),
    # H-only pack (2-tap along H instead)
    ("hpack 128->128", (2, 13, 128, 256, 128), (3, 2, 3, 128, 128)),
    # W-pack at the scale-5 shape (102x102 -> W 51 packed; 51 odd is fine
    # for the micro — efficiency of the shape class is what's probed)
    ("wpack s5", (2, 5, 102, 51, 128), (3, 3, 2, 128, 128)),
]


def bench(label, xshape, kshape):
    spatial_dims = len(kshape) - 2
    dn = (("NTHWC", "THWIO", "NTHWC") if spatial_dims == 3
          else ("NHWC", "HWIO", "NHWC"))
    pads = [(k // 2, (k - 1) // 2) for k in kshape[:spatial_dims]]
    x = (jax.random.normal(jax.random.fold_in(key, 1), xshape) * 0.5
         ).astype(DT)
    w = (jax.random.normal(jax.random.fold_in(key, 2), kshape) * 0.02
         ).astype(DT)
    Ci, Co = kshape[-2], kshape[-1]
    scale = jnp.asarray(0.05, DT)
    half = jnp.asarray(0.5, DT)

    @jax.jit
    def f(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1,) * spatial_dims, pads, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        y = y.astype(DT) * scale
        if Co < Ci:
            y = jnp.concatenate([y] * (Ci // Co), axis=-1)
        return y[..., :Ci] + x * half

    xc = f(x)
    float(jnp.mean(xc.astype(jnp.float32)))
    xc = f(xc)
    float(jnp.mean(xc.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(N):
        xc = f(xc)
    float(jnp.mean(xc.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N
    nspatial = 1
    for d in xshape[:-1]:
        nspatial *= d
    kvol = 1
    for k in kshape[:spatial_dims]:
        kvol *= k
    flops = 2 * nspatial * Ci * Co * kvol
    print(f"{label:>13}: {dt * 1e3:7.2f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)


for case in CASES:
    bench(*case)
