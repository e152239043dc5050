"""RNG A/B: threefry (jax default) vs rbg (TPU hardware PRNG).

Motivated by the r2 MFU hunt: the scale-9 rand forward measured ~74 ms
with a *constant* key (threefry constant-folded at compile time) but
~1177 ms with a traced key — implicating on-device threefry, not convs,
as a dominant step cost.  This A/Bs the same programs with the key
passed as an argument, typed threefry2x32 vs rbg, plus a raw
`random.normal` volume probe.

Usage: [SCALE=9] [N=5] python benchmarks/rng_ab.py
       (env config mirrors component_breakdown: FAST/BF16/REMAT/...)
"""
import os
import sys
import time

os.environ.setdefault("SCALE", "9")
os.environ.setdefault("FAST", "1")
os.environ.setdefault("BF16", "1")
os.environ.setdefault("REMAT", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import component_breakdown as bd  # noqa: E402  (builds models/steps)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = int(os.environ.get("N", "5"))

G, gvars, amps = bd.G, bd.gvars, bd.amps
noise_init = bd.noise_init


@jax.jit
def fwd(k, c):
    ni = noise_init + 0.0 * c
    (fake, _, _), _ = G.apply(gvars, amps, k, noise_init=ni,
                              mode="rand", train=True)
    return jnp.mean(fake)


def step(k, c):
    # not re-jitted: gan_step is already jitted (mirrors bd.full_step,
    # keeps its donation semantics intact)
    out = bd.steps["gan_step"](
        jax.tree_util.tree_map(jnp.copy, bd.gvars),
        jax.tree_util.tree_map(jnp.copy, bd.dvars),
        jax.tree_util.tree_map(jnp.copy, bd.opt_g),
        jax.tree_util.tree_map(jnp.copy, bd.opt_d),
        bd.real, bd.real_zero + 0.0 * c, noise_init, amps, k)
    return out[-1]["loss"]


@jax.jit
def raw_normal(k, c):
    # roughly the per-step noise volume at the hot scale
    x = jax.random.normal(k, (2, 13, 256, 256, 64))
    return jnp.mean(x) + 0.0 * c


def chain(fn, keys, label):
    try:
        c = jnp.float32(0)
        c = fn(keys[0], c)
        float(c)  # compile + settle
        c = fn(keys[1], c)
        float(c)  # second settle
        n = len(keys) - 2
        t0 = time.perf_counter()
        for k in keys[2:]:
            c = fn(k, c)
        v = float(c)
        dt = (time.perf_counter() - t0) / n
    except Exception as e:
        print(f"{label:>24}: FAILED ({type(e).__name__}: {str(e)[:110]})",
              flush=True)
        return float("nan")
    print(f"{label:>24}: {dt * 1e3:8.1f} ms  (n={n}, v={v:.3f})", flush=True)
    return dt


def keyset(impl, n):
    base = jax.random.key(7, impl=impl)
    return [jax.random.fold_in(base, i) for i in range(n)]


for impl in ("threefry2x32", "rbg"):
    chain(raw_normal, keyset(impl, 8 + 2), f"normal 54M [{impl}]")
    chain(fwd, keyset(impl, N + 2), f"rand_fwd [{impl}]")
    chain(step, keyset(impl, max(3, N // 2) + 2), f"full_step [{impl}]")
