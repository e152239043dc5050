#!/usr/bin/env python
"""A/B: scoped-VMEM fusion budget on the benched scale-5 step.

Hypothesis (BENCHMARKS.md "Where the scale-5 floor stands"): the scale-5
fast-stack step is HBM-traffic bound (89% of peak); raising the compiler's
scoped-VMEM budget lets the fusion pass build deeper fusions (fewer HBM
round-trips between ops), which is the one compiler-level lever against a
traffic floor.  `--xla_tpu_scoped_vmem_limit_kib` is a libtpu flag — it is
NOT registered in the local jaxlib client (XLA_FLAGS aborts the process),
so it must travel through the AOT `compiled = jit(f).lower(...).compile(
compiler_options=...)` path, which serializes options into the (remote)
compile request.

Usage (fresh process per cell, per CLAUDE.md A/B protocol):
    python benchmarks/vmem_ab.py            # default budget (control)
    VMEM_KIB=65536 python benchmarks/vmem_ab.py   # 4x the ~16MB default

Reuses bench.py's exact workload builder so the timed program is the
driver's benched one (scale-5 3D GAN, fast stack, scan-10).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench

    from hpvaegan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from hpvaegan_tpu.core.config import Config
    from hpvaegan_tpu.core.pyramid import Pyramid
    from hpvaegan_tpu.models.registry import (make_discriminator,
                                              make_generator)
    from hpvaegan_tpu.train.optim import (build_d_optimizer,
                                          build_g_optimizer, dparams_view,
                                          gparams_view, hpvaegan_group_plan)
    from hpvaegan_tpu.train.steps import make_hpvaegan_steps
    from hpvaegan_tpu.train.trainer import init_discriminator

    fp = bench.FINGERPRINT
    scale = bench.SCALE_IDX
    scan_k = 10
    iters = 30

    cfg = Config(nfc=fp["nfc"], latent_dim=fp["latent_dim"],
                 num_layer=fp["num_layer"], enc_blocks=fp["enc_blocks"],
                 vae_levels=fp["vae_levels"], batch_size=fp["batch"],
                 img_size=fp["img_size"], min_size=fp["min_size"],
                 max_size=fp["max_size"])
    cfg.adjust_scales()
    cfg.ar = 1.0
    cfg.scale_idx = scale
    cfg.fast_grads = True
    cfg.bf16 = True
    pyr = Pyramid.for_video(fp["img_size"], 1.0, fp["min_size"],
                            fp["max_size"], cfg.scale_factor_init,
                            fp["sampling_rates"], 30.0)

    key = jax.random.PRNGKey(0)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 3)
    gvars = G.init(key, 1)
    for i in range(scale):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 100 + i))
    D = make_discriminator("WDiscriminator3D", cfg, 3)
    batch = fp["batch"]
    dvars = init_discriminator(D, jax.random.fold_in(key, 1),
                               (batch, *pyr.shape3d(scale), 3))
    pview = gparams_view(gvars)
    ml, bl, lrs = hpvaegan_group_plan(cfg, scale, len(gvars["body"]))
    tx_g, opt_g = build_g_optimizer(cfg, pview, ml, bl, lrs, cfg.grad_clip)
    tx_d, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
    steps = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d, group_plan=(ml, bl))

    real = jax.random.normal(jax.random.fold_in(key, 2),
                             (batch, *pyr.shape3d(scale), 3))
    real_zero = jax.random.normal(jax.random.fold_in(key, 3),
                                  (batch, *pyr.shape3d(0), 3))
    noise_init = jax.random.normal(
        jax.random.fold_in(key, 4),
        (batch, pyr.td(0), *pyr.shape2d(0), cfg.latent_dim))
    amps = jnp.full(scale + 1, 0.1, jnp.float32)
    reals = jnp.broadcast_to(real, (scan_k, *real.shape))
    rzs = jnp.broadcast_to(real_zero, (scan_k, *real_zero.shape))
    nis = jnp.broadcast_to(noise_init, (scan_k, *noise_init.shape))
    keys0 = jax.random.split(jax.random.fold_in(key, 10), scan_k)

    vmem_kib = os.environ.get("VMEM_KIB")
    opts = None
    if vmem_kib:
        opts = {"xla_tpu_scoped_vmem_limit_kib": vmem_kib}
    print(f"[vmem_ab] compiler_options={opts}", file=sys.stderr, flush=True)

    args = (gvars, dvars, opt_g, opt_d, reals, rzs, nis, amps, keys0)
    t0 = time.perf_counter()
    lowered = steps["gan_scan_step"].lower(*args)
    compiled = lowered.compile(compiler_options=opts) if opts else \
        lowered.compile()
    print(f"[vmem_ab] compile {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    def run_chain(state, n, seed):
        metrics = None
        for i in range(0, n, scan_k):
            keys = jax.random.split(jax.random.fold_in(key, seed + i),
                                    scan_k)
            *state, metrics = compiled(*state, reals, rzs, nis, amps, keys)
        return state, float(jnp.ravel(metrics["loss"])[-1])

    state = [gvars, dvars, opt_g, opt_d]
    t0 = time.perf_counter()
    state, _ = run_chain(state, scan_k * 3, 10)   # warmup incl. first fence
    print(f"[vmem_ab] warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, _ = run_chain(state, iters, 50)
    dt = time.perf_counter() - t0
    print(f"[vmem_ab] vmem_kib={vmem_kib or 'default'} "
          f"{iters} iters in {dt:.2f}s -> {iters / dt:.3f} it/s", flush=True)


if __name__ == "__main__":
    main()
