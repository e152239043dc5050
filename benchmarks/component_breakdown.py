"""Component-level time breakdown of the GAN train step at one scale.

Locates where the step time goes before optimizing (VERDICT r2 item 3 —
the r1 cost analysis diagnosed ~21% MFU but never attributed it).  Each
component is its own jitted program, chain-timed through the relay by
threading a scalar carry through consecutive calls (the axon relay's
block_until_ready is not a reliable barrier; a dependent-chain + one
scalar fetch is).

Components:
  rand_fwd      G rand-mode forward (fake generation)
  rec_fwd       G rec-mode forward (encoder + decoder + pyramid)
  g_grads       generator update grads (rec fwd + rand fwd + adv term)
  d_fwd         critic forward on [real|fake]
  d_grads_nogp  critic grads, Wasserstein terms only
  gp_grads      critic grads, gradient-penalty double-backprop only
  full_step     the real fused gan_step (reference composition)

Usage: [SCALE=9] [FAST=1] [BF16=1] [REMAT=1] [REMAT_BLOCKS=1] [GPCHUNK=0|1|2]
       [CPU=1 SMALL=1] python benchmarks/component_breakdown.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CPU", "0") == "1":  # smoke-test path
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hpvaegan_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.losses import calc_gradient_penalty, mse
from hpvaegan_tpu.models.registry import make_discriminator, make_generator
from hpvaegan_tpu.train.optim import (build_d_optimizer, build_g_optimizer,
                                      dparams_view, gparams_view,
                                      hpvaegan_group_plan, merge_dparams,
                                      merge_gparams, scatter_grads,
                                      trainable_merge, trainable_split)
from hpvaegan_tpu.train.steps import (apply_disc, make_hpvaegan_steps,
                                      update_d_spectral, update_g_spectral)
from hpvaegan_tpu.train.trainer import init_discriminator
from hpvaegan_tpu.models.generators import _remat_level

SCALE = int(os.environ.get("SCALE", "9"))

if os.environ.get("SMALL", "0") == "1":  # CPU smoke-test config
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1,
                 vae_levels=3, batch_size=2, img_size=32, min_size=8,
                 max_size=32)
else:
    cfg = Config(nfc=64, latent_dim=128, num_layer=5, enc_blocks=2,
                 vae_levels=3, batch_size=2, img_size=256, min_size=32,
                 max_size=256)
cfg.remat = os.environ.get("REMAT", "0") == "1"
cfg.remat_blocks = os.environ.get("REMAT_BLOCKS", "0") == "1"
# GPCHUNK=0: batched GP; 1: lax.map per-sample; 2: unrolled per-sample
_gpchunk_mode = os.environ.get("GPCHUNK", "0")
if _gpchunk_mode not in ("0", "1", "2"):
    raise SystemExit(f"GPCHUNK={_gpchunk_mode!r} invalid: 0=batched, 1=lax.map, 2=unroll")
cfg.gp_chunked = {"0": False, "1": True, "2": "unroll"}[_gpchunk_mode]
cfg.fast_grads = os.environ.get("FAST", "0") == "1"
cfg.bf16 = os.environ.get("BF16", "0") == "1"
cfg.wpack = os.environ.get("WPACK", "0") == "1"
# PCONV=1: critic-only packed Pallas conv (the shipped --pconv);
# PCONV=2: generator stages too (--pconv-all, measured slower)
_pconv_mode = os.environ.get("PCONV", "0")
cfg.pconv = _pconv_mode in ("1", "2")
cfg.pconv_all = _pconv_mode == "2"
cfg.pfuse = os.environ.get("PFUSE", "0") == "1"  # fused critic conv pairs
cfg.adjust_scales()
cfg.ar = 1.0
cfg.scale_idx = SCALE

from _geometry import make_pyramid, noise_init_shape, shape_at  # noqa: E402

NDIM = 3
pyr = make_pyramid(cfg, NDIM)
key = jax.random.PRNGKey(0)
G = make_generator("GeneratorHPVAEGAN", cfg, pyr, NDIM)
gvars = G.init(key, 1)
for i in range(SCALE):
    gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 100 + i))
batch = 2
D = make_discriminator("WDiscriminator3D", cfg, NDIM)
dvars = init_discriminator(D, jax.random.fold_in(key, 1),
                           (batch, *shape_at(pyr, SCALE, NDIM), 3))
pview = gparams_view(gvars)
ml, bl, lrs = hpvaegan_group_plan(cfg, SCALE, len(gvars["body"]))
tx_g, opt_g = build_g_optimizer(cfg, pview, ml, bl, lrs, cfg.grad_clip)
tx_d, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
steps = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d, group_plan=(ml, bl))

real = jax.random.normal(jax.random.fold_in(key, 2),
                         (batch, *shape_at(pyr, SCALE, NDIM), 3))
real_zero = jax.random.normal(jax.random.fold_in(key, 3),
                              (batch, *shape_at(pyr, 0, NDIM), 3))
noise_init = jax.random.normal(
    jax.random.fold_in(key, 4),
    noise_init_shape(pyr, batch, cfg.latent_dim, NDIM))
amps = jnp.full(SCALE + 1, 0.1, jnp.float32)
use_remat = _remat_level(cfg)
use_fast = cfg.fast_grads
group_plan = (ml, bl)


def g_value_and_grad(gv, loss_of_pview):
    pv = gparams_view(gv)
    if not use_fast:
        (val, aux), grads = jax.value_and_grad(loss_of_pview,
                                               has_aux=True)(pv)
        return (val, aux), grads
    train_sub, frozen_sub = trainable_split(pv, *group_plan)

    def loss_of_trainable(tsub):
        return loss_of_pview(trainable_merge(pv, tsub, frozen_sub))

    (val, aux), tgrads = jax.value_and_grad(loss_of_trainable,
                                            has_aux=True)(train_sub)
    return (val, aux), scatter_grads(pv, tgrads)


# ---- component jits: all take a scalar carry `c` that perturbs an input
# so consecutive calls form a dependency chain ----

def _k(c):
    return jax.random.fold_in(key, (c * 0).astype(jnp.int32)[()] + 7)


@jax.jit
def rand_fwd(c):
    ni = noise_init + 0.0 * c
    (fake, _, _), _ = G.apply(gvars, amps, _k(c), noise_init=ni,
                              mode="rand", train=True)
    return jnp.mean(fake)


@jax.jit
def rec_fwd(c):
    rz = real_zero + 0.0 * c
    (out, _, _), _ = G.apply(gvars, amps, _k(c), real_zero=rz, mode="rec",
                             train=True)
    return jnp.mean(out)


@jax.jit
def g_grads(c):
    rz = real_zero + 0.0 * c

    def loss_fn(pv):
        gv = merge_gparams(gvars, pv)
        (generated, _, _), gv1 = G.apply(gv, amps, _k(c), real_zero=rz,
                                         mode="rec", train=True)
        (fake_g, _, _), _ = G.apply(gv1, amps, _k(c), noise_init=noise_init,
                                    mode="rand", train=True)
        rec = mse(generated, real)
        out_fake, _ = apply_disc(D, dvars, fake_g, train=True,
                                 remat=use_remat)
        return cfg.rec_weight * rec - jnp.mean(out_fake), (rec,)

    (val, _), grads = g_value_and_grad(gvars, loss_fn)
    return val + jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)) * 1e-12, grads, jnp.float32(0))


@jax.jit
def d_fwd(c):
    x = jnp.concatenate([real + 0.0 * c, real * 0.5], axis=0)
    out, _ = apply_disc(D, update_d_spectral(dvars), x, train=True,
                        remat=use_remat)
    return jnp.mean(out)


@jax.jit
def d_grads_nogp(c):
    fake = real * 0.5 + 0.0 * c

    def loss_fn(dp):
        dv = merge_dparams(dvars, dp)
        out, _ = apply_disc(D, dv, jnp.concatenate([real, fake], axis=0),
                            train=True, remat=use_remat)
        nb = real.shape[0]
        return -jnp.mean(out[:nb]) + jnp.mean(out[nb:])

    val, grads = jax.value_and_grad(loss_fn)(dparams_view(dvars))
    return val + jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)) * 1e-12, grads, jnp.float32(0))


@jax.jit
def gp_grads(c):
    fake = real * 0.5 + 0.0 * c
    # mirror train/steps.py: the GP always runs the lax critic
    D_gp = D.clone(pconv=False) if getattr(D, "pconv", False) else D

    def loss_fn(dp):
        dv = merge_dparams(dvars, dp)
        return calc_gradient_penalty(
            lambda x: apply_disc(D_gp, dv, x, train=True, remat=use_remat)[0],
            real, fake, cfg.lambda_grad, _k(c),
            chunked=cfg.gp_chunked)

    val, grads = jax.value_and_grad(loss_fn)(dparams_view(dvars))
    return val + jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)) * 1e-12, grads, jnp.float32(0))


def full_step(c):
    # the real fused step; carry threads through the key
    out = steps["gan_step"](
        jax.tree_util.tree_map(jnp.copy, gvars),
        jax.tree_util.tree_map(jnp.copy, dvars),
        jax.tree_util.tree_map(jnp.copy, opt_g),
        jax.tree_util.tree_map(jnp.copy, opt_d),
        real, real_zero, noise_init, amps, _k(c))
    return out[-1]["loss"]


def chain_time(fn, n, label):
    try:
        c = jnp.float32(0)
        c = fn(c)
        float(c)  # compile + settle
        c = fn(c)
        float(c)  # second settle: first post-compile run can be slow
        t0 = time.perf_counter()
        for _ in range(n):
            c = fn(c) + 0.0 * c
        v = float(c)
        dt = (time.perf_counter() - t0) / n
    except Exception as e:  # OOM etc.: keep measuring the rest
        print(f"{label:>14}: FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)
        return float("nan")
    print(f"{label:>14}: {dt * 1e3:8.1f} ms  (chain n={n}, v={v:.3f})",
          flush=True)
    return dt


ALL_COMPONENTS = ["rand_fwd", "rec_fwd", "g_grads", "d_fwd",
                  "d_grads_nogp", "gp_grads", "full_step"]


def main():
    n = int(os.environ.get("N", "5"))
    sel = os.environ.get("COMPONENTS", "")
    names = [s for s in sel.split(",") if s] or ALL_COMPONENTS
    fns = {"rand_fwd": rand_fwd, "rec_fwd": rec_fwd, "g_grads": g_grads,
           "d_fwd": d_fwd, "d_grads_nogp": d_grads_nogp,
           "gp_grads": gp_grads, "full_step": full_step}
    res = {}
    for name in names:
        cn = max(3, n // 2) if name == "full_step" else n
        res[name] = chain_time(fns[name], cn, name)
    if all(k in res for k in
           ("g_grads", "d_grads_nogp", "gp_grads", "rand_fwd", "full_step")):
        comp_sum = (res["g_grads"] + res["d_grads_nogp"] + res["gp_grads"]
                    + res["rand_fwd"])
        print(f"components (g_grads+d_nogp+gp+rand_fwd) sum "
              f"{comp_sum * 1e3:.1f} ms vs full "
              f"{res['full_step'] * 1e3:.1f} ms", flush=True)
    print(json.dumps({k: round(v * 1e3, 1) for k, v in res.items()}),
          flush=True)


if __name__ == "__main__":
    main()
