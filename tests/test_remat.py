"""Rematerialization (--remat / jax.checkpoint) must not change training
math — only the memory/FLOPs trade.

Compares forward values and raw GRADIENTS with/without remat.  (Post-Adam
params are deliberately not compared: Adam's first-step update divides a
near-zero gradient by its own magnitude, so benign recompute rounding can
flip an element's sign and shift a param by 2*lr.)"""
import jax
import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.core.pyramid import Pyramid
from hpvaegan_tpu.losses import calc_gradient_penalty
from hpvaegan_tpu.models.registry import make_discriminator, make_generator
from hpvaegan_tpu.train.optim import gparams_view, merge_gparams, dparams_view, merge_dparams
from hpvaegan_tpu.train.steps import apply_disc
from hpvaegan_tpu.train.trainer import init_discriminator


def _setup(remat):
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1,
                 vae_levels=1, batch_size=2, img_size=16, min_size=8,
                 max_size=16)
    cfg.remat = bool(remat)
    cfg.remat_blocks = (remat == "blocks")
    cfg.adjust_scales()
    cfg.ar = 1.0
    scale = 2
    cfg.scale_idx = scale
    pyr = Pyramid.for_video(16, 1.0, 8, 16, cfg.scale_factor_init,
                            (4, 3, 2, 1), 24.0)
    key = jax.random.PRNGKey(0)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 3)
    gvars = G.init(key, 1)
    for i in range(scale):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 100 + i))
    D = make_discriminator("WDiscriminator3D", cfg, 3)
    dvars = init_discriminator(D, jax.random.fold_in(key, 1),
                               (2, *pyr.shape3d(scale), 3))
    real = jax.random.normal(jax.random.fold_in(key, 2),
                             (2, *pyr.shape3d(scale), 3))
    real_zero = jax.random.normal(jax.random.fold_in(key, 3),
                                  (2, *pyr.shape3d(0), 3))
    amps = jnp.full(scale + 1, 0.1, jnp.float32)
    return cfg, G, gvars, D, dvars, real, real_zero, amps, key, remat


def _g_grads(remat):
    cfg, G, gvars, D, dvars, real, real_zero, amps, key, _ = _setup(remat)

    def loss(pview):
        gv = merge_gparams(gvars, pview)
        (out, vae_out, (mu, logvar)), _ = G.apply(
            gv, amps, jax.random.fold_in(key, 9), real_zero=real_zero,
            mode="rec", train=True)
        return (jnp.mean((out - real) ** 2)
                + jnp.mean(vae_out ** 2) + jnp.mean(mu ** 2))

    val, grads = jax.jit(jax.value_and_grad(loss))(gparams_view(gvars))
    return float(val), jax.tree_util.tree_leaves(grads)


def _d_grads(remat, chunked=False):
    """Gradient-penalty double-backprop through a (possibly rematted)
    critic forward."""
    cfg, G, gvars, D, dvars, real, real_zero, amps, key, rm = _setup(remat)
    fake = jax.random.normal(jax.random.fold_in(key, 8), real.shape)

    def loss(dview):
        dv = merge_dparams(dvars, dview)
        out, _ = apply_disc(D, dv, real, train=True, remat=rm)
        gp = calc_gradient_penalty(
            lambda x: apply_disc(D, dv, x, train=True, remat=rm)[0],
            real, fake, 0.1, jax.random.fold_in(key, 10), chunked=chunked)
        return -jnp.mean(out) + gp

    val, grads = jax.jit(jax.value_and_grad(loss))(dparams_view(dvars))
    return float(val), jax.tree_util.tree_leaves(grads)


import pytest


@pytest.mark.parametrize("level", [True, "blocks"])
def test_generator_grads_match(level):
    v0, g0 = _g_grads(False)
    v1, g1 = _g_grads(level)
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    assert len(g0) == len(g1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.parametrize("level", [True, "blocks"])
def test_critic_gp_grads_match(level):
    v0, g0 = _d_grads(False)
    v1, g1 = _d_grads(level)
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_chunked_gp_matches_batched():
    """Per-sample GP (lax.map AND unrolled) == batched GP for the
    per-sample SN critic."""
    v0, g0 = _d_grads(False, chunked=False)
    for mode in (True, "unroll"):
        v1, g1 = _d_grads(False, chunked=mode)
        np.testing.assert_allclose(v0, v1, rtol=1e-6)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
