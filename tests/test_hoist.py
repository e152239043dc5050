"""Frozen-prefix hoist (--hoist-prefix with --fast-grads, opt-in).

The hoisted step computes the frozen generator prefix (encoder/decoder +
frozen body stages) ONCE per iteration and reuses the critic-step rand
prefix in the generator step (train/steps.py hoist_idx).  Training math
must be unchanged vs the unhoisted fast step: the prefix activations are
identical constants either way (same frozen params, same k_fake stream).
Only frozen-prefix BatchNorm running averages may differ (they see the
rec forward's update but not the rand forward's — documented PARITY
deviation; training math never reads running stats).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.core.pyramid import Pyramid
from hpvaegan_tpu.models.registry import make_discriminator, make_generator
from hpvaegan_tpu.train.optim import (build_d_optimizer, build_g_optimizer,
                                      dparams_view, gparams_view,
                                      hpvaegan_group_plan)
from hpvaegan_tpu.train.steps import make_hpvaegan_steps
from hpvaegan_tpu.train.trainer import init_discriminator


def _setup(ndim, hoist, key, scale=3, vae_levels=1):
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=32, img_size=32, vae_levels=vae_levels,
                 batch_size=2)
    cfg.adjust_scales()
    cfg.ar = 1.0
    cfg.scale_idx = scale
    cfg.fast_grads = True
    cfg.hoist_prefix = hoist
    if ndim == 3:
        pyr = Pyramid.for_video(32, 1.0, 8, 32, 0.75, [4, 3, 2, 1], 24.0)
        shape = pyr.shape3d
    else:
        pyr = Pyramid.for_image(32, 1.0, 8, 32, 0.75)
        shape = pyr.shape2d
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, ndim)
    gvars = G.init(key, 1)
    for i in range(scale):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 100 + i))
    D = make_discriminator("WDiscriminator3D" if ndim == 3
                           else "WDiscriminator2D", cfg, ndim)
    batch = 2
    dvars = init_discriminator(D, jax.random.fold_in(key, 1),
                               (batch, *shape(scale), 3))
    pview = gparams_view(gvars)
    ml, bl, lrs = hpvaegan_group_plan(cfg, scale, len(gvars["body"]))
    tx_g, opt_g = build_g_optimizer(cfg, pview, ml, bl, lrs, cfg.grad_clip)
    tx_d, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
    steps = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d, group_plan=(ml, bl))

    real = jax.random.normal(jax.random.fold_in(key, 2),
                             (batch, *shape(scale), 3))
    real_zero = jax.random.normal(jax.random.fold_in(key, 3),
                                  (batch, *shape(0), 3))
    if ndim == 3:
        ni_shape = (batch, pyr.td(0), *pyr.shape2d(0), cfg.latent_dim)
    else:
        ni_shape = (batch, *pyr.shape2d(0), cfg.latent_dim)
    noise_init = jax.random.normal(jax.random.fold_in(key, 4), ni_shape)
    amps = jnp.full(scale + 1, 0.3, jnp.float32)
    state = [gvars, dvars, opt_g, opt_d]
    return steps, state, (real, real_zero, noise_init, amps)


def _run(steps, state, inputs, key, n=3):
    real, real_zero, noise_init, amps = inputs
    ms = []
    for i in range(n):
        *state, m = steps["gan_step"](*state, real, real_zero, noise_init,
                                      amps, jax.random.fold_in(key, 50 + i))
        ms.append(m)
    return state, ms


@pytest.mark.parametrize("ndim", [2, 3])
def test_hoist_matches_unhoisted_fast_step(ndim, key):
    steps_h, state_h, inputs = _setup(ndim, True, key)
    steps_u, state_u, _ = _setup(ndim, False, key)

    state_h, ms_h = _run(steps_h, state_h, inputs, key)
    state_u, ms_u = _run(steps_u, state_u, inputs, key)

    for mh, mu in zip(ms_h, ms_u):
        for name in ("loss", "rec_loss", "errG", "errD_real", "errD_fake",
                     "gradient_penalty"):
            np.testing.assert_allclose(np.asarray(mh[name]),
                                       np.asarray(mu[name]),
                                       rtol=2e-5, atol=1e-6, err_msg=name)

    # params (generator + critic) track each other through 3 updates
    for a, b in zip(jax.tree_util.tree_leaves(gparams_view(state_h[0])),
                    jax.tree_util.tree_leaves(gparams_view(state_u[0]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_h[1]["params"]),
                    jax.tree_util.tree_leaves(state_u[1]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_hoist_engages_only_when_prefix_frozen(key):
    """VAE-phase plans (encoder trainable) must not hoist; GAN-phase plans
    with a frozen prefix must."""
    from hpvaegan_tpu.train import steps as steps_mod  # noqa: F401
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=32, img_size=32, vae_levels=1)
    cfg.adjust_scales()
    cfg.fast_grads = True
    # GAN phase at scale 3: body = [frozen, frozen, b0] -> hoistable
    ml, bl, _ = hpvaegan_group_plan(cfg, 3, 3)
    assert all(lab == "frozen" for lab in ml.values())
    assert bl[:2] == ["frozen", "frozen"] and bl[2] != "frozen"
    # VAE phase at scale 0: encoder trainable -> not hoistable
    ml0, bl0, _ = hpvaegan_group_plan(cfg, 0, 1)
    assert ml0["encode"] != "frozen"


def test_hoisted_scan_matches_unhoisted_scan(key):
    """The scan path wraps the same hoisted body — a K-iteration hoisted
    scan must match the unhoisted scan.  (Scan vs SEQUENTIAL steps differ
    at ~1e-3 after two Adam updates with or without the hoist — XLA
    program-level reassociation amplified through Adam's sqrt(v)
    normalization, a pre-existing scan property, not a hoist one.)"""
    k = 2

    def scan_run(hoist):
        steps, state, inputs = _setup(3, hoist, key)
        real, real_zero, noise_init, amps = inputs
        keys = jnp.stack([jax.random.fold_in(key, 50 + i) for i in range(k)])
        reals = jnp.broadcast_to(real, (k, *real.shape))
        rzs = jnp.broadcast_to(real_zero, (k, *real_zero.shape))
        nis = jnp.broadcast_to(noise_init, (k, *noise_init.shape))
        *state, ms = steps["gan_scan_step"](*state, reals, rzs, nis,
                                            amps, keys)
        return state, ms

    state_h, ms_h = scan_run(True)
    state_u, ms_u = scan_run(False)
    np.testing.assert_allclose(np.asarray(ms_h["loss"]),
                               np.asarray(ms_u["loss"]),
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gparams_view(state_h[0])),
                    jax.tree_util.tree_leaves(gparams_view(state_u[0]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
