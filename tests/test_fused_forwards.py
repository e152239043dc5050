"""--fused-forwards equivalence: with eval-mode BatchNorm (running stats),
the fused rec+rand forward must bitwise-match two separate passes that use
the same key stream."""
import jax
import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.core.pyramid import Pyramid
from hpvaegan_tpu.models.registry import make_generator


def test_fused_matches_separate_eval(key):
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=1)
    cfg.adjust_scales()
    cfg.ar = 1.0
    pyr = Pyramid.for_video(16, 1.0, 8, 16, 0.75, [4, 3, 2, 1], 24.0)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 3)
    gvars = G.init(key, 1)
    for i in range(3):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(key, i))

    amps = jnp.full(4, 0.3)
    rz = jax.random.normal(jax.random.fold_in(key, 1),
                           (2, *pyr.shape3d(0), 3))
    ni = jax.random.normal(jax.random.fold_in(key, 2),
                           (2, *pyr.shape3d(0), 8))
    outer = jax.random.PRNGKey(77)

    (gen_f, fake_f, vae_f, (mu_f, lv_f)), _ = G.apply_fused(
        gvars, amps, outer, rz, ni, train=False)
    (gen_s, vae_s, (mu_s, lv_s)), _ = G.apply(gvars, amps, outer,
                                              real_zero=rz, mode="rec",
                                              train=False)
    (fake_s, _, _), _ = G.apply(gvars, amps, outer, noise_init=ni,
                                mode="rand", train=False)

    np.testing.assert_allclose(np.asarray(gen_f), np.asarray(gen_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fake_f), np.asarray(fake_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vae_f), np.asarray(vae_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mu_f), np.asarray(mu_s))


def test_fused_train_mode_runs(key):
    """Train mode: combined-batch BN stats (documented deviation) — just
    assert shapes and finiteness."""
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=2)
    cfg.adjust_scales()
    cfg.ar = 1.0
    pyr = Pyramid.for_image(16, 1.0, 8, 16, 0.75)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 2)
    gvars = G.init(key, 1)
    gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 1))
    amps = jnp.ones(2)
    rz = jax.random.normal(key, (2, *pyr.shape2d(0), 3))
    ni = jax.random.normal(key, (2, *pyr.shape2d(0), 8))
    (gen, fake, vae, _), gv = G.apply_fused(gvars, amps, key, rz, ni,
                                            train=True)
    assert gen.shape == (2, *pyr.shape2d(1), 3)
    assert fake.shape == (2, *pyr.shape2d(1), 3)
    assert np.all(np.isfinite(np.asarray(gen)))
