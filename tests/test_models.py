"""Model zoo structural tests: shape algebra across scales, stage growth,
spectral-norm convergence, 2D/3D noise-injection asymmetry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.core.pyramid import Pyramid
from hpvaegan_tpu.models.blocks import spectral_update
from hpvaegan_tpu.models.registry import make_discriminator, make_generator


def tiny_cfg(**kw):
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=2, **kw)
    cfg.adjust_scales()
    cfg.ar = 1.0
    return cfg


@pytest.fixture
def cfg():
    return tiny_cfg()


@pytest.fixture
def pyr2(cfg):
    return Pyramid.for_image(16, 1.0, 8, 16, 0.75)


@pytest.fixture
def pyr3(cfg):
    return Pyramid.for_video(16, 1.0, 8, 16, 0.75, [4, 3, 2, 1], 24.0)


def test_generator_output_tracks_scale(cfg, pyr2, key):
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr2, 2)
    gvars = G.init(key, 1)
    x0 = jnp.zeros((1, *pyr2.shape2d(0), 3))
    amps = jnp.ones(pyr2.stop_scale + 1)
    for scale in range(pyr2.stop_scale + 1):
        if scale > 0:
            gvars = G.init_next_stage(gvars, jax.random.fold_in(key, scale))
        (out, vae, (mu, logvar)), _ = G.apply(gvars, amps, key, real_zero=x0,
                                              mode="rec", train=True)
        assert out.shape == (1, *pyr2.shape2d(scale), 3)
        assert vae.shape == (1, *pyr2.shape2d(0), 3)
        assert mu.shape == (1, *pyr2.shape2d(0), 8)


def test_generator_3d_output_tracks_scale(cfg, pyr3, key):
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr3, 3)
    gvars = G.init(key, 1)
    x0 = jnp.zeros((1, *pyr3.shape3d(0), 3))
    amps = jnp.ones(pyr3.stop_scale + 1)
    for scale in range(min(3, pyr3.stop_scale) + 1):
        if scale > 0:
            gvars = G.init_next_stage(gvars, jax.random.fold_in(key, scale))
        (out, _, _), _ = G.apply(gvars, amps, key, real_zero=x0, mode="rec")
        assert out.shape == (1, *pyr3.shape3d(scale), 3)


def test_stage_growth_copies_last_stage(cfg, pyr2, key):
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr2, 2)
    gvars = G.init(key, 1)
    gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 1))
    gvars = G.init_next_stage(gvars)
    assert len(gvars["body"]) == 2
    a = jax.tree_util.tree_leaves(gvars["body"][0]["params"])
    b = jax.tree_util.tree_leaves(gvars["body"][1]["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_rand_mode_returns_pair_not_triple(cfg, pyr2, key):
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr2, 2)
    gvars = G.init(key, 1)
    noise = jax.random.normal(key, (1, *pyr2.shape2d(0), 8))
    (out, vae, stats), _ = G.apply(gvars, jnp.ones(1), key, noise_init=noise,
                                   mode="rand")
    assert stats is None


def test_noise_injection_asymmetry(cfg, pyr2, pyr3):
    G2 = make_generator("GeneratorHPVAEGAN", cfg, pyr2, 2)
    G3 = make_generator("GeneratorHPVAEGAN", cfg, pyr3, 3)
    assert G2.noise_all_stages is True    # networks_2d.py:261
    assert G3.noise_all_stages is False   # networks_3d.py:398


def test_eval_reparameterize_is_pure_noise(cfg, pyr2, key):
    """Reference quirk: eval-mode reparameterize ignores mu
    (networks_3d.py:34-35) -> two eval rec passes with different keys give
    different vae outputs."""
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr2, 2)
    gvars = G.init(key, 1)
    x0 = jnp.ones((1, *pyr2.shape2d(0), 3)) * 0.3
    (_, vae_a, _), _ = G.apply(gvars, jnp.ones(1), jax.random.PRNGKey(1),
                               real_zero=x0, mode="rec", train=False)
    (_, vae_b, _), _ = G.apply(gvars, jnp.ones(1), jax.random.PRNGKey(2),
                               real_zero=x0, mode="rec", train=False)
    assert not np.allclose(np.asarray(vae_a), np.asarray(vae_b))


def test_discriminator_patch_map(cfg, key):
    D = make_discriminator("WDiscriminator2D", cfg, 2)
    x = jnp.zeros((2, 16, 16, 3))
    dvars = D.init(key, x)
    out = D.apply(dvars, x)
    assert out.shape == (2, 16, 16, 1)  # all convs SAME-pad: per-patch map
    assert "spectral" in dvars


def test_baselines_discriminator(cfg, key):
    D = make_discriminator("WDiscriminatorBaselines", cfg, 3)
    x = jnp.zeros((1, 4, 8, 8, 3))
    dvars = D.init(key, x, True)
    out, upd = D.apply(dvars, x, True, mutable=["batch_stats"])
    # input padded by num_layer+2=4 each side; 3 convs with pad=1 keep size
    assert out.shape == (1, 4 + 8, 8 + 8, 8 + 8, 1)
    assert "batch_stats" in dvars


def test_spectral_update_converges_to_top_singular_value(key):
    from hpvaegan_tpu.models.networks import WDiscriminator
    cfg = tiny_cfg()
    D = WDiscriminator(nfc=8, ker_size=3, num_layer=1, ndim=2)
    dvars = D.init(key, jnp.zeros((1, 8, 8, 3)))
    params, spectral = dvars["params"], dvars["spectral"]
    spectral = spectral_update(params, spectral, n_iter=100)
    kernel = np.asarray(params["head"]["kernel"])
    w = kernel.reshape(-1, kernel.shape[-1]).T
    sigma_true = np.linalg.svd(w, compute_uv=False)[0]
    u = np.asarray(spectral["head"]["u"])
    v = np.asarray(spectral["head"]["v"])
    sigma_est = u @ w @ v
    assert np.isclose(sigma_est, sigma_true, rtol=1e-3)


def test_vae_nb_generator(cfg, pyr2, key):
    G = make_generator("GeneratorVAE_nb", cfg, pyr2, 2)
    gvars = G.init(key, 1)
    gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 1))
    x0 = jnp.zeros((1, *pyr2.shape2d(0), 3))
    (out, vae, (mu, logvar, bern)), _ = G.apply(gvars, jnp.ones(2), key,
                                                real_zero=x0, mode="rec")
    assert mu.shape == (1, 1, 1, 8)      # globally pooled latent
    assert bern.shape == (1, *pyr2.shape2d(0), 1)
    assert out.shape == (1, *pyr2.shape2d(1), 3)


def test_csg_sg_generators(cfg, pyr3, key):
    for name in ("GeneratorCSG", "GeneratorSG"):
        G = make_generator(name, cfg, pyr3, 3)
        gvars = G.init(key, 1)
        gvars = G.init_next_stage(gvars)
        noise = jax.random.normal(key, (1, *pyr3.shape3d(0), 3))
        out, _ = G.apply(gvars, jnp.ones(2), key, noise_init=noise,
                         mode="rand", train=True)
        assert out.shape == (1, *pyr3.shape3d(1), 3), name
        out, _ = G.apply(gvars, jnp.ones(2), key, noise_init=noise,
                         mode="rec", train=True)
        assert out.shape == (1, *pyr3.shape3d(1), 3), name


def test_registry_rejects_unknown(cfg):
    with pytest.raises(ValueError):
        make_generator("NoSuchModel", cfg, None, 2)
    with pytest.raises(ValueError):
        make_discriminator("WDiscriminator3D", cfg, 2)
