"""Exactness of the width-packed execution path (--wpack) vs the
unpacked flax modules it replaces.  All f32 on CPU: the packed path must
be numerically identical up to summation order."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.models.networks import Stage, WDiscriminator
from hpvaegan_tpu.models.packed import (stage_apply_packed,
                                        wdisc_apply_packed, wpack_ok)
from hpvaegan_tpu.ops.wpack import (can_wpack, conv_packed, pack_kernel,
                                    qpack, rephase, unpack_p)


def _direct_conv(x, k, b, ndim):
    dims = ("NHWC", "HWIO", "NHWC") if ndim == 2 else ("NTHWC", "THWIO",
                                                       "NTHWC")
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, dims)
    y = jax.lax.conv_general_dilated(
        x, k, (1,) * ndim, [(1, 1)] * ndim, dimension_numbers=dn)
    return y + b


@pytest.mark.parametrize("ndim", [2, 3])
def test_conv_packed_exact(ndim):
    key = jax.random.PRNGKey(0)
    xshape = (2, 4, 6, 12, 5) if ndim == 3 else (2, 6, 12, 5)
    kshape = (3,) * ndim + (5, 7)
    x = jax.random.normal(key, xshape)
    k = jax.random.normal(jax.random.fold_in(key, 1), kshape) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (7,))
    ref = _direct_conv(x, k, b, ndim)
    got = unpack_p(conv_packed(qpack(x), k, b))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_rephase_matches_qpack():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 6, 10, 4))
    # P-rep built directly from x, rephased, must equal Q-rep of x
    p = x.reshape(2, 4, 6, 5, 8)
    np.testing.assert_array_equal(rephase(p), qpack(x))


def test_pack_kernel_structure():
    k = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 3, 4, 6))
    kq = pack_kernel(k)
    assert kq.shape == (3, 3, 2, 8, 12)
    # the two structurally-zero blocks
    np.testing.assert_array_equal(kq[:, :, 0, :4, 6:], jnp.zeros((3, 3, 4, 6)))
    np.testing.assert_array_equal(kq[:, :, 1, 4:, :6], jnp.zeros((3, 3, 4, 6)))


@pytest.mark.parametrize("train", [True, False])
def test_stage_packed_exact(train):
    key = jax.random.PRNGKey(1)
    mod = Stage(nfc=8, nc_im=3, ker_size=3, padd_size=1, num_layer=2, ndim=3)
    x = jax.random.normal(key, (2, 4, 6, 12, 3))
    svars = mod.init(jax.random.fold_in(key, 1), x, True)
    # distinct running stats so eval mode is a real check
    svars = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.ndim == 1 else a, svars)

    if train:
        ref, upd = mod.apply(svars, x, True, mutable=["batch_stats"])
        ref_vars = {**svars, **upd}
    else:
        ref = mod.apply(svars, x, False)
        ref_vars = svars
    got, got_vars = stage_apply_packed(svars, x, train, num_layer=2)

    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5),
        got_vars["batch_stats"], ref_vars["batch_stats"])


def test_stage_packed_grads_exact():
    key = jax.random.PRNGKey(2)
    mod = Stage(nfc=8, nc_im=3, ker_size=3, padd_size=1, num_layer=2, ndim=3)
    x = jax.random.normal(key, (2, 4, 6, 12, 3))
    svars = mod.init(jax.random.fold_in(key, 1), x, True)

    def loss_ref(p):
        y, _ = mod.apply({**svars, "params": p}, x, True,
                         mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    def loss_packed(p):
        y, _ = stage_apply_packed({**svars, "params": p}, x, True,
                                  num_layer=2)
        return jnp.sum(y ** 2)

    g_ref = jax.grad(loss_ref)(svars["params"])
    g_got = jax.grad(loss_packed)(svars["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=3e-4, rtol=1e-3),
        g_got, g_ref)


def test_wdisc_packed_exact_and_grads():
    key = jax.random.PRNGKey(5)
    mod = WDiscriminator(nfc=8, ker_size=3, num_layer=2, ndim=3)
    x = jax.random.normal(key, (2, 4, 6, 12, 3))
    dvars = mod.init(jax.random.fold_in(key, 1), x)

    ref = mod.apply(dvars, x)
    got = wdisc_apply_packed(dvars, x, num_layer=2)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    # input grads (the WGAN-GP double-backprop path differentiates w.r.t. x)
    g_ref = jax.grad(lambda z: jnp.sum(mod.apply(dvars, z) ** 2))(x)
    g_got = jax.grad(
        lambda z: jnp.sum(wdisc_apply_packed(dvars, z, num_layer=2) ** 2))(x)
    np.testing.assert_allclose(g_got, g_ref, atol=3e-4, rtol=1e-3)

    # param grads
    gp_ref = jax.grad(lambda p: jnp.sum(
        mod.apply({**dvars, "params": p}, x) ** 2))(dvars["params"])
    gp_got = jax.grad(lambda p: jnp.sum(
        wdisc_apply_packed({**dvars, "params": p}, x,
                           num_layer=2) ** 2))(dvars["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=3e-4, rtol=1e-3),
        gp_got, gp_ref)


def test_wpack_gates():
    assert can_wpack((2, 4, 6, 128, 3), 128)
    assert not can_wpack((2, 4, 6, 127, 3), 128)   # odd
    assert not can_wpack((2, 4, 6, 102, 3), 128)   # too small

    class C:
        wpack = True
        ker_size = 3
        padd_size = 1

    assert wpack_ok(C(), (2, 4, 6, 128, 3))
    C.ker_size = 5
    assert not wpack_ok(C(), (2, 4, 6, 128, 3))


# ---------------------------------------------------------------------------
# Step-level equivalence: the real G/D/GP computations with --wpack on/off
# (WPACK_MIN_W monkeypatched down so the tiny test pyramid qualifies).
# ---------------------------------------------------------------------------
from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.core.pyramid import Pyramid
from hpvaegan_tpu.losses import calc_gradient_penalty
from hpvaegan_tpu.models.registry import make_discriminator, make_generator
from hpvaegan_tpu.train.optim import (dparams_view, gparams_view,
                                      merge_dparams, merge_gparams)
from hpvaegan_tpu.train.steps import apply_disc
from hpvaegan_tpu.train.trainer import init_discriminator


def _setup(wpack, remat=False):
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1,
                 vae_levels=1, batch_size=2, img_size=16, min_size=8,
                 max_size=16)
    cfg.wpack = wpack
    cfg.remat = bool(remat)
    cfg.remat_blocks = (remat == "blocks")
    cfg.adjust_scales()
    cfg.ar = 1.0
    scale = 2
    cfg.scale_idx = scale
    pyr = Pyramid.for_video(16, 1.0, 8, 16, cfg.scale_factor_init,
                            (4, 3, 2, 1), 24.0)
    assert pyr.shape3d(scale)[-1] % 2 == 0  # W must qualify for packing
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
    return cfg, G, gvars, D, dvars, real, real_zero, amps, key


def _g_step_grads(wpack, monkeypatch, remat=False):
    if wpack:
        import hpvaegan_tpu.models.packed as packed
        monkeypatch.setattr(packed, "WPACK_MIN_W", 8)
    cfg, G, gvars, D, dvars, real, real_zero, amps, key = _setup(wpack, remat)

    def loss(pview):
        gv = merge_gparams(gvars, pview)
        (out, vae_out, (mu, logvar)), _ = G.apply(
            gv, amps, jax.random.fold_in(key, 9), real_zero=real_zero,
            mode="rec", train=True)
        return (jnp.mean((out - real) ** 2)
                + jnp.mean(vae_out ** 2) + jnp.mean(mu ** 2))

    val, grads = jax.jit(jax.value_and_grad(loss))(gparams_view(gvars))
    return float(val), jax.tree_util.tree_leaves(grads)


def _d_step_grads(wpack, monkeypatch, remat=False):
    if wpack:
        import hpvaegan_tpu.models.packed as packed
        monkeypatch.setattr(packed, "WPACK_MIN_W", 8)
    cfg, G, gvars, D, dvars, real, real_zero, amps, key = _setup(wpack, remat)
    fake = jax.random.normal(jax.random.fold_in(key, 8), real.shape)
    rm = "blocks" if cfg.remat_blocks else cfg.remat

    def loss(dview):
        dv = merge_dparams(dvars, dview)
        out, _ = apply_disc(D, dv, real, train=True, remat=rm, cfg=cfg)
        gp = calc_gradient_penalty(
            lambda x: apply_disc(D, dv, x, train=True, remat=rm, cfg=cfg)[0],
            real, fake, 0.1, jax.random.fold_in(key, 10))
        return -jnp.mean(out) + gp

    val, grads = jax.jit(jax.value_and_grad(loss))(dparams_view(dvars))
    return float(val), jax.tree_util.tree_leaves(grads)


@pytest.mark.parametrize("remat", [False, "blocks"])
def test_wpack_generator_grads_match(monkeypatch, remat):
    v0, g0 = _g_step_grads(False, monkeypatch)
    v1, g1 = _g_step_grads(True, monkeypatch, remat)
    np.testing.assert_allclose(v0, v1, rtol=1e-5)
    assert len(g0) == len(g1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-3)


def test_wpack_critic_gp_grads_match(monkeypatch):
    v0, g0 = _d_step_grads(False, monkeypatch)
    v1, g1 = _d_step_grads(True, monkeypatch)
    np.testing.assert_allclose(v0, v1, rtol=1e-5)
    assert len(g0) == len(g1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-3)
