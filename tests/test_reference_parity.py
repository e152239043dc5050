"""Full-model numerical parity against the ACTUAL reference implementation
(/root/reference, imported read-only) with copied weights.

The deterministic path is compared: rand-mode forward with a fixed
noise_init and amps=0 in eval mode exercises decoder + all refinement
stages + align-corners upscaling + residual tanh chain with zero sampling;
the encoder is compared separately on its deterministic (mu, logvar) heads.
"""
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


def _import_reference_networks_2d():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tvt = types.ModuleType("torchvision.transforms")
        tv.utils, tv.transforms = tvu, tvt
        sys.modules.update({"torchvision": tv, "torchvision.utils": tvu,
                            "torchvision.transforms": tvt})
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from modules import networks_2d
    return networks_2d


def _t2f_conv(w):  # torch (O,I,kh,kw) -> flax (kh,kw,I,O)
    return np.asarray(w.detach()).transpose(2, 3, 1, 0)


def _copy_convblock(tseq, prefix, state):  # ConvBlock (conv[+norm])
    import torch
    sd = tseq.state_dict()
    out = {"ConvND_0": {"conv": {
        "kernel": jnp.asarray(_t2f_conv(sd["conv.weight"])),
        "bias": jnp.asarray(np.asarray(sd["conv.bias"]))}}}
    stats = {}
    if "norm.weight" in sd:
        out["norm"] = {"scale": jnp.asarray(np.asarray(sd["norm.weight"])),
                       "bias": jnp.asarray(np.asarray(sd["norm.bias"]))}
        stats["norm"] = {
            "mean": jnp.asarray(np.asarray(sd["norm.running_mean"])),
            "var": jnp.asarray(np.asarray(sd["norm.running_var"]))}
    return out, stats


def _copy_snconv(tblock):  # ConvBlockSN -> SNConv params + spectral
    sd = tblock.state_dict()
    kernel = _t2f_conv(sd["conv.weight_orig"])
    kh, kw, ci, co = kernel.shape
    u = np.asarray(sd["conv.weight_u"])
    v_t = np.asarray(sd["conv.weight_v"])  # ordered (I, kh, kw)
    v = v_t.reshape(ci, kh, kw).transpose(1, 2, 0).flatten()  # -> (kh,kw,I)
    params = {"kernel": jnp.asarray(kernel),
              "bias": jnp.asarray(np.asarray(sd["conv.bias"]))}
    spectral = {"u": jnp.asarray(u), "v": jnp.asarray(v)}
    return params, spectral


def _copy_stage(tstage):
    """torch Sequential(head, block0..k, tail) -> our Stage variables."""
    params, stats = {}, {}
    for name, mod in tstage.named_children():
        if name == "tail":
            sd = mod.state_dict()
            params["tail"] = {"conv": {
                "kernel": jnp.asarray(_t2f_conv(sd["weight"])),
                "bias": jnp.asarray(np.asarray(sd["bias"]))}}
        else:
            p, s = _copy_convblock(mod, name, None)
            params[name] = p
            if s:
                stats[name] = s
    return {"params": params, "batch_stats": stats}


@pytest.fixture(scope="module")
def ref_setup():
    import argparse

    import torch
    networks_2d = _import_reference_networks_2d()
    torch.manual_seed(0)
    opt = argparse.Namespace(nc_im=3, nfc=8, latent_dim=8, enc_blocks=1,
                             ker_size=3, num_layer=2, padd_size=1,
                             vae_levels=2, train_all=False,
                             img_size=16, min_size=8, max_size=16,
                             scale_factor=0.75, scale_factor_init=0.75,
                             ar=1.0)
    import utils as ref_utils
    ref_utils.adjust_scales2image(opt.img_size, opt)
    netG = networks_2d.GeneratorHPVAEGAN(opt)
    netG.init_next_stage()
    netG.init_next_stage()
    netG.init_next_stage()
    netG.eval()
    return opt, netG


@pytest.fixture(scope="module")
def ours_setup(ref_setup):
    opt, netG = ref_setup
    from hpvaegan_tpu.core.config import Config
    from hpvaegan_tpu.core.pyramid import Pyramid
    from hpvaegan_tpu.models.registry import make_generator

    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=2)
    cfg.adjust_scales()
    cfg.ar = 1.0
    pyr = Pyramid.for_image(16, 1.0, 8, 16, 0.75)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 2)
    key = jax.random.PRNGKey(0)
    gvars = G.init(key, 1)
    for i in range(3):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(key, i))

    # ---- copy every weight from the torch model ----
    # encoder: FeatureExtractor SN blocks + mu/logvar conv heads
    enc_params = {"features": {}}
    enc_spectral = {"features": {}}
    for name, mod in netG.encode.features.named_children():
        p, s = _copy_snconv(mod)
        enc_params["features"][name] = p
        enc_spectral["features"][name] = s
    for head in ("mu", "logvar"):
        tmod = getattr(netG.encode, head)
        sd = tmod.state_dict()
        enc_params[head] = {"conv": {
            "kernel": jnp.asarray(_t2f_conv(sd["conv.weight"])),
            "bias": jnp.asarray(np.asarray(sd["conv.bias"]))}}
    gvars["encode"] = {"params": enc_params, "spectral": enc_spectral}

    gvars["decoder"] = _copy_stage(netG.decoder)
    gvars["body"] = [_copy_stage(stage) for stage in netG.body]
    return cfg, pyr, G, gvars


def test_encoder_parity(ref_setup, ours_setup):
    import torch
    opt, netG = ref_setup
    cfg, pyr, G, gvars = ours_setup
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *pyr.shape2d(0), 3)).astype(np.float32)

    mu, logvar = G.encoder.apply(gvars["encode"], jnp.asarray(x))
    with torch.no_grad():
        mu_t, logvar_t = netG.encode(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(mu),
                               mu_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar),
                               logvar_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)


def test_full_generator_rand_forward_parity(ref_setup, ours_setup):
    """Deterministic full-pyramid pass: rand mode, fixed noise, amps=0,
    eval BN — decoder + 3 stages + align-corners upscales + tanh chain."""
    import torch
    opt, netG = ref_setup
    cfg, pyr, G, gvars = ours_setup
    rng = np.random.default_rng(2)
    noise = rng.standard_normal((2, *pyr.shape2d(0), 8)).astype(np.float32)
    amps = [0.0, 0.0, 0.0, 0.0]

    (out, vae_out, _), _ = G.apply(gvars, jnp.asarray(amps),
                                   jax.random.PRNGKey(9),
                                   noise_init=jnp.asarray(noise),
                                   mode="rand", train=False)
    with torch.no_grad():
        out_t, vae_t = netG(torch.from_numpy(noise.transpose(0, 3, 1, 2)),
                            amps,
                            noise_init=torch.from_numpy(
                                noise.transpose(0, 3, 1, 2)),
                            mode="rand")
    np.testing.assert_allclose(np.asarray(vae_out),
                               vae_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=5e-4)


def test_wgan_gp_critic_grads_parity(ref_setup):
    """Critic-update gradients (errD_real + errD_fake + gradient penalty,
    incl. the double backprop) match the reference's calc_gradient_penalty
    with copied weights and the same interpolation alpha."""
    import argparse
    from unittest import mock

    import torch
    networks_2d = _import_reference_networks_2d()
    from modules.utils import calc_gradient_penalty as ref_gp

    opt, _ = ref_setup
    torch.manual_seed(1)
    netD = networks_2d.WDiscriminator2D(opt)
    netD.train()

    # run one torch forward to let spectral-norm settle its u/v ONCE, then
    # freeze power iterations on both sides for a deterministic comparison
    with torch.no_grad():
        _ = netD(torch.zeros(1, 3, 10, 10))

    from hpvaegan_tpu.models.registry import make_discriminator
    from hpvaegan_tpu.core.config import Config
    from hpvaegan_tpu.losses import calc_gradient_penalty, mse
    from hpvaegan_tpu.train.optim import dparams_view, merge_dparams
    from hpvaegan_tpu.train.steps import apply_disc

    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=2, ker_size=3)
    D = make_discriminator("WDiscriminator2D", cfg, 2)
    dvars = dict(D.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 10, 3))))

    # ---- copy critic weights + spectral buffers torch -> ours ----
    params, spectral = {}, {}
    for name, mod in list(netD.named_children()):
        if name == "tail":
            sd = mod.state_dict()
            params["tail"] = {"conv": {
                "kernel": jnp.asarray(_t2f_conv(sd["weight"])),
                "bias": jnp.asarray(np.asarray(sd["bias"]))}}
        elif name == "head":
            p, s = _copy_snconv(mod)
            params["head"], spectral["head"] = p, s
        else:  # body Sequential of SN blocks
            for bname, bmod in mod.named_children():
                p, s = _copy_snconv(bmod)
                params[bname], spectral[bname] = p, s
    dvars = {"params": params, "spectral": spectral}

    rng = np.random.default_rng(3)
    real = rng.standard_normal((2, 10, 10, 3)).astype(np.float32)
    fake = rng.standard_normal((2, 10, 10, 3)).astype(np.float32)
    alpha = 0.37
    lam = 0.1

    # ---- ours ----
    def d_loss(dp):
        dv = merge_dparams(dvars, dp)
        out_r, _ = apply_disc(D, dv, jnp.asarray(real), train=True)
        out_f, _ = apply_disc(D, dv, jnp.asarray(fake), train=True)
        interp = alpha * jnp.asarray(real) + (1 - alpha) * jnp.asarray(fake)
        grads_x = jax.grad(
            lambda x: jnp.sum(apply_disc(D, dv, x, train=True)[0]))(interp)
        gnorm = jnp.sqrt(jnp.sum(jnp.square(grads_x), axis=-1))
        gp = jnp.mean(jnp.square(gnorm - 1.0)) * lam
        return -jnp.mean(out_r) + jnp.mean(out_f) + gp

    ours_grads = jax.grad(d_loss)(dparams_view(dvars))

    # ---- reference (freeze power iteration: eval-mode SN uses stored u/v;
    # the reference runs D in train mode, but with identical pre-settled u/v
    # one extra iteration changes sigma on both sides identically is not
    # reproducible in jax, so compare in eval mode on the torch side while
    # our side reads the same stored u/v) ----
    netD.eval()
    real_t = torch.from_numpy(real.transpose(0, 3, 1, 2)).requires_grad_(False)
    fake_t = torch.from_numpy(fake.transpose(0, 3, 1, 2))
    errD_real = -netD(real_t).mean()
    errD_fake = netD(fake_t).mean()
    with mock.patch("torch.rand", return_value=torch.tensor([[alpha]])):
        gp_t = ref_gp(netD, real_t, fake_t, lam, "cpu")
    total = errD_real + errD_fake + gp_t
    netD.zero_grad()
    total.backward()

    # compare a representative kernel grad (head) and the tail bias grad
    head_grad_t = None
    for n, p in netD.named_parameters():
        if n == "head.conv.weight_orig":
            head_grad_t = p.grad.numpy().transpose(2, 3, 1, 0)
        if n == "tail.bias":
            tail_bias_t = p.grad.numpy()
    np.testing.assert_allclose(
        np.asarray(ours_grads["head"]["kernel"]), head_grad_t,
        rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ours_grads["tail"]["conv"]["bias"]), tail_bias_t,
        rtol=5e-3, atol=5e-4)
