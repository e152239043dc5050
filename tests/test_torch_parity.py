"""Numerical parity vs torch with COPIED weights — validates that our
conv/BatchNorm/LeakyReLU/spectral-norm semantics match the reference's
building blocks exactly (not just shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from hpvaegan_tpu.models.blocks import ConvBlock, SNConv, spectral_update


def _copy_conv3d_weights(tconv, params):
    """flax kernel (kT,kH,kW,I,O) <- torch weight (O,I,kT,kH,kW)."""
    w = params["ConvND_0"]["conv"]["kernel"]
    tw = np.asarray(w).transpose(4, 3, 0, 1, 2)
    tconv.weight.data = torch.from_numpy(tw.copy())
    tconv.bias.data = torch.from_numpy(np.asarray(params["ConvND_0"]["conv"]["bias"]))


def _copy_conv2d_weights(tconv, params):
    w = params["ConvND_0"]["conv"]["kernel"]  # (kh,kw,I,O)
    tw = np.asarray(w).transpose(3, 2, 0, 1)
    tconv.weight.data = torch.from_numpy(tw.copy())
    tconv.bias.data = torch.from_numpy(np.asarray(params["ConvND_0"]["conv"]["bias"]))


def test_convblock3d_train_mode_parity(rng, key):
    """Conv3d + BatchNorm3d(train) + LeakyReLU(0.2) == ConvBlock(ndim=3)."""
    x = rng.standard_normal((2, 4, 6, 6, 3)).astype(np.float32)
    block = ConvBlock(features=8, ker_size=3, padding=1, ndim=3)
    variables = block.init(key, jnp.asarray(x), True)

    tblock = nn.Sequential(nn.Conv3d(3, 8, 3, 1, 1), nn.BatchNorm3d(8),
                           nn.LeakyReLU(0.2))
    _copy_conv3d_weights(tblock[0], variables["params"])
    tblock[1].weight.data = torch.from_numpy(
        np.asarray(variables["params"]["norm"]["scale"]))
    tblock[1].bias.data = torch.from_numpy(
        np.asarray(variables["params"]["norm"]["bias"]))
    tblock.train()

    ours, _ = block.apply(variables, jnp.asarray(x), True,
                          mutable=["batch_stats"])
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NTHWC -> NCTHW
    with torch.no_grad():
        theirs = tblock(xt).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3,
                               atol=2e-4)


def test_convblock2d_eval_mode_parity(rng, key):
    """Eval mode uses running stats — seed them identically."""
    x = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    block = ConvBlock(features=8, ker_size=3, padding=1, ndim=2)
    variables = block.init(key, jnp.asarray(x), True)
    mean = rng.standard_normal(8).astype(np.float32) * 0.1
    var = (rng.uniform(0.5, 1.5, 8)).astype(np.float32)
    variables = dict(variables)
    variables["batch_stats"] = {"norm": {"mean": jnp.asarray(mean),
                                         "var": jnp.asarray(var)}}

    tblock = nn.Sequential(nn.Conv2d(3, 8, 3, 1, 1), nn.BatchNorm2d(8),
                           nn.LeakyReLU(0.2))
    _copy_conv2d_weights(tblock[0], variables["params"])
    tblock[1].weight.data = torch.from_numpy(
        np.asarray(variables["params"]["norm"]["scale"]))
    tblock[1].bias.data = torch.from_numpy(
        np.asarray(variables["params"]["norm"]["bias"]))
    tblock[1].running_mean.data = torch.from_numpy(mean)
    tblock[1].running_var.data = torch.from_numpy(var)
    tblock.eval()

    ours = block.apply(variables, jnp.asarray(x), False)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        theirs = tblock(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3,
                               atol=2e-4)


def test_spectral_norm_sigma_parity(rng, key):
    """Same u + one power iteration: our sigma must equal torch's
    spectral_norm sigma (the normalized weight scale)."""
    x = rng.standard_normal((1, 6, 6, 3)).astype(np.float32)
    conv = SNConv(features=8, ker_size=3, padding=1, ndim=2, act=None)
    variables = conv.init(key, jnp.asarray(x))
    kernel = np.asarray(variables["params"]["kernel"])  # (3,3,3,8)

    tconv = nn.Conv2d(3, 8, 3, 1, 1, bias=False)
    tconv.weight.data = torch.from_numpy(kernel.transpose(3, 2, 0, 1).copy())
    tconv_sn = nn.utils.spectral_norm(tconv)
    u0 = np.asarray(variables["spectral"]["u"])
    tconv_sn.weight_u.data = torch.from_numpy(u0.copy())

    # one power iteration on both sides
    new_spec = spectral_update(variables["params"], variables["spectral"])
    w_mat = kernel.reshape(-1, 8).T
    sigma_ours = float(np.asarray(new_spec["u"]) @ w_mat
                       @ np.asarray(new_spec["v"]))

    tconv_sn.train()
    with torch.no_grad():
        _ = tconv_sn(torch.zeros(1, 3, 6, 6))  # triggers power iteration
        w_t = tconv_sn.weight_orig.reshape(8, -1)
        sigma_torch = float(
            tconv_sn.weight_u @ w_t @ tconv_sn.weight_v)
    assert np.isclose(sigma_ours, sigma_torch, rtol=1e-4), \
        (sigma_ours, sigma_torch)


def test_snconv_output_parity(rng, key):
    """Full SNConv forward (post power-iteration) vs torch spectral_norm."""
    x = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    conv = SNConv(features=8, ker_size=3, padding=1, ndim=2, act="lrelu")
    variables = conv.init(key, jnp.asarray(x))
    kernel = np.asarray(variables["params"]["kernel"])
    bias = np.asarray(variables["params"]["bias"])

    tconv = nn.Conv2d(3, 8, 3, 1, 1)
    tconv.weight.data = torch.from_numpy(kernel.transpose(3, 2, 0, 1).copy())
    tconv.bias.data = torch.from_numpy(bias.copy())
    tconv_sn = nn.utils.spectral_norm(tconv)
    tconv_sn.weight_u.data = torch.from_numpy(
        np.asarray(variables["spectral"]["u"]).copy())

    # advance both by one power iteration, then compare outputs
    variables = {**variables,
                 "spectral": spectral_update(variables["params"],
                                             variables["spectral"])}
    ours = conv.apply(variables, jnp.asarray(x))

    tmod = nn.Sequential(tconv_sn, nn.LeakyReLU(0.2))
    tmod.train()
    with torch.no_grad():
        theirs = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))
                      ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3,
                               atol=2e-4)
