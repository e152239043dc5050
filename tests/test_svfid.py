"""SVFID / C3D tests: topology, torch weight-copy parity, checkpoint-loader
round-trip, Frechet-distance closed forms, and metric ordering."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from hpvaegan_tpu.eval.c3d import (C3D, load_c3d_torch, preprocess,
                                   random_c3d_params)
from hpvaegan_tpu.eval._svfid import (c3d_feature_stats, frechet_distance,
                                      svfid)


class TorchC3DTrunk(tnn.Module):
    """Reference torch C3D conv stack up to conv3b (Tran et al. topology,
    the common ``c3d-pretrained.pth`` port naming)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv3d(3, 64, 3, 1, 1)
        self.pool1 = tnn.MaxPool3d((1, 2, 2), (1, 2, 2))
        self.conv2 = tnn.Conv3d(64, 128, 3, 1, 1)
        self.pool2 = tnn.MaxPool3d((2, 2, 2), (2, 2, 2))
        self.conv3a = tnn.Conv3d(128, 256, 3, 1, 1)
        self.conv3b = tnn.Conv3d(256, 256, 3, 1, 1)

    def forward(self, x):  # NCTHW -> conv3b features
        x = torch.relu(self.conv1(x))
        x = self.pool2(torch.relu(self.conv2(self.pool1(x))))
        x = torch.relu(self.conv3a(x))
        return torch.relu(self.conv3b(x))


def _copy_flax_to_torch(params, tmodel):
    for name in ("conv1", "conv2", "conv3a", "conv3b"):
        k = np.asarray(params["params"][name]["kernel"])  # (kT,kH,kW,I,O)
        b = np.asarray(params["params"][name]["bias"])
        conv = getattr(tmodel, name)
        conv.weight.data = torch.from_numpy(k.transpose(4, 3, 0, 1, 2).copy())
        conv.bias.data = torch.from_numpy(b.copy())


def test_c3d_feature_shapes(key):
    x = jnp.zeros((1, 4, 32, 32, 3))
    model = C3D(feature_layer="conv3b")
    params = model.init(key, x)
    feats = model.apply(params, x)
    # pool1: T4 H16 W16; pool2: T2 H8 W8; convs keep shape
    assert feats.shape == (1, 2, 8, 8, 256)
    # early tap builds only the needed layers
    p1 = C3D(feature_layer="conv1").init(key, x)
    assert set(p1["params"].keys()) == {"conv1"}


def test_c3d_torch_parity(rng, key):
    """Copied weights: flax C3D trunk == torch C3D trunk (conv3b tap)."""
    x = rng.standard_normal((2, 4, 16, 16, 3)).astype(np.float32)
    model = C3D(feature_layer="conv3b")
    params = model.init(key, jnp.asarray(x))
    ours = np.asarray(model.apply(params, jnp.asarray(x)))

    tmodel = TorchC3DTrunk()
    _copy_flax_to_torch(params, tmodel)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    theirs = theirs.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_load_c3d_torch_roundtrip(rng, tmp_path):
    """A real torch state dict (with module. prefix) loads and reproduces
    the torch forward exactly."""
    tmodel = TorchC3DTrunk()
    ckpt = tmp_path / "c3d.pth"
    torch.save({"module." + k: v for k, v in tmodel.state_dict().items()},
               ckpt)

    params = load_c3d_torch(str(ckpt), "conv3b")
    assert set(params["params"].keys()) == {"conv1", "conv2", "conv3a",
                                            "conv3b"}
    x = rng.standard_normal((1, 4, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(C3D(feature_layer="conv3b").apply(params,
                                                        jnp.asarray(x)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 3, 4, 1), rtol=2e-3, atol=2e-4)


def test_load_c3d_full_module_pickle(rng, tmp_path):
    """The classic c3d.pickle mirrors are full-module pickles, not state
    dicts — loader must unwrap them (needs weights_only=False on
    torch>=2.6)."""
    tmodel = TorchC3DTrunk()
    ckpt = tmp_path / "c3d_module.pth"
    torch.save(tmodel, ckpt)
    params = load_c3d_torch(str(ckpt), "conv1")
    np.testing.assert_allclose(
        np.asarray(params["params"]["conv1"]["bias"]),
        tmodel.conv1.bias.detach().numpy())


def test_load_c3d_missing_key(tmp_path):
    torch.save({"conv1.weight": torch.zeros(64, 3, 3, 3, 3)},
               tmp_path / "bad.pth")
    with pytest.raises(KeyError):
        load_c3d_torch(str(tmp_path / "bad.pth"), "conv1")


def test_preprocess_range_and_bgr():
    x = np.zeros((1, 2, 4, 4, 3), np.float32)
    x[..., 0] = 1.0   # R channel at max
    x[..., 2] = -1.0  # B channel at min
    out = np.asarray(preprocess(jnp.asarray(x)))
    # BGR order: channel 0 is B (=0 - 90), channel 2 is R (=255 - 102)
    np.testing.assert_allclose(out[..., 0], 0.0 - 90.0)
    np.testing.assert_allclose(out[..., 2], 255.0 - 102.0)


def test_frechet_identity_is_zero(rng):
    mu = rng.standard_normal(8)
    a = rng.standard_normal((64, 8))
    cov = np.cov(a, rowvar=False)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-8


def test_frechet_closed_form_diagonal():
    """Diagonal gaussians: sum((m1-m2)^2) + sum(s1+s2-2 sqrt(s1 s2))."""
    mu1, mu2 = np.array([0.0, 1.0]), np.array([1.0, 1.0])
    s1, s2 = np.array([1.0, 4.0]), np.array([2.0, 1.0])
    expected = 1.0 + float(np.sum(s1 + s2 - 2 * np.sqrt(s1 * s2)))
    got = frechet_distance(mu1, np.diag(s1), mu2, np.diag(s2))
    assert abs(got - expected) < 1e-8


def test_svfid_ordering(rng):
    """identical -> ~0; small perturbation < pure-noise fake."""
    real = np.tanh(rng.standard_normal((6, 16, 16, 3))).astype(np.float32)
    near = np.clip(real + 0.05 * rng.standard_normal(real.shape), -1,
                   1).astype(np.float32)
    far = np.tanh(rng.standard_normal(real.shape)).astype(np.float32)
    out = svfid(real, [real, near, far], feature_layer="conv2", seed=0)
    same, close, noise = out["per_sample"]
    assert not out["pretrained"]
    assert same < 1e-6
    assert close < noise
    assert out["mean"] == pytest.approx(np.mean([same, close, noise]))


def test_svfid_too_small_raises():
    params = random_c3d_params("conv3b")
    with pytest.raises(ValueError, match="too small"):
        c3d_feature_stats(params, np.zeros((1, 8, 8, 3), np.float32),
                          "conv3b")
