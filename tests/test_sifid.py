"""SIFID / Inception-stem tests: topology, torch BN-folding parity,
checkpoint-loader round-trip, metric ordering, and the min-shape guard.
The 2D counterpart of tests/test_svfid.py."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from hpvaegan_tpu.eval._sifid import (InceptionStem, _tap_min_hw,
                                      image_feature_stats,
                                      load_inception_torch, preprocess,
                                      random_stem_params, sifid)


class BasicConv2d(tnn.Module):
    """torchvision.models.inception.BasicConv2d: conv (no bias) + BN(1e-3)
    + relu — the unit the loader must fold."""

    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TorchInceptionStem(tnn.Module):
    """torchvision inception_v3 up to the first maxpool (pytorch-fid's
    64-dim FID block — the canonical SIFID tap)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        return torch.nn.functional.max_pool2d(x, 3, 2)


def _randomized_torch_stem(rng):
    """A stem whose BN running stats are non-trivial, so folding is
    actually exercised (fresh BN has mean 0 / var 1 = identity)."""
    t = TorchInceptionStem()
    for m in t.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.data = torch.from_numpy(
                rng.standard_normal(n).astype(np.float32))
            m.running_var.data = torch.from_numpy(
                (0.5 + rng.random(n)).astype(np.float32))
            m.weight.data = torch.from_numpy(
                (0.5 + rng.random(n)).astype(np.float32))
            m.bias.data = torch.from_numpy(
                rng.standard_normal(n).astype(np.float32))
    t.eval()
    return t


def test_stem_feature_shapes(key):
    x = jnp.zeros((1, 32, 32, 3))
    model = InceptionStem(tap="pool1")
    params = model.init(key, x)
    feats = model.apply(params, x)
    # 32 -> c1a(s2) 15 -> c2a 13 -> c2b 13 -> pool(3, s2) 6
    assert feats.shape == (1, 6, 6, 64)
    # early tap builds only the needed layers
    p1 = InceptionStem(tap="Conv2d_1a_3x3").init(key, x)
    assert set(p1["params"].keys()) == {"Conv2d_1a_3x3"}


def test_tap_min_hw_is_tight():
    """The guard admits exactly the smallest workable input."""
    for tap in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "pool1"):
        m = _tap_min_hw(tap)
        model = InceptionStem(tap=tap)
        params = model.init(__import__("jax").random.PRNGKey(0),
                            jnp.zeros((1, m, m, 3)))
        ok = model.apply(params, jnp.zeros((1, m, m, 3)))
        assert all(s >= 1 for s in ok.shape)
        with pytest.raises(ValueError, match="too small"):
            image_feature_stats(params,
                                np.zeros((m - 1, m - 1, 3), np.float32), tap)


def test_load_inception_bn_folding_parity(rng, tmp_path):
    """A torchvision-style state dict loads with BN folded and reproduces
    the torch eval-mode forward."""
    tmodel = _randomized_torch_stem(rng)
    ckpt = tmp_path / "inception.pth"
    torch.save(tmodel.state_dict(), ckpt)

    params = load_inception_torch(str(ckpt), "pool1")
    assert set(params["params"].keys()) == {
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"}
    x = rng.standard_normal((2, 33, 45, 3)).astype(np.float32)
    ours = np.asarray(InceptionStem(tap="pool1").apply(params,
                                                       jnp.asarray(x)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 3, 1), rtol=2e-3, atol=2e-4)


def test_load_inception_missing_key(tmp_path):
    torch.save({"Conv2d_1a_3x3.conv.weight": torch.zeros(32, 3, 3, 3)},
               tmp_path / "bad.pth")
    with pytest.raises(KeyError):
        load_inception_torch(str(tmp_path / "bad.pth"), "Conv2d_1a_3x3")


def test_load_inception_wrong_shape(tmp_path):
    state = {"Conv2d_1a_3x3.conv.weight": torch.zeros(32, 3, 5, 5),
             "Conv2d_1a_3x3.bn.weight": torch.ones(32),
             "Conv2d_1a_3x3.bn.bias": torch.zeros(32),
             "Conv2d_1a_3x3.bn.running_mean": torch.zeros(32),
             "Conv2d_1a_3x3.bn.running_var": torch.ones(32)}
    torch.save(state, tmp_path / "bad.pth")
    with pytest.raises(ValueError, match="expected"):
        load_inception_torch(str(tmp_path / "bad.pth"), "Conv2d_1a_3x3")


def test_preprocess_is_identity():
    """[-1,1] inputs map straight through (pytorch-fid's 2x-1 of [0,1])."""
    x = jnp.asarray(np.linspace(-1, 1, 12, dtype=np.float32).reshape(
        1, 2, 2, 3))
    np.testing.assert_array_equal(np.asarray(preprocess(x)), np.asarray(x))


def test_sifid_ordering(rng):
    """identical -> ~0; small perturbation < pure-noise fake; same return
    contract as svfid."""
    real = np.tanh(rng.standard_normal((24, 24, 3))).astype(np.float32)
    near = np.clip(real + 0.05 * rng.standard_normal(real.shape), -1,
                   1).astype(np.float32)
    far = np.tanh(rng.standard_normal(real.shape)).astype(np.float32)
    out = sifid(real, [real, near, far], tap="pool1", seed=0)
    same, close, noise = out["per_sample"]
    assert not out["pretrained"]
    assert same < 1e-6
    assert close < noise
    assert out["mean"] == pytest.approx(np.mean([same, close, noise]))


def test_sifid_deterministic(rng):
    real = np.tanh(rng.standard_normal((20, 20, 3))).astype(np.float32)
    fake = np.tanh(rng.standard_normal((20, 20, 3))).astype(np.float32)
    a = sifid(real, [fake], seed=3)["mean"]
    b = sifid(real, [fake], seed=3)["mean"]
    assert a == b


def test_random_stem_params_deterministic():
    p1 = random_stem_params("pool1", seed=1)
    p2 = random_stem_params("pool1", seed=1)
    np.testing.assert_array_equal(
        np.asarray(p1["params"]["Conv2d_1a_3x3"]["kernel"]),
        np.asarray(p2["params"]["Conv2d_1a_3x3"]["kernel"]))
