"""Loss parity vs independent torch/numpy oracles (reference formulas
modules/losses.py, modules/utils.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from hpvaegan_tpu.losses import (calc_gradient_penalty, kl_bern_criterion,
                                 kl_criterion, mse)


def test_kl_matches_oracle(rng):
    mu = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    logvar = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    ours = float(kl_criterion(jnp.asarray(mu), jnp.asarray(logvar)))
    mu_t, lv_t = torch.from_numpy(mu), torch.from_numpy(logvar)
    oracle = (-0.5 * (1 + lv_t - mu_t.pow(2) - lv_t.exp())).mean().item()
    assert np.isclose(ours, oracle, rtol=1e-5)


def test_kl_bern_matches_oracle(rng):
    x = rng.uniform(0.01, 0.99, (2, 4, 4, 1)).astype(np.float32)
    ours = float(kl_bern_criterion(jnp.asarray(x)))
    xt = torch.from_numpy(x)
    oracle = (xt * (torch.log(xt + 1e-20) - np.log(0.5))
              + (1 - xt) * (torch.log(1 - xt + 1e-20) - np.log(0.5))
              ).mean().item()
    assert np.isclose(ours, oracle, rtol=1e-4)


def test_kl_zero_at_standard_normal():
    mu = jnp.zeros((2, 3))
    logvar = jnp.zeros((2, 3))
    assert float(kl_criterion(mu, logvar)) == 0.0


def test_mse():
    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[0.0, 4.0]])
    assert np.isclose(float(mse(a, b)), 2.5)


def test_gradient_penalty_linear_critic(key, rng):
    """For D(x) = <w, x> summed over channels, grad wrt x is w everywhere, so
    the channel-axis norm is |w| and gp = (|w|-1)^2 * lambda exactly —
    closed-form check of the reference quirk (norm over channel dim only,
    modules/utils.py:18)."""
    w = np.asarray([0.6, -0.8, 1.2], np.float32)  # |w| ~ 1.565
    lam = 0.1

    def d_apply(x):
        return jnp.sum(x * jnp.asarray(w), axis=-1, keepdims=True)

    real = jnp.asarray(rng.standard_normal((2, 5, 5, 3)).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal((2, 5, 5, 3)).astype(np.float32))
    gp = float(calc_gradient_penalty(d_apply, real, fake, lam, key))
    expected = (np.linalg.norm(w) - 1.0) ** 2 * lam
    assert np.isclose(gp, expected, rtol=1e-5)


def test_gradient_penalty_differentiable_twice(key, rng):
    """The penalty must be differentiable wrt critic params (double
    backprop through jax.grad)."""
    real = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))

    def loss(w):
        return calc_gradient_penalty(
            lambda x: jnp.tanh(jnp.sum(x * w, axis=-1, keepdims=True)),
            real, fake, 0.1, key)

    g = jax.grad(loss)(jnp.asarray([0.5, 0.5, 0.5]))
    assert np.all(np.isfinite(np.asarray(g)))
