"""Losses & GAN math (reference: modules/losses.py, modules/utils.py).

All functions are pure and jit/grad-friendly.  The WGAN-GP double-backprop
(torch.autograd.grad with create_graph, modules/utils.py:12-16) becomes plain
``jax.grad`` composition — XLA differentiates through it natively, so the
whole D step including the penalty compiles into one fused program.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "kl_criterion",
    "kl_bern_criterion",
    "mse",
    "calc_gradient_penalty",
]


def kl_criterion(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0,1)), mean over all elements (modules/losses.py:7-9)."""
    kld = -0.5 * (1 + logvar - jnp.square(mu) - jnp.exp(logvar))
    return jnp.mean(kld)


def kl_bern_criterion(x: jnp.ndarray) -> jnp.ndarray:
    """Bernoulli KL vs p=0.5 (modules/losses.py:12-14)."""
    log_half = jnp.log(0.5)
    kld = x * (jnp.log(x + 1e-20) - log_half) + (1 - x) * (
        jnp.log(1 - x + 1e-20) - log_half)
    return jnp.mean(kld)


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.MSELoss() equivalent — mean squared error."""
    return jnp.mean(jnp.square(a - b))


def calc_gradient_penalty(d_apply: Callable[[jnp.ndarray], jnp.ndarray],
                          real: jnp.ndarray, fake: jnp.ndarray,
                          lambda_grad: float, key: jax.Array,
                          chunked: bool | str = False) -> jnp.ndarray:
    """WGAN-GP (modules/utils.py:4-19), reference quirks preserved:

    * a single scalar alpha ~ U(0,1) is shared by the entire batch
      (modules/utils.py:5-7), and
    * the gradient 2-norm is taken over the CHANNEL axis only
      (``gradients.norm(2, dim=1)``, modules/utils.py:18).  The reference's
      dim 1 is channels in NC(T)HW; our layout is channels-last so the same
      reduction is over axis -1.

    ``d_apply`` must be the critic forward closed over its (non-diff) params.

    ``chunked`` runs the double-backprop one sample at a time via
    ``lax.map``, dividing the GP's (dominant) second-order HBM footprint by
    the batch size.  Exact for per-sample critics (the SN WDiscriminator);
    must stay False for the BatchNorm baselines critic, whose train-mode
    statistics couple batch elements.  ``chunked="unroll"`` unrolls the
    per-sample loop into straight-line code instead of a ``lax.map``
    ``while`` loop — same math, different scheduling/memory trade (the
    while-loop body measured at 95 GB/s in the r2 trace; unrolling lets
    XLA overlap the per-sample programs at the cost of a higher peak).
    """
    alpha = jax.random.uniform(key, ())
    interpolates = alpha * real + (1.0 - alpha) * fake

    def penalty_map(x):
        grads = jax.grad(lambda y: jnp.sum(d_apply(y)))(x)
        grad_norm = jnp.sqrt(jnp.sum(jnp.square(grads), axis=-1) + 0.0)
        return jnp.square(grad_norm - 1.0)

    if chunked == "unroll":
        sq = jnp.stack([penalty_map(interpolates[i:i + 1])
                        for i in range(interpolates.shape[0])])
        return jnp.mean(sq) * lambda_grad
    if chunked:
        sq = jax.lax.map(lambda x: penalty_map(x[None]), interpolates)
        return jnp.mean(sq) * lambda_grad
    return jnp.mean(penalty_map(interpolates)) * lambda_grad
