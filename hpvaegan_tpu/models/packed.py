"""Width-packed execution paths for the hot conv stacks (--wpack).

Numerically-equivalent re-implementations of ``Stage`` and
``WDiscriminator`` forwards over W-pair-packed activations (ops/wpack.py):
every conv runs with both channel dims doubled so the MXU sees full
128-wide tiles at the default nfc=64 (measured ~1.3x per conv at the
256px scales, BENCHMARKS.md r2).  They consume the *exact same* flax
variable trees as the unpacked modules — wpack is a run-time execution
path, not a model or checkpoint change — and are exactness-tested against
the originals in tests/test_wpack.py (f32 forward, grads, BN stats).

Eligibility (``wpack_ok``): ker_size 3, padd_size 1 (SAME convs — the
Q->P packed-tap derivation in ops/wpack.py assumes a (1,1) W pad), even
W, and W >= WPACK_MIN_W (below ~128px the convs are latency-bound and
packing measures as a wash — benchmarks/conv_micro2.py "wpack s5").
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.wpack import (can_wpack, conv_packed, qpack, rephase, unpack_p)
from .blocks import spectral_sigma

__all__ = ["WPACK_MIN_W", "wpack_ok", "stage_apply_packed",
           "wdisc_apply_packed"]

WPACK_MIN_W = 128

# shared with ConvBlock's nn.BatchNorm (single source of truth)
from .blocks import BN_EPS as _BN_EPS, BN_MOMENTUM as _BN_MOMENTUM


def wpack_ok(cfg, shape) -> bool:
    """Packed path applies to this activation shape under this config."""
    return (getattr(cfg, "wpack", False)
            and cfg.ker_size == 3 and cfg.padd_size == 1
            and can_wpack(shape, WPACK_MIN_W))


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _bn_packed(xp: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               stats: Dict[str, jnp.ndarray], train: bool):
    """flax nn.BatchNorm over the P-rep: per-channel stats tied across the
    two packed halves (equal element counts -> plain average is exact).

    Mirrors flax's formulas (mean / E[x^2] - mean^2, running update with
    momentum 0.9) in f32, matching ConvBlock's BatchNorm(dtype=f32).
    """
    c = xp.shape[-1] // 2
    xf = xp.astype(jnp.float32)
    if train:
        axes = tuple(range(xf.ndim - 1))
        m2 = jnp.mean(xf, axes)
        s2 = jnp.mean(xf * xf, axes)
        mean = 0.5 * (m2[:c] + m2[c:])
        second = 0.5 * (s2[:c] + s2[c:])
        var = second - mean * mean
        new_stats = {
            "mean": _BN_MOMENTUM * stats["mean"] + (1 - _BN_MOMENTUM) * mean,
            "var": _BN_MOMENTUM * stats["var"] + (1 - _BN_MOMENTUM) * var,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    mean_p = jnp.concatenate([mean, mean])
    inv_p = jax.lax.rsqrt(jnp.concatenate([var, var]) + _BN_EPS)
    scale_p = jnp.concatenate([scale, scale])
    bias_p = jnp.concatenate([bias, bias])
    return (xf - mean_p) * inv_p * scale_p + bias_p, new_stats


def stage_apply_packed(svars: Dict[str, Any], x: jnp.ndarray, train: bool,
                       num_layer: int, dtype=None, blocks_remat: bool = False
                       ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """``Stage`` forward (networks.py Stage / Decoder stack: head +
    num_layer ConvBlocks + linear tail) over packed activations.

    Returns (y, new_svars) with batch_stats advanced exactly like
    ``mod.apply(..., mutable=['batch_stats'])`` in train mode.
    """
    params = svars["params"]
    stats = svars.get("batch_stats", {})
    new_stats = {k: dict(v) for k, v in stats.items()}

    def conv_block(xq, name):
        p = params[name]
        yp = conv_packed(xq, p["ConvND_0"]["conv"]["kernel"],
                         p["ConvND_0"]["conv"]["bias"], dtype=dtype)
        yp, ns = _bn_packed(yp, p["norm"]["scale"], p["norm"]["bias"],
                            stats[name]["norm"], train)
        return _lrelu(yp), ns

    if blocks_remat:
        conv_block = jax.checkpoint(conv_block, static_argnums=(1,))

    xq = qpack(x)
    yp, ns = conv_block(xq, "head")
    new_stats["head"] = {"norm": ns}
    for i in range(num_layer):
        name = f"block{i}"
        yp2, ns = conv_block(rephase(yp), name)
        new_stats[name] = {"norm": ns}
        yp = yp2
    tp = params["tail"]["conv"]
    out_p = conv_packed(rephase(yp), tp["kernel"], tp["bias"], dtype=dtype)
    y = unpack_p(out_p)

    new_svars = dict(svars)
    if "batch_stats" in svars:
        new_svars["batch_stats"] = new_stats
    return y, new_svars


def wdisc_apply_packed(dvars: Dict[str, Any], x: jnp.ndarray,
                       num_layer: int, dtype=None,
                       blocks_remat: bool = False) -> jnp.ndarray:
    """``WDiscriminator`` forward (SN head + SN blocks + linear tail,
    hardcoded tail pad 1) over packed activations."""
    params, spectral = dvars["params"], dvars["spectral"]

    def sn_block(xq, name):
        kernel = params[name]["kernel"]
        sigma = spectral_sigma(kernel, spectral[name]["u"],
                               spectral[name]["v"])
        yp = conv_packed(xq, kernel / sigma, params[name]["bias"],
                         dtype=dtype)
        return _lrelu(yp)

    if blocks_remat:
        sn_block = jax.checkpoint(sn_block, static_argnums=(1,))

    xq = qpack(x)
    yp = sn_block(xq, "head")
    for i in range(num_layer):
        yp = sn_block(rephase(yp), f"block{i}")
    tp = params["tail"]["conv"]
    out_p = conv_packed(rephase(yp), tp["kernel"], tp["bias"], dtype=dtype)
    return unpack_p(out_p)
