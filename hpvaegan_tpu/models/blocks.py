"""Building blocks for the model zoo — flax.linen, channels-last layouts.

Design notes (TPU-first, not a torch translation):

* Layout is NHWC (2D) / NTHWC (3D): channels ride the TPU lane dimension, so
  XLA tiles convs onto the MXU without transposes.  The reference's NCHW /
  NCTHW tensors exist only at the numpy data boundary.
* Spectral norm (reference: nn.utils.spectral_norm, networks_3d.py:59-70)
  keeps its power-iteration vectors in a separate ``spectral`` variable
  collection.  The u/v update depends only on the weight, so it runs as an
  explicit ``spectral_update`` pass once per optimization step *outside* the
  differentiated loss — sigma inside the forward is computed from
  stop-gradient'd u/v but stays differentiable w.r.t. the kernel, exactly
  like torch's buffer semantics.
* Initializers reproduce torch defaults (kaiming_uniform(a=sqrt(5)) for conv
  kernels, matching-bound uniform bias) because the reference relies on them
  for GeneratorHPVAEGAN / WDiscriminator (no weights_init call,
  networks_3d.py:325-406); the baselines' N(0, 0.02) init
  (networks_3d.py:9-15) is available as ``init_mode='n002'``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "torch_kernel_init",
    "torch_bias_init",
    "n002_kernel_init",
    "activation",
    "ConvND",
    "ConvBlock",
    "SNConv",
    "spectral_update",
    "spectral_sigma",
]

_SN_EPS = 1e-12  # torch spectral_norm default


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax kernel shape is (*kernel_spatial, in_features, out_features);
    fan_in = prod(kernel_spatial) * in_features.
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def n002_kernel_init(key, shape, dtype=jnp.float32):
    """weights_init: N(0, 0.02) (networks_3d.py:9-15)."""
    return jax.random.normal(key, shape, dtype) * 0.02


def n102_scale_init(key, shape, dtype=jnp.float32):
    """weights_init for norm layers: N(1, 0.02)."""
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


# ---------------------------------------------------------------------------
# Activations (networks_3d.py:18-26)
# ---------------------------------------------------------------------------

def activation(x: jnp.ndarray, act: Optional[str]) -> jnp.ndarray:
    if act is None:
        return x
    if act == "relu":
        return nn.relu(x)
    if act == "lrelu":
        return nn.leaky_relu(x, negative_slope=0.2)
    if act == "elu":
        return nn.elu(x, alpha=1.0)
    if act == "selu":
        return nn.selu(x)
    raise ValueError(f"unknown activation: {act}")  # prelu handled in-module


class _PReLU(nn.Module):
    """PReLU with a single learned slope, init 0.25 (torch parity)."""

    @nn.compact
    def __call__(self, x):
        slope = self.param("negative_slope",
                           lambda k, s: jnp.full(s, 0.25, jnp.float32), ())
        return jnp.where(x >= 0, x, slope.astype(x.dtype) * x)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

class _PConv64(nn.Module):
    """Packed-Pallas-kernel conv with nn.Conv's exact variable layout
    (kernel/bias names, shapes, inits) so checkpoints stay interchangeable
    with the lax path.  Only instantiated for qualifying shapes — see
    ConvND.__call__ and ops/pallas/conv3d_pack.pconv_ok."""

    kernel_init: Any
    bias_init: Any
    dtype: Any = None
    mesh: Any = None  # device mesh: route through the shard_map+halo
    #                   composition (ops/pallas/conv3d_spmd.py) under --spmd

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas.conv3d_pack import conv3d64
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, 3, x.shape[-1], 64))
        bias = self.param("bias", self.bias_init, (64,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.mesh is not None:
            from ..ops.pallas.conv3d_spmd import conv3d64_spmd
            return conv3d64_spmd(x, kernel, bias, self.mesh)
        return conv3d64(x, kernel, bias)


class ConvND(nn.Module):
    """Plain N-D conv with symmetric integer padding and optional reflect
    padding (reference padding_mode='reflect', networks_3d.py:66-68)."""

    features: int
    ker_size: int
    padding: int
    ndim: int = 2            # spatial dims: 2 or 3
    stride: int = 1
    pad_mode: str = "zeros"  # or 'reflect'
    init_mode: str = "torch"  # or 'n002'
    dtype: Any = None        # compute dtype (None = f32)
    pconv: bool = False      # route qualifying 3D convs to the packed
    #                          Pallas kernel (ops/pallas/conv3d_pack.py)
    mesh: Any = None         # device mesh under --spmd: the kernel runs
    #                          per-shard via shard_map + H halo exchange
    #                          (ops/pallas/conv3d_spmd.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel_spatial = (self.ker_size,) * self.ndim
        fan_in = int(np.prod(kernel_spatial)) * x.shape[-1]
        kernel_init = torch_kernel_init if self.init_mode == "torch" else n002_kernel_init
        # the reference's weights_init overwrites conv WEIGHTS only
        # (networks_3d.py:9-15); biases keep torch's default uniform init
        bias_init = torch_bias_init(fan_in)

        if (self.pconv and self.ndim == 3 and self.ker_size == 3
                and self.stride == 1 and self.padding == 1
                and self.pad_mode == "zeros" and self.features == 64):
            from ..ops.pallas.conv3d_pack import pconv_ok, pconv_wins
            from ..ops.pallas.conv3d_spmd import pconv_spmd_ok
            w_shape = (3, 3, 3, x.shape[-1], self.features)
            # under --spmd (mesh plumbed in by the step builder) the kernel
            # must run per-shard via the shard_map+halo composition —
            # falling through to lax (which XLA partitions itself) when the
            # geometry doesn't shard evenly.  The plain kernel would force
            # an all-gather of the sharded activations.
            if ((self.mesh is None
                 and pconv_ok(x.shape, w_shape, dtype=self.dtype))
                or (self.mesh is not None
                    and pconv_spmd_ok(x.shape, w_shape, self.mesh,
                                      dtype=self.dtype))) \
                    and pconv_wins(x.shape):
                # identical variable tree to nn.Conv (name "conv",
                # kernel/bias of the same shapes and inits) — checkpoints
                # are interchangeable with the lax path
                return _PConv64(kernel_init=kernel_init,
                                bias_init=bias_init, dtype=self.dtype,
                                mesh=self.mesh, name="conv")(x)

        if self.pad_mode == "reflect" and self.padding > 0:
            pad_width = ([(0, 0)] + [(self.padding, self.padding)] * self.ndim
                         + [(0, 0)])
            x = jnp.pad(x, pad_width, mode="reflect")
            padding = "VALID"
        else:
            padding = [(self.padding, self.padding)] * self.ndim

        return nn.Conv(
            features=self.features,
            kernel_size=kernel_spatial,
            strides=(self.stride,) * self.ndim,
            padding=padding,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)


# torch BatchNorm defaults (momentum 0.1 torch == 0.9 flax, eps 1e-5) —
# the single source of truth: the width-packed execution path
# (models/packed.py) re-implements the norm and MUST use the same values.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class ConvBlock(nn.Module):
    """Conv -> BatchNorm (optional) -> activation (optional).

    Mirrors ConvBlock2D/3D (networks_3d.py:48-56): BatchNorm with torch
    defaults (BN_MOMENTUM/BN_EPS above).
    """

    features: int
    ker_size: int
    padding: int
    ndim: int = 2
    stride: int = 1
    use_norm: bool = True
    act: Optional[str] = "lrelu"
    init_mode: str = "torch"
    dtype: Any = None
    pconv: bool = False
    mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = ConvND(self.features, self.ker_size, self.padding, self.ndim,
                   self.stride, init_mode=self.init_mode, dtype=self.dtype,
                   pconv=self.pconv, mesh=self.mesh)(x)
        if self.use_norm:
            scale_init = (nn.initializers.ones if self.init_mode == "torch"
                          else n102_scale_init)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             scale_init=scale_init,
                             dtype=jnp.float32, name="norm")(x)
        if self.act == "prelu":
            x = _PReLU(name="prelu")(x)
        else:
            x = activation(x, self.act)
        return x


# ---------------------------------------------------------------------------
# Spectral norm
# ---------------------------------------------------------------------------

def _l2normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v) + _SN_EPS)


def spectral_sigma(kernel: jnp.ndarray, u: jnp.ndarray,
                   v: jnp.ndarray) -> jnp.ndarray:
    """sigma = u^T W v with u, v treated as constants (torch buffer
    semantics) but differentiable w.r.t. the kernel."""
    w = kernel.reshape(-1, kernel.shape[-1]).T  # (out, rest)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    return u @ (w @ v)


class SNConv(nn.Module):
    """Spectrally-normalized conv + optional activation.

    Mirrors ConvBlock2DSN/3DSN with bn=True (networks_3d.py:59-70): the
    "bn" flag in the reference selects spectral norm, NOT batch norm — these
    blocks have no normalization layer.  Power iteration state (u, v) lives
    in the ``spectral`` collection and is advanced by ``spectral_update``
    once per optimization step (see module docstring).
    """

    features: int
    ker_size: int
    padding: int
    ndim: int = 2
    stride: int = 1
    act: Optional[str] = "lrelu"
    dtype: Any = None
    pconv: bool = False
    mesh: Any = None         # see ConvND.mesh
    defer: bool = False      # return (normalized kernel, bias) instead of
    #                          applying the conv — the fused conv-pair path
    #                          (models/networks.py WDiscriminator + ops/
    #                          pallas/conv3d_fuse.py) consumes the weights
    #                          while keeping THIS module's variable tree
    #                          (checkpoints stay interchangeable)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kernel_spatial = (self.ker_size,) * self.ndim
        in_features = x.shape[-1]
        kshape = (*kernel_spatial, in_features, self.features)
        fan_in = int(np.prod(kernel_spatial)) * in_features

        kernel = self.param("kernel", torch_kernel_init, kshape)
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))

        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(jax.random.normal(self.make_rng("params"),
                                                   (self.features,))))
        # v is derived from the kernel at init (v = normalize(W^T u), the
        # first half of a power-iteration step) — an independent random v
        # would give sigma = u^T W v ~ 0 and explode the normalized weights
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2normalize(
                kernel.reshape(-1, kernel.shape[-1]) @ u_var.value))

        sigma = spectral_sigma(kernel, u_var.value, v_var.value)
        kernel_n = kernel / sigma

        if self.defer:
            return kernel_n, bias

        if (self.pconv and self.ndim == 3 and self.ker_size == 3
                and self.stride == 1 and self.padding == 1
                and self.features == 64):
            from ..ops.pallas.conv3d_pack import (conv3d64, pconv_ok,
                                                  pconv_wins)
            from ..ops.pallas.conv3d_spmd import (conv3d64_spmd,
                                                  pconv_spmd_ok)
            if ((self.mesh is None
                 and pconv_ok(x.shape, kernel_n.shape, dtype=self.dtype))
                or (self.mesh is not None
                    and pconv_spmd_ok(x.shape, kernel_n.shape, self.mesh,
                                      dtype=self.dtype))) \
                    and pconv_wins(x.shape):
                xq = x if self.dtype is None else x.astype(self.dtype)
                if self.mesh is not None:
                    y = conv3d64_spmd(xq, kernel_n, bias, self.mesh)
                else:
                    y = conv3d64(xq, kernel_n, bias)
                if self.act == "prelu":
                    return _PReLU(name="prelu")(y)
                return activation(y, self.act)

        dims = ("NHWC", "HWIO", "NHWC") if self.ndim == 2 else \
               ("NTHWC", "THWIO", "NTHWC")
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel_n.shape, dims)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel_n = kernel_n.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel_n,
            window_strides=(self.stride,) * self.ndim,
            padding=[(self.padding, self.padding)] * self.ndim,
            dimension_numbers=dn)
        y = y + bias.astype(y.dtype)
        if self.act == "prelu":
            y = _PReLU(name="prelu")(y)
        else:
            y = activation(y, self.act)
        return y


def _is_uv_leaf(node: Any) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"u", "v"}


def spectral_update(params: dict, spectral: dict, n_iter: int = 1) -> dict:
    """One (or more) power-iteration step(s) for every SNConv in the tree.

    Walks the ``spectral`` collection alongside ``params``; module paths
    match by construction.  Exactly replicates torch's pre-forward hook
    order: v <- normalize(W^T u); u <- normalize(W v)  (per iteration).
    Pure function: returns the new spectral tree.
    """
    def iterate(kernel, u, v):
        w = kernel.reshape(-1, kernel.shape[-1]).T  # (out, rest)
        for _ in range(n_iter):
            v = _l2normalize(w.T @ u)
            u = _l2normalize(w @ v)
        return {"u": u, "v": v}

    if _is_uv_leaf(spectral):  # a bare SNConv's own collection
        return iterate(params["kernel"], spectral["u"], spectral["v"])

    def walk(p: dict, s: dict) -> dict:
        out = {}
        for key, sval in s.items():
            if _is_uv_leaf(sval):
                out[key] = iterate(p[key]["kernel"], sval["u"], sval["v"])
            elif isinstance(sval, dict):
                out[key] = walk(p.get(key, {}), sval)
            else:
                out[key] = sval
        return out

    return walk(params, spectral)
