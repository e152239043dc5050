"""Model zoo network modules — dimension-agnostic (2D / 3D via ``ndim``).

The reference keeps near-mirror copies in modules/networks_2d.py and
modules/networks_3d.py; here one implementation serves both: ``ndim=2``
operates on NHWC, ``ndim=3`` on NTHWC.  Structural parity references:

* FeatureExtractor            networks_3d.py:73-85  / networks_2d.py:78-90
* Encode{2,3}DVAE             networks_3d.py:88-107 / networks_2d.py:93-112
* Encode{2,3}DVAE_nb          networks_3d.py:110-138
* Encode3DVAE1x1              networks_3d.py:141-160
* WDiscriminator{2,3}D        networks_3d.py:163-181
* WDiscriminatorBaselines     networks_3d.py:184-210
* decoder / body stage conv stacks inside GeneratorHPVAEGAN
                              networks_3d.py:334-363
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import ConvBlock, ConvND, SNConv

__all__ = [
    "FeatureExtractor",
    "EncodeVAE",
    "EncodeVAE_nb",
    "EncodeVAE1x1",
    "Decoder",
    "Stage",
    "WDiscriminator",
    "WDiscriminatorBaselines",
    "CSGStage",
    "SGStage",
    "reparameterize",
    "reparameterize_bern",
]


def reparameterize(key: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray,
                   training: bool) -> jnp.ndarray:
    """VAE trick; NOTE eval mode returns pure N(0,1) noise, not mu —
    a deliberate reference quirk (networks_3d.py:29-35)."""
    if training:
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(key, std.shape, std.dtype)
        return eps * std + mu
    return jax.random.normal(key, mu.shape, mu.dtype)


def reparameterize_bern(key: jax.Array, x: jnp.ndarray,
                        training: bool) -> jnp.ndarray:
    """Gumbel-style Bernoulli relaxation (networks_3d.py:38-43)."""
    if training:
        eps = jax.random.uniform(key, x.shape, x.dtype)
        return jnp.log(x + 1e-20) - jnp.log(-jnp.log(eps + 1e-20) + 1e-20)
    return jax.random.bernoulli(key, x).astype(x.dtype)


class FeatureExtractor(nn.Module):
    """num_blocks+1 stacked SN conv blocks (networks_3d.py:73-85)."""

    nfc: int
    ker_size: int
    padding: int
    num_blocks: int = 2
    return_linear: bool = False
    ndim: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_blocks):
            x = SNConv(self.nfc, self.ker_size, self.padding, self.ndim,
                       dtype=self.dtype, name=f"conv_block_{i}")(x)
        if self.return_linear:
            # bn=False branch of ConvBlockSN: plain reflect-pad conv, no act
            x = ConvND(self.nfc, self.ker_size, self.padding, self.ndim,
                       pad_mode="reflect", dtype=self.dtype,
                       name=f"conv_block_{self.num_blocks}")(x)
        else:
            x = SNConv(self.nfc, self.ker_size, self.padding, self.ndim,
                       dtype=self.dtype,
                       name=f"conv_block_{self.num_blocks}")(x)
        return x


class EncodeVAE(nn.Module):
    """Fully-convolutional VAE encoder: mu/logvar are spatial maps
    (networks_3d.py:88-107)."""

    latent_dim: int
    nfc: int
    ker_size: int
    enc_blocks: int = 2
    ndim: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pad = self.ker_size // 2
        feats = FeatureExtractor(self.nfc, self.ker_size, pad,
                                 num_blocks=self.enc_blocks, ndim=self.ndim,
                                 dtype=self.dtype, name="features")(x)
        mu = ConvND(self.latent_dim, self.ker_size, pad, self.ndim,
                    dtype=self.dtype, name="mu")(feats)
        logvar = ConvND(self.latent_dim, self.ker_size, pad, self.ndim,
                        dtype=self.dtype, name="logvar")(feats)
        return mu, logvar


class EncodeVAE_nb(nn.Module):
    """Bernoulli-gated encoder with global (pooled) latents
    (networks_3d.py:110-138)."""

    latent_dim: int
    nfc: int
    ker_size: int
    enc_blocks: int = 2
    ndim: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        pad = self.ker_size // 2
        feats = FeatureExtractor(self.nfc, self.ker_size, pad,
                                 num_blocks=self.enc_blocks, ndim=self.ndim,
                                 dtype=self.dtype, name="features")(x)
        bern = jax.nn.sigmoid(
            ConvND(1, self.ker_size, pad, self.ndim, dtype=self.dtype,
                   name="bern")(feats))
        feats = bern * feats
        # AdaptiveAvgPool(1) == global mean over the spatial axes (1..ndim)
        spatial_axes = tuple(range(1, x.ndim - 1))
        mu = ConvND(self.latent_dim, self.ker_size, pad, self.ndim,
                    dtype=self.dtype, name="mu")(feats)
        mu = jnp.mean(mu, axis=spatial_axes, keepdims=True)
        logvar = ConvND(self.latent_dim, self.ker_size, pad, self.ndim,
                        dtype=self.dtype, name="logvar")(feats)
        logvar = jnp.mean(logvar, axis=spatial_axes, keepdims=True)
        return mu, logvar, bern


class EncodeVAE1x1(nn.Module):
    """1x1-kernel encoder variant (networks_3d.py:141-160); unused by the
    default trainers but part of the zoo."""

    latent_dim: int
    nfc: int
    ndim: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = FeatureExtractor(self.nfc, 1, 0, num_blocks=2, ndim=self.ndim,
                                 dtype=self.dtype, name="features")(x)
        mu = ConvND(self.latent_dim, 1, 0, self.ndim, dtype=self.dtype,
                    name="mu")(feats)
        logvar = ConvND(self.latent_dim, 1, 0, self.ndim, dtype=self.dtype,
                        name="logvar")(feats)
        return mu, logvar


class Decoder(nn.Module):
    """VAE decoder conv stack: head + num_layer blocks + linear tail
    (networks_3d.py:337-341).  Output is raw; caller applies tanh."""

    nfc: int
    nc_im: int
    ker_size: int
    padd_size: int
    num_layer: int
    ndim: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 remat: bool = False) -> jnp.ndarray:
        Block = nn.remat(ConvBlock, static_argnums=(2,)) if remat else ConvBlock
        Tail = nn.remat(ConvND) if remat else ConvND
        x = Block(self.nfc, self.ker_size, self.padd_size, self.ndim,
                  dtype=self.dtype, name="head")(x, train)
        for i in range(self.num_layer):
            x = Block(self.nfc, self.ker_size, self.padd_size, self.ndim,
                      dtype=self.dtype, name=f"block{i}")(x, train)
        x = Tail(self.nc_im, self.ker_size, self.ker_size // 2, self.ndim,
                 dtype=self.dtype, name="tail")(x)
        return x


class Stage(nn.Module):
    """One refinement body stage — same stack as Decoder but image-to-image
    (networks_3d.py:352-363).  All stages share this structure, so stage
    growth is a pure param-tree copy."""

    nfc: int
    nc_im: int
    ker_size: int
    padd_size: int
    num_layer: int
    ndim: int = 2
    dtype: Any = None
    pconv: bool = False
    mesh: Any = None  # --spmd: shard_map+halo kernel routing (blocks.ConvND)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 remat: bool = False) -> jnp.ndarray:
        # per-block nn.remat: the backward pass holds at most one conv
        # activation at a time instead of num_layer+2 of them — needed for
        # the 204-256 px pyramid scales (16 GB HBM)
        Block = nn.remat(ConvBlock, static_argnums=(2,)) if remat else ConvBlock
        Tail = nn.remat(ConvND) if remat else ConvND
        x = Block(self.nfc, self.ker_size, self.padd_size, self.ndim,
                  dtype=self.dtype, pconv=self.pconv, mesh=self.mesh,
                  name="head")(x, train)
        for i in range(self.num_layer):
            x = Block(self.nfc, self.ker_size, self.padd_size, self.ndim,
                      dtype=self.dtype, pconv=self.pconv, mesh=self.mesh,
                      name=f"block{i}")(x, train)
        x = Tail(self.nc_im, self.ker_size, self.ker_size // 2, self.ndim,
                 dtype=self.dtype, name="tail")(x)
        return x


class WDiscriminator(nn.Module):
    """Patch WGAN critic: SN head + SN body + linear tail, per-patch score
    map with no pooling (networks_3d.py:163-181).  Note the tail's padding
    is hardcoded to 1 in the reference regardless of ker_size — kept."""

    nfc: int
    ker_size: int
    num_layer: int
    ndim: int = 2
    dtype: Any = None
    pconv: bool = False
    mesh: Any = None        # --spmd: shard_map+halo kernel routing
    pfuse: bool = False     # fuse consecutive body conv+lrelu PAIRS into
    #                         the multi-conv VMEM kernel (ops/pallas/
    #                         conv3d_fuse.py); odd trailing block falls
    #                         back to the single-conv path (pconv or lax)

    def _pfuse_applies(self, x) -> bool:
        if not (self.pfuse and self.ndim == 3 and self.ker_size == 3
                and self.nfc == 64):
            return False
        from ..ops.pallas.conv3d_fuse import pfuse_ok, pfuse_wins
        kshape = (3, 3, 3, 64, 64)
        return pfuse_ok(x.shape, kshape, dtype=self.dtype) \
            and pfuse_wins(x.shape)

    @nn.compact
    def __call__(self, x: jnp.ndarray, remat: bool = False) -> jnp.ndarray:
        SNC = nn.remat(SNConv) if remat else SNConv
        Tail = nn.remat(ConvND) if remat else ConvND
        pad = self.ker_size // 2
        x = SNC(self.nfc, self.ker_size, pad, self.ndim, dtype=self.dtype,
                name="head")(x)
        fuse_pairs = self._pfuse_applies(x)
        i = 0
        while i < self.num_layer:
            if fuse_pairs and i + 1 < self.num_layer:
                # both SNConv modules are declared with their usual names
                # (identical variable tree to the sequential path); defer
                # returns the normalized weights and the fused kernel
                # applies conv+lrelu twice with the intermediate in VMEM
                from ..ops.pallas.conv3d_fuse import conv3d64_pair
                w1, b1 = SNC(self.nfc, self.ker_size, pad, self.ndim,
                             dtype=self.dtype, defer=True,
                             name=f"block{i}")(x)
                w2, b2 = SNC(self.nfc, self.ker_size, pad, self.ndim,
                             dtype=self.dtype, defer=True,
                             name=f"block{i + 1}")(x)
                xq = x if self.dtype is None else x.astype(self.dtype)
                x = conv3d64_pair(xq, w1, b1, w2, b2)
                i += 2
            else:
                x = SNC(self.nfc, self.ker_size, pad, self.ndim,
                        dtype=self.dtype, pconv=self.pconv, mesh=self.mesh,
                        name=f"block{i}")(x)
                i += 1
        x = Tail(1, self.ker_size, 1, self.ndim, dtype=self.dtype,
                 name="tail")(x)
        return x


class WDiscriminatorBaselines(nn.Module):
    """Non-SN critic for the SinGAN/ConSinGAN baselines: input zero-padded by
    (num_layer+2) on every spatial side, N(0,0.02) init
    (networks_3d.py:184-210)."""

    nfc: int
    nc_im: int
    ker_size: int
    padd_size: int
    num_layer: int
    ndim: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 remat: bool = False) -> jnp.ndarray:
        Block = nn.remat(ConvBlock, static_argnums=(2,)) if remat else ConvBlock
        Tail = nn.remat(ConvND) if remat else ConvND
        p = self.num_layer + 2
        pad_width = [(0, 0)] + [(p, p)] * self.ndim + [(0, 0)]
        x = jnp.pad(x, pad_width)
        x = Block(self.nfc, self.ker_size, self.padd_size, self.ndim,
                  use_norm=False, init_mode="n002", dtype=self.dtype,
                  name="head")(x, train)
        for i in range(self.num_layer):
            x = Block(self.nfc, self.ker_size, self.padd_size, self.ndim,
                      use_norm=True, init_mode="n002", dtype=self.dtype,
                      name=f"block{i}")(x, train)
        x = Tail(1, self.ker_size, self.padd_size, self.ndim,
                 init_mode="n002", dtype=self.dtype, name="tail")(x)
        return x


class CSGStage(nn.Module):
    """One ConSinGAN body stage: num_layer VALID convs (shrinks 2*num_layer)
    (networks_3d.py:229-234)."""

    nfc: int
    ker_size: int
    num_layer: int
    ndim: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 remat: bool = False) -> jnp.ndarray:
        Block = nn.remat(ConvBlock, static_argnums=(2,)) if remat else ConvBlock
        for i in range(self.num_layer):
            x = Block(self.nfc, self.ker_size, 0, self.ndim,
                      init_mode="n002", dtype=self.dtype,
                      name=f"block{i}")(x, train)
        return x


class SGStage(nn.Module):
    """One SinGAN stage: full head+blocks+tail sub-generator, all VALID
    (networks_3d.py:283-291)."""

    nfc: int
    nc_im: int
    ker_size: int
    num_layer: int
    ndim: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 remat: bool = False) -> jnp.ndarray:
        Block = nn.remat(ConvBlock, static_argnums=(2,)) if remat else ConvBlock
        Tail = nn.remat(ConvND) if remat else ConvND
        x = Block(self.nfc, self.ker_size, 0, self.ndim,
                  init_mode="n002", dtype=self.dtype, name="head")(x, train)
        for i in range(self.num_layer):
            x = Block(self.nfc, self.ker_size, 0, self.ndim,
                      init_mode="n002", dtype=self.dtype,
                      name=f"block{i}")(x, train)
        x = Tail(self.nc_im, self.ker_size, 0, self.ndim, init_mode="n002",
                 dtype=self.dtype, name="tail")(x)
        return x
