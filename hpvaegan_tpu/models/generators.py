"""Generator orchestrators — growing multi-scale pyramids as param-tree lists.

The reference models are torch Modules whose ``body`` ModuleList grows one
stage per scale via ``init_next_stage`` (deepcopy of the last stage,
networks_3d.py:352-365).  Here a generator is a thin *functional* object: it
owns immutable flax module definitions and pure ``apply`` methods over an
explicit variables pytree

    gvars = {"encode": vars, "decoder": vars, "body": [vars, ...]}

so stage growth is a literal tree append (jnp arrays are immutable — a
"deepcopy" is sharing), per-stage optimizers see plain subtrees, and the
whole forward jits per scale with fully static shapes.

Forward-pass parity references:
* GeneratorHPVAEGAN.forward / refinement_layers  networks_3d.py:367-406,
  networks_2d.py:230-269 (2D injects noise at EVERY stage in rand mode,
  networks_2d.py:261; 3D only for post-VAE stages, networks_3d.py:398 —
  preserved via ``noise_all_stages``).
* GeneratorVAE_nb                                 networks_3d.py:409-485
* GeneratorCSG                                    networks_3d.py:213-269
* GeneratorSG                                     networks_3d.py:272-322
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.pyramid import Pyramid
from ..ops.noise import generate_noise
from ..ops.resize import interpolate_2d, interpolate_3d
from .networks import (CSGStage, Decoder, EncodeVAE, EncodeVAE_nb, SGStage,
                       Stage, reparameterize, reparameterize_bern)

__all__ = ["GeneratorHPVAEGAN", "GeneratorVAE_nb", "GeneratorCSG",
           "GeneratorSG"]


def _pad_spatial(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Zero-pad every spatial dim by p (torch F.pad equivalent)."""
    pad_width = [(0, 0)] + [(p, p)] * (x.ndim - 2) + [(0, 0)]
    return jnp.pad(x, pad_width)


def _remat_level(cfg):
    """False | True (stage-level jax.checkpoint) | "blocks" (+ inner
    nn.remat per conv block)."""
    if getattr(cfg, "remat_blocks", False):
        return "blocks"
    return bool(getattr(cfg, "remat", False))


def _apply_bn_module(mod, mvars, x, train, remat=False, cfg=None):
    """Apply a module that owns BatchNorm state; thread batch_stats.

    With ``remat`` the forward is wrapped in ``jax.checkpoint``: the
    backward pass recomputes the module's internal activations instead of
    keeping ~num_layer C-channel feature maps per stage live in HBM — the
    difference between fitting and OOMing the largest pyramid scales on a
    16 GB chip (the kept residual boundaries are 3-channel).

    ``cfg`` (only passed for Stage/Decoder-layout modules): when
    cfg.wpack is on and the shape qualifies, run the width-packed
    execution path (models/packed.py) — numerically equivalent, ~1.3x
    faster per conv at the largest scales."""
    if cfg is not None:
        from .packed import stage_apply_packed, wpack_ok
        if wpack_ok(cfg, x.shape):
            def pfwd(mvars, x):
                return stage_apply_packed(
                    mvars, x, train, num_layer=mod.num_layer,
                    dtype=mod.dtype, blocks_remat=(remat == "blocks"))
            if remat:
                pfwd = jax.checkpoint(pfwd)
            return pfwd(mvars, x)

    kw = {"remat": True} if remat == "blocks" else {}

    def fwd(mvars, x):
        if train:
            y, upd = mod.apply(mvars, x, True, mutable=["batch_stats"], **kw)
            return y, {**mvars, **upd}
        return mod.apply(mvars, x, False, **kw), mvars

    if remat:
        fwd = jax.checkpoint(fwd)
    return fwd(mvars, x)


class _PyramidMixin:
    pyramid: Pyramid
    ndim: int
    # SPMD: when the trainer wires a device mesh in (make_*_steps(mesh=...)),
    # every inter-stage upscale re-anchors the activation's 'spatial'
    # sharding — the resize is a dense H-mixing matmul, so XLA propagation
    # alone cannot carry a spatial partition across stage boundaries.
    mesh = None

    def _upscale(self, x: jnp.ndarray, index: int) -> jnp.ndarray:
        if self.ndim == 3:
            x = interpolate_3d(x, self.pyramid.shape3d(index))
        else:
            x = interpolate_2d(x, self.pyramid.shape2d(index))
        if self.mesh is not None:
            from ..parallel.mesh import spatial_constraint
            x = spatial_constraint(x, self.mesh)
        return x

    def _scale0_shape(self, batch: int, channels: int) -> Tuple[int, ...]:
        if self.ndim == 3:
            t, h, w = self.pyramid.shape3d(0)
            return (batch, t, h, w, channels)
        h, w = self.pyramid.shape2d(0)
        return (batch, h, w, channels)


class GeneratorHPVAEGAN(_PyramidMixin):
    """The core model (networks_3d.py:325-406 / networks_2d.py:188-269)."""

    returns_triple = True  # rec-mode forward returns (out, vae, (mu, logvar))

    def __init__(self, cfg, pyramid: Pyramid, ndim: int):
        self.cfg = cfg
        self.pyramid = pyramid
        self.ndim = ndim
        dtype = jnp.bfloat16 if getattr(cfg, "bf16", False) else None
        self.encoder = EncodeVAE(latent_dim=cfg.latent_dim, nfc=cfg.nfc,
                                 ker_size=cfg.ker_size,
                                 enc_blocks=cfg.enc_blocks, ndim=ndim,
                                 dtype=dtype)
        self.decoder = Decoder(nfc=cfg.nfc, nc_im=cfg.nc_im,
                               ker_size=cfg.ker_size, padd_size=cfg.padd_size,
                               num_layer=cfg.num_layer, ndim=ndim, dtype=dtype)
        self.stage_def = Stage(nfc=cfg.nfc, nc_im=cfg.nc_im,
                               ker_size=cfg.ker_size, padd_size=cfg.padd_size,
                               num_layer=cfg.num_layer, ndim=ndim, dtype=dtype,
                               pconv=getattr(cfg, "pconv_all", False))
        # 2D/3D rand-mode noise-injection asymmetry (networks_2d.py:261 vs
        # networks_3d.py:398)
        self.noise_all_stages = (ndim == 2)

    # -- lifecycle ---------------------------------------------------------
    def init(self, key: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        k_e, k_d = jax.random.split(key)
        x0 = jnp.zeros(self._scale0_shape(batch_size, self.cfg.nc_im))
        z0 = jnp.zeros(self._scale0_shape(batch_size, self.cfg.latent_dim))
        evars = self.encoder.init(k_e, x0)
        dvars = self.decoder.init(k_d, z0, True)
        return {"encode": dict(evars), "decoder": dict(dvars), "body": []}

    def init_next_stage(self, gvars: Dict[str, Any],
                        key: Optional[jax.Array] = None) -> Dict[str, Any]:
        body = list(gvars["body"])
        if not body:
            assert key is not None, "first stage init needs a PRNG key"
            x0 = jnp.zeros(self._scale0_shape(1, self.cfg.nc_im))
            body.append(dict(self.stage_def.init(key, x0, True)))
        else:
            # jnp.copy, not structural sharing: donated train steps require
            # every buffer in the input tree to be unique
            body.append(jax.tree_util.tree_map(jnp.copy, body[-1]))
        return {**gvars, "body": body}

    # -- forward -----------------------------------------------------------
    def apply(self, gvars: Dict[str, Any], amps: jnp.ndarray, key: jax.Array,
              real_zero: Optional[jnp.ndarray] = None,
              noise_init: Optional[jnp.ndarray] = None,
              sample_init: Optional[Tuple[int, jnp.ndarray]] = None,
              mode: str = "rec", train: bool = True):
        """Returns ((out, vae_out, (mu, logvar)|None), new_gvars)."""
        new_gvars = dict(gvars)
        key, k_rep = jax.random.split(key)

        if noise_init is None:
            assert real_zero is not None
            mu, logvar = self.encoder.apply(gvars["encode"], real_zero)
            z_vae = reparameterize(k_rep, mu, logvar, train)
            stats = (mu, logvar)
        else:
            z_vae = noise_init
            stats = None

        vae_raw, new_gvars["decoder"] = _apply_bn_module(
            self.decoder, gvars["decoder"], z_vae, train)
        vae_out = jnp.tanh(vae_raw)

        if sample_init is not None:
            start_idx, x = sample_init
            assert len(gvars["body"]) > start_idx, \
                "Starting index must be lower than # of body blocks"
        else:
            start_idx, x = 0, vae_out

        x, new_body, _ = self._refinement_layers(gvars["body"], start_idx, x,
                                                 amps, key, mode, train)
        new_gvars["body"] = new_body
        return (x, vae_out, stats), new_gvars

    def apply_prefix(self, gvars: Dict[str, Any], amps: jnp.ndarray,
                     key: jax.Array,
                     real_zero: Optional[jnp.ndarray] = None,
                     noise_init: Optional[jnp.ndarray] = None,
                     mode: str = "rec", train: bool = True, upto: int = 0):
        """Forward through encoder/decoder + refinement stages [0, upto) —
        the frozen prefix under --fast-grads (train/steps.py hoists it out
        of the generator-step VJP and reuses the critic-step rand prefix).

        Returns ((x, vae_out, stats, key), new_gvars): ``key`` is the
        threaded PRNG state after the prefix's noise draws, so
        ``apply_suffix`` continues the exact noise stream of the unsplit
        ``apply`` (bit-identical fake)."""
        new_gvars = dict(gvars)
        key, k_rep = jax.random.split(key)

        if noise_init is None:
            assert real_zero is not None
            mu, logvar = self.encoder.apply(gvars["encode"], real_zero)
            z_vae = reparameterize(k_rep, mu, logvar, train)
            stats = (mu, logvar)
        else:
            z_vae = noise_init
            stats = None

        vae_raw, new_gvars["decoder"] = _apply_bn_module(
            self.decoder, gvars["decoder"], z_vae, train)
        vae_out = jnp.tanh(vae_raw)

        x, new_body, key = self._refinement_layers(
            gvars["body"], 0, vae_out, amps, key, mode, train, stop=upto)
        new_gvars["body"] = new_body
        return (x, vae_out, stats, key), new_gvars

    def apply_suffix(self, gvars: Dict[str, Any], amps: jnp.ndarray,
                     key: jax.Array, x: jnp.ndarray, start_idx: int,
                     mode: str = "rand", train: bool = True):
        """Refinement stages [start_idx, len(body)) continuing from
        ``apply_prefix`` (``key`` = the threaded state it returned)."""
        x, new_body, _ = self._refinement_layers(gvars["body"], start_idx, x,
                                                 amps, key, mode, train)
        return x, {**gvars, "body": new_body}

    def _refinement_layers(self, body: Sequence[Dict[str, Any]],
                           start_idx: int, x: jnp.ndarray, amps: jnp.ndarray,
                           key: jax.Array, mode: str, train: bool,
                           stop: Optional[int] = None):
        new_body = list(body)
        for idx in range(start_idx, len(body) if stop is None else stop):
            if self.cfg.vae_levels == idx + 1 and not self.cfg.train_all:
                x = jax.lax.stop_gradient(x)
            x_up = self._upscale(x, idx + 1)
            if mode == "rand" and (self.noise_all_stages
                                   or self.cfg.vae_levels <= idx + 1):
                key, k_n = jax.random.split(key)
                noise = generate_noise(k_n, ref=x_up)
                x_in = x_up + noise * amps[idx + 1]
            else:
                x_in = x_up
            y, new_body[idx] = _apply_bn_module(self.stage_def, body[idx],
                                                x_in, train,
                                                remat=_remat_level(self.cfg),
                                                cfg=self.cfg)
            x = jnp.tanh(y + x_up)
        return x, new_body, key

    def apply_fused(self, gvars: Dict[str, Any], amps: jnp.ndarray,
                    key: jax.Array, real_zero: jnp.ndarray,
                    noise_init: jnp.ndarray, train: bool = True):
        """Rec + rand forwards BATCHED through decoder and stages: one conv
        dispatch per layer at 2x batch instead of two passes (--fused-
        forwards).  Semantics identical to two separate passes except that
        BatchNorm train-mode statistics are computed over the combined
        [rec | rand] batch — a documented deviation (the two halves see the
        same params and the same noise keys as the unfused path).

        Returns ((generated, fake, vae_out_rec, (mu, logvar)), new_gvars).
        """
        b = real_zero.shape[0]
        new_gvars = dict(gvars)
        key, k_rep = jax.random.split(key)

        mu, logvar = self.encoder.apply(gvars["encode"], real_zero)
        z_vae = reparameterize(k_rep, mu, logvar, train)

        dec_in = jnp.concatenate([z_vae, noise_init], axis=0)
        vae_raw, new_gvars["decoder"] = _apply_bn_module(
            self.decoder, gvars["decoder"], dec_in, train)
        vae_out = jnp.tanh(vae_raw)

        x = vae_out
        new_body = list(gvars["body"])
        for idx in range(len(gvars["body"])):
            if self.cfg.vae_levels == idx + 1 and not self.cfg.train_all:
                x = jax.lax.stop_gradient(x)
            x_up = self._upscale(x, idx + 1)
            if self.noise_all_stages or self.cfg.vae_levels <= idx + 1:
                key, k_n = jax.random.split(key)
                noise = generate_noise(k_n, ref=x_up[b:])
                noise = jnp.concatenate([jnp.zeros_like(noise), noise],
                                        axis=0)
                x_in = x_up + noise * amps[idx + 1]
            else:
                x_in = x_up
            y, new_body[idx] = _apply_bn_module(self.stage_def,
                                                gvars["body"][idx], x_in,
                                                train,
                                                remat=_remat_level(self.cfg),
                                                cfg=self.cfg)
            x = jnp.tanh(y + x_up)
        new_gvars["body"] = new_body
        return (x[:b], x[b:], vae_out[:b], (mu, logvar)), new_gvars


class GeneratorVAE_nb(_PyramidMixin):
    """Bernoulli-gated variant (networks_3d.py:409-485).  Note its
    refinement detach ignores train_all (networks_3d.py:470-471)."""

    returns_triple = True

    def __init__(self, cfg, pyramid: Pyramid, ndim: int):
        self.cfg = cfg
        self.pyramid = pyramid
        self.ndim = ndim
        dtype = jnp.bfloat16 if getattr(cfg, "bf16", False) else None
        self.encoder = EncodeVAE_nb(latent_dim=cfg.latent_dim, nfc=cfg.nfc,
                                    ker_size=cfg.ker_size,
                                    enc_blocks=cfg.enc_blocks, ndim=ndim,
                                    dtype=dtype)
        self.decoder = Decoder(nfc=cfg.nfc, nc_im=cfg.nc_im,
                               ker_size=cfg.ker_size, padd_size=cfg.padd_size,
                               num_layer=cfg.num_layer, ndim=ndim, dtype=dtype)
        self.stage_def = Stage(nfc=cfg.nfc, nc_im=cfg.nc_im,
                               ker_size=cfg.ker_size, padd_size=cfg.padd_size,
                               num_layer=cfg.num_layer, ndim=ndim, dtype=dtype,
                               pconv=getattr(cfg, "pconv_all", False))
        self.noise_all_stages = True  # both 2D & 3D nb variants inject always

    def init(self, key: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        k_e, k_d = jax.random.split(key)
        x0 = jnp.zeros(self._scale0_shape(batch_size, self.cfg.nc_im))
        z0 = jnp.zeros(self._scale0_shape(batch_size, self.cfg.latent_dim))
        evars = self.encoder.init(k_e, x0)
        dvars = self.decoder.init(k_d, z0, True)
        return {"encode": dict(evars), "decoder": dict(dvars), "body": []}

    init_next_stage = GeneratorHPVAEGAN.init_next_stage

    def apply(self, gvars, amps, key,
              real_zero=None, noise_init_norm=None, noise_init_bern=None,
              noise_init=None, sample_init=None, mode: str = "rec",
              train: bool = True):
        """``noise_init`` (EXTENSION, no reference counterpart — the
        reference trainers crash before reaching a VAE_nb rand path): a
        Z_init-shaped tensor used only for batch geometry + RNG; the actual
        latents are drawn from the model prior — z_norm ~ N(0,1) global,
        z_bern ~ Bernoulli(0.5) spatial — matching the eval-mode
        ``reparameterize``/``reparameterize_bern`` distributions
        (networks_3d.py:29-43).  Explicit ``noise_init_norm/bern`` keep the
        reference forward signature (networks_3d.py:444-455)."""
        new_gvars = dict(gvars)
        key, k_norm, k_bern = jax.random.split(key, 3)

        if noise_init_norm is None and noise_init is not None:
            b = noise_init.shape[0]
            ones = (1,) * (noise_init.ndim - 2)
            noise_init_norm = jax.random.normal(
                k_norm, (b, *ones, self.cfg.latent_dim), noise_init.dtype)
            noise_init_bern = jax.random.bernoulli(
                k_bern, 0.5, (b, *noise_init.shape[1:-1], 1)
            ).astype(noise_init.dtype)

        if noise_init_norm is None:
            assert real_zero is not None
            mu, logvar, bern = self.encoder.apply(gvars["encode"], real_zero)
            z_norm = reparameterize(k_norm, mu, logvar, train)
            z_bern = reparameterize_bern(k_bern, bern, train)
            stats = (mu, logvar, bern)
        else:
            z_norm, z_bern = noise_init_norm, noise_init_bern
            stats = None

        vae_raw, new_gvars["decoder"] = _apply_bn_module(
            self.decoder, gvars["decoder"], z_norm * z_bern, train)
        vae_out = jnp.tanh(vae_raw)

        if sample_init is not None:
            start_idx, x = sample_init
        else:
            start_idx, x = 0, vae_out

        x, new_body, _ = self._refinement_layers(gvars["body"], start_idx, x,
                                                 amps, key, mode, train)
        new_gvars["body"] = new_body
        return (x, vae_out, stats), new_gvars

    def _refinement_layers(self, body, start_idx, x, amps, key, mode, train,
                           stop=None):
        new_body = list(body)
        for idx in range(start_idx, len(body) if stop is None else stop):
            if self.cfg.vae_levels == idx + 1:  # no train_all escape here
                x = jax.lax.stop_gradient(x)
            x_up = self._upscale(x, idx + 1)
            if mode == "rand":
                key, k_n = jax.random.split(key)
                noise = generate_noise(k_n, ref=x_up)
                x_in = x_up + noise * amps[idx + 1]
            else:
                x_in = x_up
            y, new_body[idx] = _apply_bn_module(self.stage_def, body[idx],
                                                x_in, train,
                                                remat=_remat_level(self.cfg),
                                                cfg=self.cfg)
            x = jnp.tanh(y + x_up)
        return x, new_body, key


class GeneratorCSG(_PyramidMixin):
    """ConSinGAN-style baseline (networks_3d.py:213-269): shared head/tail,
    growing body of VALID-conv stages, resize-as-padding noise injection."""

    returns_triple = False
    has_head_tail = True

    def __init__(self, cfg, pyramid: Pyramid, ndim: int = 3):
        from .blocks import ConvBlock, ConvND
        self.cfg = cfg
        self.pyramid = pyramid
        self.ndim = ndim
        dtype = jnp.bfloat16 if getattr(cfg, "bf16", False) else None
        self.head_def = ConvBlock(cfg.nfc, cfg.ker_size, 0, ndim,
                                  init_mode="n002", dtype=dtype)
        self.stage_def = CSGStage(nfc=cfg.nfc, ker_size=cfg.ker_size,
                                  num_layer=cfg.num_layer, ndim=ndim,
                                  dtype=dtype)
        self.tail_def = ConvND(cfg.nc_im, cfg.ker_size, 0, ndim,
                               init_mode="n002", dtype=dtype)

    def init(self, key: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        k_h, k_s, k_t = jax.random.split(key, 3)
        x0 = jnp.zeros(self._scale0_shape(batch_size, self.cfg.nc_im))
        nl = self.cfg.num_layer
        h = self.head_def.init(k_h, _pad_spatial(x0, 1), True)
        hx = jnp.zeros(self._scale0_shape(batch_size, self.cfg.nfc))
        s = self.stage_def.init(k_s, _pad_spatial(hx, nl), True)
        t = self.tail_def.init(k_t, _pad_spatial(hx, 1))
        return {"head": dict(h), "tail": dict(t), "body": [dict(s)]}

    def init_next_stage(self, gvars, key=None):
        body = list(gvars["body"])
        # jnp.copy, not structural sharing: donated train steps require
        # every buffer in the input tree to be unique
        body.append(jax.tree_util.tree_map(jnp.copy, body[-1]))
        return {**gvars, "body": body}

    def apply(self, gvars, amps, key, noise_init=None, mode: str = "rand",
              train: bool = True, **_):
        nl = self.cfg.num_layer
        new_gvars = dict(gvars)
        x, new_gvars["head"] = _apply_bn_module(
            self.head_def, gvars["head"], _pad_spatial(noise_init, 1), train)
        new_body = list(gvars["body"])
        x, new_body[0] = _apply_bn_module(self.stage_def, gvars["body"][0],
                                          _pad_spatial(x, nl), train)
        for idx in range(1, len(gvars["body"])):
            x_up = self._upscale(x, idx)
            if mode == "rand":
                target = tuple(d + 2 * nl for d in x_up.shape[1:-1])
                resize = interpolate_3d if self.ndim == 3 else interpolate_2d
                x_pad = resize(x, target)
                key, k_n = jax.random.split(key)
                noise = generate_noise(k_n, ref=x_pad)
                x_in = x_pad + noise * amps[idx]
            else:
                x_in = _pad_spatial(x_up, nl)
            y, new_body[idx] = _apply_bn_module(self.stage_def,
                                                gvars["body"][idx], x_in,
                                                train,
                                                remat=_remat_level(self.cfg))
            x = y + x_up
        new_gvars["body"] = new_body
        out = self.tail_def.apply(gvars["tail"], _pad_spatial(x, 1))
        return jnp.tanh(out), new_gvars


class GeneratorSG(_PyramidMixin):
    """SinGAN-style baseline (networks_3d.py:272-322): each stage is a full
    sub-generator; tanh between stages."""

    returns_triple = False
    has_head_tail = False

    def __init__(self, cfg, pyramid: Pyramid, ndim: int = 3):
        self.cfg = cfg
        self.pyramid = pyramid
        self.ndim = ndim
        dtype = jnp.bfloat16 if getattr(cfg, "bf16", False) else None
        self.stage_def = SGStage(nfc=cfg.nfc, nc_im=cfg.nc_im,
                                 ker_size=cfg.ker_size,
                                 num_layer=cfg.num_layer, ndim=ndim,
                                 dtype=dtype)

    def init(self, key: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        x0 = jnp.zeros(self._scale0_shape(batch_size, self.cfg.nc_im))
        p = self.cfg.num_layer + 2
        s = self.stage_def.init(key, _pad_spatial(x0, p), True)
        return {"body": [dict(s)]}

    def init_next_stage(self, gvars, key=None):
        body = list(gvars["body"])
        # jnp.copy, not structural sharing: donated train steps require
        # every buffer in the input tree to be unique
        body.append(jax.tree_util.tree_map(jnp.copy, body[-1]))
        return {**gvars, "body": body}

    def apply(self, gvars, amps, key, noise_init=None, mode: str = "rand",
              train: bool = True, **_):
        p = self.cfg.num_layer + 2
        new_gvars = dict(gvars)
        new_body = list(gvars["body"])
        x, new_body[0] = _apply_bn_module(self.stage_def, gvars["body"][0],
                                          _pad_spatial(noise_init, p), train)
        for idx in range(1, len(gvars["body"])):
            x = jnp.tanh(x)
            x_up = self._upscale(x, idx)
            if mode == "rand":
                target = tuple(d + 2 * p for d in x_up.shape[1:-1])
                resize = interpolate_3d if self.ndim == 3 else interpolate_2d
                x_pad = resize(x, target)
                key, k_n = jax.random.split(key)
                noise = generate_noise(k_n, ref=x_pad)
                x_in = x_pad + noise * amps[idx]
            else:
                x_in = _pad_spatial(x_up, p)
            y, new_body[idx] = _apply_bn_module(self.stage_def,
                                                gvars["body"][idx], x_in,
                                                train,
                                                remat=_remat_level(self.cfg))
            x = y + x_up
        new_gvars["body"] = new_body
        return jnp.tanh(x), new_gvars
