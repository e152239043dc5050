"""Checkpoint loading + jitted samplers, shared by the one-shot
``generate.py`` CLI and the persistent ``hpvaegan-serve`` server.

The reference fork has no generation or serving surface at all (rand-mode
sampling exists only inside training visualization, reference
train_video.py:226-241); this module is the TPU-native serving core: load
a trained checkpoint ONCE, rebuild the exact training module tree from the
experiment's ``config.json`` snapshot, jit the samplers at a fixed batch
size, and serve repeated requests at device latency (the per-invocation
XLA compile that dominates one-shot generation is paid once at startup).
"""
from __future__ import annotations

import argparse
import functools
import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.models.registry import make_generator
from hpvaegan_tpu.utils.saver import restore_file, write_video

__all__ = ["SNAPSHOT_KEYS", "apply_snapshot", "config_from_cli_args",
           "explicit_cli_keys", "SamplerSession"]


def config_from_cli_args(args) -> Config:
    """Overlay parsed CLI args onto a fresh Config (shared by the generate
    and serve entry points — one place owns the sampling_rates tuple
    coercion and any future special case)."""
    cfg = Config()
    for key, value in vars(args).items():
        attr = key.replace("-", "_")
        if hasattr(cfg, attr):
            setattr(cfg, attr, tuple(value) if attr == "sampling_rates"
                    else value)
    return cfg


def explicit_cli_keys(build_parser, argv=None) -> set:
    """Which dest names were explicitly present on the command line (parse
    with every default suppressed).  ``build_parser`` must be the SAME
    parser factory the CLI parsed its args with."""
    p = build_parser()
    for action in p._actions:
        action.default = argparse.SUPPRESS
        action.required = False
    return set(vars(p.parse_args(argv)).keys())

# training-time keys restored from the experiment's config.json snapshot
# (written at train start); any flag the user passes explicitly wins
SNAPSHOT_KEYS = (
    "generator", "nc_im", "nfc", "latent_dim", "vae_levels", "enc_blocks",
    "ker_size", "num_layer", "padd_size", "scale_factor", "noise_amp",
    "min_size", "max_size", "img_size", "sampling_rates", "stop_scale_time",
    "start_frame", "max_frames", "train_all", "bf16",
    "video_path", "image_path",
)


def apply_snapshot(cfg: Config, netG: str, explicit: set,
                   user_chose_source: bool) -> list:
    """Overlay the experiment's resolved config.json snapshot onto ``cfg``.

    ``explicit`` holds dest names the user passed on the command line (they
    win over the snapshot); ``user_chose_source`` suppresses the snapshot's
    video/image path when the user picked a source clip/image themselves.
    Returns the list of applied keys (empty when no snapshot exists).
    """
    snap_path = os.path.join(os.path.dirname(netG), "config.json")
    if not os.path.isfile(snap_path):
        return []
    with open(snap_path) as f:
        snap = json.load(f)
    applied = []
    for key in SNAPSHOT_KEYS:
        if key not in snap or key in explicit:
            continue
        if key in ("video_path", "image_path") and user_chose_source:
            continue
        value = snap[key]
        if key == "sampling_rates":
            value = tuple(value)
        # the snapshot is written AFTER adjust_scales: restore the
        # pre-adjust inputs so re-adjusting reproduces the training
        # pyramid exactly
        elif key == "scale_factor":
            value = snap.get("scale_factor_init", value)
        elif key == "noise_amp":
            value = snap.get("noise_amp_init", value)
        setattr(cfg, key, value)
        applied.append(key)
    if applied:
        logging.info(f"config.json snapshot: restored {applied} "
                     f"from {snap_path}")
    return applied


class SamplerSession:
    """A loaded checkpoint with jitted rand/rec/inject samplers.

    Parameters mirror the generation CLI surface: ``cfg`` must already have
    the snapshot applied and ``adjust_scales()`` called by the caller (the
    CLIs own flag parsing); the session owns everything from dataset/model
    construction through the jitted sampler functions.
    """

    def __init__(self, cfg: Config, *, batch_size: int = 2,
                 manual_seed: int = 0, h_factor: float = 1.0,
                 w_factor: float = 1.0, t_factor: float = 1.0,
                 mesh_shape: str = ""):
        self.cfg = cfg
        self.batch_size = int(batch_size)
        if not cfg.video_path and not cfg.image_path:
            raise RuntimeError(
                "no source clip/image configured: pass --video-path/"
                "--image-path, or keep the training config.json snapshot "
                "next to the --netG checkpoint")
        ndim = 3 if cfg.video_path else 2
        self.ndim = ndim

        if ndim == 3:
            from hpvaegan_tpu.data import SingleVideoDataset
            self.dataset = SingleVideoDataset(cfg)
        else:
            from hpvaegan_tpu.data import SingleImageDataset
            self.dataset = SingleImageDataset(cfg)
        pyramid = self.dataset.pyramid

        if not os.path.isfile(cfg.netG):
            raise RuntimeError(f"=> no <G> checkpoint found at '{cfg.netG}'")
        raw = restore_file(cfg.netG)
        self.scale = int(raw["scale"])
        cfg.scale_idx = self.scale

        if cfg.generator not in ("GeneratorHPVAEGAN", "GeneratorVAE_nb",
                                 "GeneratorCSG", "GeneratorSG"):
            raise ValueError(f"unknown generator for sampling: "
                             f"{cfg.generator!r}")

        self.root_key = jax.random.PRNGKey(manual_seed)
        G = make_generator(cfg.generator, cfg, pyramid, ndim=ndim)
        gvars = G.init(jax.random.fold_in(self.root_key, 7), batch_size=1)
        # sampling generator — possibly over an extrapolated pyramid
        if (h_factor, w_factor, t_factor) != (1.0, 1.0, 1.0):
            from hpvaegan_tpu.core.pyramid import ScaledPyramid
            pyramid = ScaledPyramid(pyramid, h_factor, w_factor, t_factor)
            G = make_generator(cfg.generator, cfg, pyramid, ndim=ndim)
        for i in range(self.scale):
            gvars = G.init_next_stage(
                gvars, jax.random.fold_in(self.root_key, 100 + i))
        gvars = restore_file(cfg.netG,
                             target={"scale": 0, "gvars": gvars,
                                     "noise_amps": raw["noise_amps"],
                                     "opt_g": raw.get("opt_g")})["gvars"]
        self.pyramid = pyramid
        self.G = G
        self.amps = jnp.asarray(raw["noise_amps"], jnp.float32)

        # HPVAEGAN samples latent-dim noise through the decoder; the CSG/SG
        # baselines sample image-channel noise (reference
        # train_video_baselines.py:41)
        self.is_triple = getattr(G, "returns_triple", True)
        noise_ch = cfg.latent_dim if self.is_triple else cfg.nc_im
        h0, w0 = pyramid.shape2d(0)
        if ndim == 3:
            self.noise_shape = (self.batch_size, pyramid.td(0), h0, w0,
                                noise_ch)
        else:
            self.noise_shape = (self.batch_size, h0, w0, noise_ch)

        self.mesh = None
        if mesh_shape:
            from hpvaegan_tpu.parallel import (make_mesh, parse_mesh_shape,
                                               shard_gvars)
            self.mesh = make_mesh(parse_mesh_shape(mesh_shape))
            gvars = shard_gvars(gvars, self.mesh)
        self.gvars = gvars

        amps, is_triple = self.amps, self.is_triple

        @jax.jit
        def sample_fn(gv, noise, key):
            ret, _ = G.apply(gv, amps, key, noise_init=noise, mode="rand",
                             train=True)
            return ret[0] if is_triple else ret

        @jax.jit
        def reconstruct_fn(gv, real_zero, key):
            if is_triple:
                (out, _, _), _ = G.apply(gv, amps, key, real_zero=real_zero,
                                         mode="rec", train=True)
            else:  # baselines reconstruct from their fixed Z_init noise
                out, _ = G.apply(gv, amps, key, noise_init=real_zero,
                                 mode="rec", train=True)
            return out

        @functools.partial(jax.jit, static_argnames=("start",))
        def inject_fn(gv, x_init, key, start):
            (out, _, _), _ = G.apply(gv, amps, key, noise_init=jnp.zeros(
                (x_init.shape[0], *self.noise_shape[1:])),
                sample_init=(start, x_init), mode="rand", train=True)
            return out

        self.sample_fn = sample_fn
        self.reconstruct_fn = reconstruct_fn
        self.inject_fn = inject_fn
        self._rec_zero = None

    # ---- convenience entry points (one batch each) ----

    def sample_batch(self, key) -> np.ndarray:
        """One rand-mode batch: draw noise under ``key``, run the pyramid."""
        noise = jax.random.normal(key, self.noise_shape)
        if self.mesh is not None:
            from hpvaegan_tpu.parallel import shard_batch
            noise = shard_batch(noise, self.mesh, self.ndim)
        return np.asarray(self.sample_fn(self.gvars, noise,
                                         jax.random.fold_in(key, 1)))

    def rec_input(self):
        """The rec-mode conditioning input: the real sample's zero-scale
        clip (HPVAEGAN) or the checkpointed fixed Z_init (CSG/SG baselines,
        reference train_video_baselines.py:38-43).  Cached after first use.
        Returns (real_zero_batch, real_current_scale_single)."""
        if self._rec_zero is not None:
            return self._rec_zero
        if self.ndim == 3:
            self.dataset.generate_frames(self.scale)
            cur, zero = self.dataset.get(0, hflip=False, scale_idx=self.scale)
        else:
            cur, zero = self.dataset.get(0, self.scale, hflip=False)
        if zero is None:
            zero = cur
        if self.is_triple:
            real_zero = jnp.asarray(np.stack([zero] * self.batch_size))
        else:
            z_path = os.path.join(os.path.dirname(self.cfg.netG), "Z_init")
            if not os.path.exists(z_path):
                raise RuntimeError(f"baselines rec mode needs {z_path}")
            real_zero = jnp.asarray(restore_file(z_path)["data"])
        self._rec_zero = (real_zero, cur)
        return self._rec_zero

    def reconstruct_batch(self, key) -> np.ndarray:
        real_zero, _ = self.rec_input()
        return np.asarray(self.reconstruct_fn(self.gvars, real_zero,
                                              jax.random.fold_in(key, 1)))

    def write_sample(self, frame: np.ndarray, path_base: str) -> str:
        """[-1,1] sample -> .avi (3D, MJPG at the top-scale fps) or .png
        (2D).  Returns the written path."""
        if self.ndim == 3:
            path = path_base + ".avi"
            write_video(frame, path, self.pyramid.fps(self.scale))
            return path
        import cv2
        path = path_base + ".png"
        img = (np.clip(frame, -1, 1) + 1.0) * 127.5
        cv2.imwrite(path, np.uint8(img[:, :, ::-1]))
        return path

    def warmup(self, modes=("rand",)) -> None:
        """Pay the XLA compile for the given modes up front (serve startup).
        Unknown mode strings raise — a silently skipped warmup would move
        the 30-260 s compile into the first live request."""
        for mode in modes:
            key = jax.random.fold_in(self.root_key, 999983)
            if mode == "rand":
                self.sample_batch(key)
            elif mode == "rec":
                self.reconstruct_batch(key)
            else:
                raise ValueError(f"unknown warmup mode {mode!r} (rand|rec)")
