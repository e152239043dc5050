"""SVFID — Single-Video Frechet Inception Distance on C3D features.

The HP-VAE-GAN paper's quantitative metric (arXiv 2006.12226 §5): the
single-sample analogue of FID, following SinGAN's SIFID.  For ONE real
video and each generated video, the distribution being compared is the set
of C3D feature-map *positions* (every (t, h, w) site of an internal conv
activation is one C-dimensional sample); SVFID is the Frechet distance
between the real video's feature statistics and the fake's, averaged over
fakes.  Not present anywhere in the reference repo (SURVEY.md §6 — the
reference publishes no metrics); this closes that gap on the rebuild side.

Weights: pass the Sports-1M pretrained C3D torch checkpoint via
``weights_path`` (or ``$C3D_WEIGHTS``) for paper-comparable numbers; with
no checkpoint available (this machine is offline) a fixed-seed random C3D
is used — still a deterministic, whitened feature-space distance that
orders models sensibly, but NOT comparable to published SVFID values.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .c3d import (C3D, C3D_LAYERS, _PRE_POOL, load_c3d_torch, preprocess,
                  random_c3d_params)

__all__ = ["c3d_feature_stats", "frechet_distance", "svfid"]

log = logging.getLogger(__name__)


def _tap_min_shape(feature_layer: str):
    """(min_T, min_HW) the pool schedule requires to reach the tap —
    derived from the single topology source in ``c3d.py``."""
    t, hw = 1, 1
    for name, _ in C3D_LAYERS:
        window = _PRE_POOL.get(name)
        if window is not None:
            t *= window[0]
            hw *= window[1]
        if name == feature_layer:
            return t, hw
    raise ValueError(f"unknown C3D layer {feature_layer!r}")


@functools.lru_cache(maxsize=None)
def _jitted_apply(feature_layer: str):
    """Cached jitted C3D forward — one compile per (layer, input shape)
    across the whole process, not per call (remote TPU compiles are slow)."""
    return jax.jit(C3D(feature_layer=feature_layer).apply)


def c3d_feature_stats(params, video_pm1: np.ndarray,
                      feature_layer: str = "conv3b"):
    """(mu, cov) over feature-map positions of one [-1,1] NTHWC video.

    ``video_pm1`` is (T, H, W, 3) or (1, T, H, W, 3).
    """
    x = jnp.asarray(video_pm1, jnp.float32)
    if x.ndim == 4:
        x = x[None]
    min_t, min_hw = _tap_min_shape(feature_layer)
    if x.shape[1] < min_t or x.shape[2] < min_hw or x.shape[3] < min_hw:
        raise ValueError(
            f"video {x.shape[1:4]} too small for C3D tap {feature_layer!r} "
            f"(needs T>={min_t}, H,W>={min_hw})")
    feats = _jitted_apply(feature_layer)(params, preprocess(x))
    flat = np.asarray(feats, np.float64).reshape(-1, feats.shape[-1])
    mu = flat.mean(axis=0)
    cov = np.cov(flat, rowvar=False)
    return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 (C1 C2)^(1/2)).

    sqrtm via scipy (the standard pytorch-fid approach) with an eps*I
    reseed when the product matrix is singular — ReLU feature covariances
    are routinely rank-deficient (many dead channels), so the reseed is
    the expected path, not an error.
    """
    import warnings

    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1, np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, np.float64))
    cov1 = np.atleast_2d(np.asarray(cov1, np.float64))
    cov2 = np.atleast_2d(np.asarray(cov2, np.float64))

    diff = mu1 - mu2
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", linalg.LinAlgWarning)
            covmean = np.asarray(linalg.sqrtm(cov1 @ cov2))
        singular = not np.isfinite(covmean).all()
    except linalg.LinAlgWarning:
        singular = True
    if singular:
        offset = np.eye(cov1.shape[0]) * eps
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", linalg.LinAlgWarning)
            covmean = np.asarray(linalg.sqrtm((cov1 + offset)
                                              @ (cov2 + offset)))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def svfid(real_video: np.ndarray, fake_videos: Sequence[np.ndarray],
          weights_path: Optional[str] = None,
          feature_layer: str = "conv3b", seed: int = 0) -> dict:
    """SVFID of each fake against the single real video.

    Returns ``{"mean": float, "per_sample": [float, ...],
    "pretrained": bool, "feature_layer": str}``.
    """
    weights_path = weights_path or os.environ.get("C3D_WEIGHTS", "")
    if weights_path:
        params = load_c3d_torch(weights_path, feature_layer)
        pretrained = True
    else:
        log.warning(
            "SVFID: no pretrained C3D weights (set $C3D_WEIGHTS or pass "
            "weights_path) — using a fixed-seed RANDOM C3D. Scores are "
            "deterministic and comparable to each other but NOT to "
            "published SVFID numbers.")
        params = random_c3d_params(feature_layer, seed)
        pretrained = False

    mu_r, cov_r = c3d_feature_stats(params, real_video, feature_layer)
    scores = []
    for fake in fake_videos:
        mu_f, cov_f = c3d_feature_stats(params, fake, feature_layer)
        scores.append(frechet_distance(mu_r, cov_r, mu_f, cov_f))
    return {"mean": float(np.mean(scores)) if scores else float("nan"),
            "per_sample": scores, "pretrained": pretrained,
            "feature_layer": feature_layer}
