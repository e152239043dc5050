"""SIFID — Single-Image Frechet Inception Distance (SinGAN, arXiv 1905.01164).

The 2D counterpart of SVFID (eval/_svfid.py): for ONE real image and each
generated image, compare the distribution of deep-feature-map *positions*
(every (h, w) site of an internal conv activation is one C-dimensional
sample) with the Frechet distance.  The canonical SIFID (pytorch-fid's
InceptionV3 wrapper with ``dims=64``, no resize) taps the output of
Inception's first conv block — Conv2d_1a_3x3 (s2) -> Conv2d_2a_3x3 ->
Conv2d_2b_3x3 (p1) -> maxpool(3, s2), 64 channels — at the image's native
resolution.  Neither metric exists in the reference repo (SURVEY.md §6:
no eval at all); this closes the 2D half of that gap on the rebuild side,
making the 2D quality-vs-compute curve rows comparable across checkpoints
in a feature space, exactly like the 3D curve's SVFID column.

Weights: pass a torchvision ``inception_v3`` state dict via
``weights_path`` (or ``$INCEPTION_WEIGHTS``) for paper-comparable numbers
— BatchNorm is folded into the convs at load (eval-mode BN is affine).
With no checkpoint available (this machine is offline) a fixed-seed
random stem is used — still a deterministic, whitened feature-space
distance that orders checkpoints sensibly, but NOT comparable to
published SIFID values.  The fallback is loudly logged, mirroring SVFID's.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ._svfid import frechet_distance

__all__ = ["InceptionStem", "STEM_LAYERS", "image_feature_stats", "sifid",
           "load_inception_torch", "random_stem_params"]

log = logging.getLogger(__name__)

# conv name -> (features, stride, symmetric pad).  The torchvision
# inception_v3 stem up to the first maxpool (= pytorch-fid's 64-dim FID
# block, the SIFID tap).  All kernels 3x3; BN(eps=1e-3)+ReLU per conv in
# torchvision, folded into the conv weights/bias on load here.
STEM_LAYERS: Tuple[Tuple[str, int, int, int], ...] = (
    ("Conv2d_1a_3x3", 32, 2, 0),
    ("Conv2d_2a_3x3", 32, 1, 0),
    ("Conv2d_2b_3x3", 64, 1, 1),
)

# tap name -> position: each conv's post-ReLU map, or "pool1" = the
# maxpool(3, s2) of Conv2d_2b_3x3's output (the canonical SIFID tap).
SIFID_TAPS = tuple(name for name, _, _, _ in STEM_LAYERS) + ("pool1",)


def _tap_min_hw(tap: str) -> int:
    """Smallest square input the tap's valid convs/pool can consume —
    walked backward through the stem schedule (single topology source).
    Per layer (kernel 3): smallest input yielding ``need`` outputs is
    ``(need-1)*stride + 3 - 2*pad``."""
    need = 3 if tap == "pool1" else 1  # pool window
    seen = tap == "pool1"
    for name, _, stride, pad in reversed(STEM_LAYERS):
        if not seen and name != tap:
            continue
        seen = True
        need = (need - 1) * stride + 3 - 2 * pad
    return need


def preprocess(image_pm1: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] RGB NHWC -> Inception input.

    pytorch-fid's wrapper maps [0, 1] images to 2x-1; our tensors are
    already in [-1, 1], so the transform is the identity.  SIFID runs at
    native resolution (SinGAN passes resize_input=False)."""
    return image_pm1


class InceptionStem(nn.Module):
    """Inception-v3 first block; ``__call__`` returns the feature map of
    ``tap`` (one of ``SIFID_TAPS``).  Convs carry folded-BN bias."""

    tap: str = "pool1"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.tap not in SIFID_TAPS:
            raise ValueError(f"unknown SIFID tap {self.tap!r}; "
                             f"choose from {SIFID_TAPS}")
        for name, features, stride, pad in STEM_LAYERS:
            x = nn.Conv(features, kernel_size=(3, 3),
                        strides=(stride, stride),
                        padding=[(pad, pad)] * 2, name=name)(x)
            x = nn.relu(x)
            if name == self.tap:
                return x
        return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                           padding="VALID")


@functools.lru_cache(maxsize=None)
def _jitted_apply(tap: str):
    """One compile per (tap, input shape) across the process (remote TPU
    compiles are slow — same caching discipline as _svfid._jitted_apply)."""
    return jax.jit(InceptionStem(tap=tap).apply)


def image_feature_stats(params, image_pm1: np.ndarray, tap: str = "pool1"):
    """(mu, cov) over feature-map positions of one [-1,1] NHWC image.

    ``image_pm1`` is (H, W, 3) or (1, H, W, 3)."""
    x = jnp.asarray(image_pm1, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    min_hw = _tap_min_hw(tap)
    if x.shape[1] < min_hw or x.shape[2] < min_hw:
        raise ValueError(f"image {x.shape[1:3]} too small for SIFID tap "
                         f"{tap!r} (needs H,W>={min_hw})")
    feats = _jitted_apply(tap)(params, preprocess(x))
    flat = np.asarray(feats, np.float64).reshape(-1, feats.shape[-1])
    mu = flat.mean(axis=0)
    cov = np.cov(flat, rowvar=False)
    return mu, cov


def load_inception_torch(weights_path: str, tap: str) -> Dict[str, Any]:
    """Convert a torchvision ``inception_v3`` state dict into this stem's
    param tree, folding eval-mode BatchNorm into each conv.

    Expected checkpoint (documented for future ingestion — none is
    available on this offline machine): torchvision's
    ``inception_v3_google-*.pth`` with keys ``Conv2d_1a_3x3.conv.weight``
    (no conv bias) and ``Conv2d_1a_3x3.bn.{weight,bias,running_mean,
    running_var}``; BN eps 1e-3.  Fold: w' = w * g/sqrt(v+eps),
    b' = b_bn - m * g/sqrt(v+eps).  Integrity: the file's sha256 is
    logged; pin via ``$INCEPTION_WEIGHTS_SHA256`` — a mismatch aborts.
    Only layers up to ``tap`` are converted, each shape-verified.
    """
    import torch

    from .c3d import _file_sha256

    digest = _file_sha256(weights_path)
    expected = os.environ.get("INCEPTION_WEIGHTS_SHA256", "")
    if expected and digest != expected.lower():
        raise ValueError(f"Inception checkpoint sha256 mismatch: "
                         f"{weights_path} has {digest}, "
                         f"$INCEPTION_WEIGHTS_SHA256 pins {expected}")
    log.info(f"Inception weights {weights_path}: sha256 {digest}")

    state = torch.load(weights_path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k[len("module."):] if k.startswith("module.") else k: v
             for k, v in state.items()}

    params: Dict[str, Any] = {}
    in_ch = 3
    for name, features, _, _ in STEM_LAYERS:
        wkey = f"{name}.conv.weight"
        if wkey not in state:
            raise KeyError(f"Inception checkpoint missing {wkey!r} "
                           f"(found keys like {sorted(state)[:4]})")
        w = np.asarray(state[wkey], np.float64)  # (O, I, kH, kW)
        want_w = (features, in_ch, 3, 3)
        if w.shape != want_w:
            raise ValueError(f"Inception checkpoint {name} has shape "
                             f"{w.shape}, expected {want_w} — not a "
                             f"torchvision inception_v3 state dict")
        g = np.asarray(state[f"{name}.bn.weight"], np.float64)
        b = np.asarray(state[f"{name}.bn.bias"], np.float64)
        m = np.asarray(state[f"{name}.bn.running_mean"], np.float64)
        v = np.asarray(state[f"{name}.bn.running_var"], np.float64)
        scale = g / np.sqrt(v + 1e-3)
        params[name] = {
            "kernel": jnp.asarray((w * scale[:, None, None, None])
                                  .transpose(2, 3, 1, 0), jnp.float32),
            "bias": jnp.asarray(b - m * scale, jnp.float32),
        }
        in_ch = features
        if name == tap:
            break
    return {"params": params}


def random_stem_params(tap: str, seed: int = 0) -> Dict[str, Any]:
    """Deterministic random-weight stem (the no-pretrained fallback)."""
    model = InceptionStem(tap=tap)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)


def sifid(real_image: np.ndarray, fake_images: Sequence[np.ndarray],
          weights_path: Optional[str] = None,
          tap: str = "pool1", seed: int = 0) -> dict:
    """SIFID of each fake against the single real image.

    Returns ``{"mean": float, "per_sample": [float, ...],
    "pretrained": bool, "tap": str}`` — the same contract as ``svfid``.
    """
    weights_path = weights_path or os.environ.get("INCEPTION_WEIGHTS", "")
    if weights_path:
        params = load_inception_torch(weights_path, tap)
        pretrained = True
    else:
        log.warning(
            "SIFID: no pretrained Inception weights (set $INCEPTION_WEIGHTS "
            "or pass weights_path) — using a fixed-seed RANDOM stem. Scores "
            "are deterministic and comparable to each other but NOT to "
            "published SIFID numbers.")
        params = random_stem_params(tap, seed)
        pretrained = False

    mu_r, cov_r = image_feature_stats(params, real_image, tap)
    scores = []
    for fake in fake_images:
        mu_f, cov_f = image_feature_stats(params, fake, tap)
        scores.append(frechet_distance(mu_r, cov_r, mu_f, cov_f))
    return {"mean": float(np.mean(scores)) if scores else float("nan"),
            "per_sample": scores, "pretrained": pretrained, "tap": tap}
