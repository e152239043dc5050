"""C3D feature backbone for SVFID (Tran et al., ICCV 2015, arXiv 1412.0767).

The HP-VAE-GAN paper (arXiv 2006.12226 §5) evaluates generated videos with
SVFID — the single-video analogue of SinGAN's SIFID — computed on features
of a C3D network pretrained on Sports-1M.  Neither metric exists in the
reference repo (SURVEY.md §6: no benchmarks, no eval scripts), so this is a
rebuild-side addition closing that gap.

SVFID only consumes *convolutional* feature maps (statistics are taken over
feature-map positions, exactly like SIFID taps Inception's early conv
layers), so this module implements the C3D conv stack only — conv1..conv5b
with the standard max-pool schedule — and exposes every conv's post-ReLU
activation as a tap point.  The fc6/fc7/fc8 classifier head is not needed
and is omitted.

Layout is NTHWC (channels-last, TPU lane dimension) like the rest of the
model zoo; torch checkpoints are converted on load (`load_c3d_torch`).

Pretrained Sports-1M weights (the widely mirrored ``c3d.pickle`` /
``c3d-pretrained.pth`` torch state dicts) cannot be downloaded in this
offline environment; pass a local copy via ``weights_path`` /
``$C3D_WEIGHTS``.  Without weights the SVFID caller falls back to a
fixed-seed *random* C3D — random-feature FID still orders models sensibly
(it is a whitened feature-space distance) and is deterministic here, but
numbers are NOT comparable to published SVFID values; the fallback is
loudly logged.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["C3D", "C3D_LAYERS", "preprocess", "load_c3d_torch"]

# conv name -> (features, index of the pool that runs BEFORE this conv).
# Standard C3D-Sports1M topology: all convs 3x3x3 / stride 1 / pad 1 / ReLU;
# pool1 = (1,2,2), pool2..pool4 = (2,2,2), all stride == window, no padding.
C3D_LAYERS: Tuple[Tuple[str, int], ...] = (
    ("conv1", 64),
    ("conv2", 128),
    ("conv3a", 256),
    ("conv3b", 256),
    ("conv4a", 512),
    ("conv4b", 512),
    ("conv5a", 512),
    ("conv5b", 512),
)

# maxpool window preceding each conv group (None = no pool)
_PRE_POOL = {
    "conv1": None,
    "conv2": (1, 2, 2),
    "conv3a": (2, 2, 2),
    "conv4a": (2, 2, 2),
    "conv5a": (2, 2, 2),
}

# Sports-1M channel means in BGR order (the scalar reduction of the
# original mean cube used by the common torch ports of c3d.pickle).
_C3D_MEAN_BGR = (90.0, 98.0, 102.0)


def preprocess(video_pm1: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] RGB NTHWC -> C3D input (0..255 BGR, mean-subtracted)."""
    x = (video_pm1 + 1.0) * 127.5
    x = x[..., ::-1]  # RGB -> BGR
    return x - jnp.asarray(_C3D_MEAN_BGR, x.dtype)


class C3D(nn.Module):
    """C3D conv stack; ``__call__`` returns the post-ReLU feature map of
    ``feature_layer`` (one of the names in ``C3D_LAYERS``).

    Only the layers up to and including the tap are materialized, so
    parameter trees stay small for early taps.
    """

    feature_layer: str = "conv3b"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        names = [name for name, _ in C3D_LAYERS]
        if self.feature_layer not in names:
            raise ValueError(f"unknown C3D layer {self.feature_layer!r}; "
                             f"choose from {names}")
        for name, features in C3D_LAYERS:
            window = _PRE_POOL.get(name)
            if window is not None:
                x = nn.max_pool(x, window_shape=window, strides=window,
                                padding="VALID")
            x = nn.Conv(features, kernel_size=(3, 3, 3), strides=(1, 1, 1),
                        padding=[(1, 1)] * 3, name=name)(x)
            x = nn.relu(x)
            if name == self.feature_layer:
                return x
        raise AssertionError  # unreachable


def _file_sha256(path: str) -> str:
    import hashlib
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def load_c3d_torch(weights_path: str, feature_layer: str) -> Dict[str, Any]:
    """Convert a torch C3D state dict into this module's param tree.

    Expected checkpoint (document for future ingestion — none is available
    on this offline machine):

    * Source: a Sports-1M-pretrained C3D torch port — the widely mirrored
      ``c3d-pretrained.pth`` (plain state dict) or the legacy
      ``c3d.pickle`` (a pickled full ``nn.Module``; needs the unsafe load
      path below).
    * Layer map: keys ``conv1.weight/bias`` .. ``conv5b.weight/bias``
      (optionally ``module.``-prefixed); torch conv weights are
      (O, I, kT, kH, kW) and the expected shapes follow ``C3D_LAYERS``
      (e.g. conv1 = (64, 3, 3, 3, 3), conv3b = (256, 256, 3, 3, 3)).
      fc6/fc7/fc8 keys are ignored.
    * Integrity: the file's sha256 is logged on every load; pin it by
      setting ``$C3D_WEIGHTS_SHA256`` — a mismatch aborts.  (No digest is
      hard-coded here: the common mirrors differ and inventing one would
      be worse than verifying shape structure, which IS enforced.)

    Only layers up to ``feature_layer`` are converted; every converted
    tensor is shape-verified against the C3D topology.
    """
    import logging
    import os

    import torch

    digest = _file_sha256(weights_path)
    expected = os.environ.get("C3D_WEIGHTS_SHA256", "")
    if expected and digest != expected.lower():
        raise ValueError(f"C3D checkpoint sha256 mismatch: {weights_path} "
                         f"has {digest}, $C3D_WEIGHTS_SHA256 pins "
                         f"{expected}")
    logging.info(f"C3D weights {weights_path}: sha256 {digest}")

    # safe load first (ADVICE r1): weights_only=True executes no pickled
    # code; fall back to the unsafe path ONLY for the legacy full-module
    # c3d.pickle mirrors, with a warning
    try:
        state = torch.load(weights_path, map_location="cpu",
                           weights_only=True)
    except TypeError:  # torch < 1.13 has no weights_only kwarg
        state = torch.load(weights_path, map_location="cpu")
    except Exception:
        logging.warning(
            f"C3D checkpoint {weights_path} is not a plain state dict — "
            f"falling back to weights_only=False (executes pickled code; "
            f"only do this for files you trust)")
        state = torch.load(weights_path, map_location="cpu",
                           weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k[len("module."):] if k.startswith("module.") else k: v
             for k, v in state.items()}

    params: Dict[str, Any] = {}
    in_ch = 3
    for name, features in C3D_LAYERS:
        wkey = f"{name}.weight"
        if wkey not in state:
            raise KeyError(f"C3D checkpoint missing {wkey!r} "
                           f"(found keys like {sorted(state)[:4]})")
        w = np.asarray(state[wkey], np.float32)
        b = np.asarray(state[f"{name}.bias"], np.float32)
        want_w = (features, in_ch, 3, 3, 3)
        if w.shape != want_w or b.shape != (features,):
            raise ValueError(
                f"C3D checkpoint {name} has shape {w.shape}/{b.shape}, "
                f"expected {want_w}/({features},) — not a Sports-1M C3D "
                f"state dict")
        params[name] = {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                        "bias": jnp.asarray(b)}
        in_ch = features
        if name == feature_layer:
            break
    return {"params": params}


def random_c3d_params(feature_layer: str, seed: int = 0) -> Dict[str, Any]:
    """Deterministic random-weight C3D (the no-pretrained-weights fallback)."""
    model = C3D(feature_layer=feature_layer)
    dummy = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)
