"""String-dispatched model zoo, mirroring the reference's
``getattr(networks_3d, opt.generator)`` pattern (train_video.py:396-397,
train_image.py:418-419) but with an explicit registry."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..core.pyramid import Pyramid
from .generators import (GeneratorCSG, GeneratorHPVAEGAN, GeneratorSG,
                         GeneratorVAE_nb)
from .networks import WDiscriminator, WDiscriminatorBaselines

__all__ = ["make_generator", "make_discriminator", "GENERATORS",
           "DISCRIMINATORS"]

GENERATORS = {
    "GeneratorHPVAEGAN": GeneratorHPVAEGAN,
    "GeneratorVAE_nb": GeneratorVAE_nb,
    "GeneratorCSG": GeneratorCSG,
    "GeneratorSG": GeneratorSG,
}

DISCRIMINATORS = {"WDiscriminator2D", "WDiscriminator3D",
                  "WDiscriminatorBaselines"}


def make_generator(name: str, cfg, pyramid: Pyramid, ndim: int):
    if name not in GENERATORS:
        raise ValueError(f"unknown generator: {name!r} "
                         f"(have {sorted(GENERATORS)})")
    return GENERATORS[name](cfg, pyramid, ndim)


def make_discriminator(name: str, cfg, ndim: int):
    dtype = jnp.bfloat16 if getattr(cfg, "bf16", False) else None
    if name in ("WDiscriminator2D", "WDiscriminator3D"):
        expected = 2 if name.endswith("2D") else 3
        if expected != ndim:
            raise ValueError(f"{name} is {expected}D but trainer is {ndim}D")
        return WDiscriminator(nfc=cfg.nfc, ker_size=cfg.ker_size,
                              num_layer=cfg.num_layer, ndim=ndim, dtype=dtype,
                              pconv=(getattr(cfg, "pconv", False)
                                     or getattr(cfg, "pconv_all", False)),
                              pfuse=getattr(cfg, "pfuse", False))
    if name == "WDiscriminatorBaselines":
        return WDiscriminatorBaselines(nfc=cfg.nfc, nc_im=cfg.nc_im,
                                       ker_size=cfg.ker_size,
                                       padd_size=cfg.padd_size,
                                       num_layer=cfg.num_layer, ndim=ndim,
                                       dtype=dtype)
    raise ValueError(f"unknown discriminator: {name!r}")
