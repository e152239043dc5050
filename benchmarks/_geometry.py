"""Shared benchmark geometry: pyramid + noise shapes for NDIM in {2, 3}.

Single source for the per-scale and generation benchmarks so both always
measure the same workload (mirrors the trainer's Z_init geometry,
trainer.py: Z_init uses scale-0 td/h/w with latent_dim channels).
"""
from hpvaegan_tpu.core.pyramid import Pyramid

SAMPLING_RATES = (4, 3, 2, 1)
ORG_FPS = 30.0


def make_pyramid(cfg, ndim: int) -> Pyramid:
    if ndim == 3:
        return Pyramid.for_video(cfg.img_size, 1.0, cfg.min_size,
                                 cfg.max_size, cfg.scale_factor_init,
                                 SAMPLING_RATES, ORG_FPS)
    return Pyramid.for_image(cfg.img_size, 1.0, cfg.min_size, cfg.max_size,
                             cfg.scale_factor_init)


def noise_init_shape(pyr, batch: int, latent_dim: int, ndim: int):
    """Z_init geometry: scale-0 spatial (and temporal) dims, latent chans."""
    if ndim == 3:
        return (batch, pyr.td(0), *pyr.shape2d(0), latent_dim)
    return (batch, *pyr.shape2d(0), latent_dim)


def shape_at(pyr, scale: int, ndim: int):
    return pyr.shape3d(scale) if ndim == 3 else pyr.shape2d(scale)
