"""Pyramid geometry golden tests — values verified against the reference
formulas (SURVEY.md §2.5: default 256/32/0.75 schedule)."""
import math

import pytest

from hpvaegan_tpu.core.pyramid import (Pyramid, adjust_scales,
                                       get_scale_size, get_time_depth)


def test_adjust_scales_defaults():
    adj = adjust_scales(256, 32, 256, 0.75)
    assert adj.num_scales == 9
    assert adj.stop_scale == 9
    assert adj.scale1 == 1.0
    assert math.isclose(adj.scale_factor, (32 / 256) ** (1 / 9))


def test_default_spatial_schedule():
    adj = adjust_scales(256, 32, 256, 0.75)
    sizes = [get_scale_size(i, adj.scale_factor, adj.stop_scale, 256)
             for i in range(adj.stop_scale + 1)]
    assert sizes == [33, 41, 51, 65, 81, 102, 129, 162, 204, 256]


def test_default_time_depth_schedule():
    pyr = Pyramid.for_video(256, 1.0, 32, 256, 0.75, [4, 3, 2, 1], 30.0)
    assert pyr.fps_lcm == 12
    tds = [pyr.td(i) for i in range(pyr.stop_scale + 1)]
    assert tds == [4, 4, 4, 5, 5, 5, 7, 7, 7, 13]


def test_fps_index_truncates():
    # int() truncation, not rounding (utils/images.py:69)
    pyr = Pyramid.for_video(256, 1.0, 32, 256, 0.75, [4, 3, 2, 1], 24.0)
    assert pyr.fps_index(0) == 0
    assert pyr.fps_index(pyr.stop_scale) == 3
    assert pyr.fps(0) == 24.0 / 4


def test_aspect_ratio_height_truncation():
    pyr = Pyramid.for_image(256, 0.5625, 32, 256, 0.75)  # 16:9
    h, w = pyr.shape2d(pyr.stop_scale)
    assert w == 256
    assert h == int(256 * 0.5625)


def test_smaller_than_max_image():
    adj = adjust_scales(128, 32, 256, 0.75)
    assert adj.scale1 == 1.0
    sizes = [get_scale_size(i, adj.scale_factor, adj.stop_scale, 128)
             for i in range(adj.stop_scale + 1)]
    assert sizes[0] in (32, 33)
    assert sizes[-1] == 128


def test_stop_scale_time_decoupled():
    pyr = Pyramid.for_video(256, 1.0, 32, 256, 0.75, [4, 3, 2, 1], 30.0,
                            stop_scale_time=3)
    # temporal schedule saturates early
    assert pyr.fps_index(3) == 3
    assert pyr.td(3) == 13


def test_scaled_pyramid_extrapolation():
    from hpvaegan_tpu.core.pyramid import ScaledPyramid
    base = Pyramid.for_video(256, 0.5625, 32, 256, 0.75, [4, 3, 2, 1], 30.0)
    sp = ScaledPyramid(base, h_factor=2.0, w_factor=1.5, t_factor=2.0)
    t0, h0, w0 = base.shape3d(0)
    t1, h1, w1 = sp.shape3d(0)
    assert (t1, h1, w1) == (round(t0 * 2), round(h0 * 2), round(w0 * 1.5))
    # untouched attributes delegate to the base pyramid
    assert sp.stop_scale == base.stop_scale
    assert sp.fps(3) == base.fps(3)


def test_benchmark_geometry_matches_trainer_z_init():
    """benchmarks/_geometry.noise_init_shape must equal the trainer's
    Z_init geometry (train_video.py:39-42: scale-0 td/h/w, latent chans)
    so the benchmarks measure the real training workload."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from _geometry import make_pyramid, noise_init_shape

    from hpvaegan_tpu.core.config import Config

    cfg = Config(img_size=256, min_size=32, max_size=256, latent_dim=128,
                 batch_size=2)
    cfg.adjust_scales()
    cfg.ar = 1.0

    pyr3 = make_pyramid(cfg, 3)
    h0, w0 = pyr3.shape2d(0)
    # trainer (3D): [batch, td@first-trained-scale, h0, w0, latent] where
    # training from scratch sets cfg.td = pyramid.td(0)
    assert noise_init_shape(pyr3, 2, 128, 3) == (2, pyr3.td(0), h0, w0, 128)

    pyr2 = make_pyramid(cfg, 2)
    h0, w0 = pyr2.shape2d(0)
    assert noise_init_shape(pyr2, 2, 128, 2) == (2, h0, w0, 128)
