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
