"""Resize parity: our matmul-based align_corners=True resize vs torch
F.interpolate (the reference's resize kernel, utils/images.py:9-26)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hpvaegan_tpu.ops.resize import (interp_matrix, interpolate_2d,
                                     interpolate_3d, resize_axis)


@pytest.mark.parametrize("in_size,out_size", [(8, 16), (16, 8), (5, 13),
                                              (33, 41), (7, 7), (4, 1)])
def test_axis_resize_matches_torch_1d(rng, in_size, out_size):
    x = rng.standard_normal((2, 3, in_size)).astype(np.float32)
    ours = np.asarray(resize_axis(jnp.asarray(x), out_size, axis=2))
    theirs = F.interpolate(torch.from_numpy(x), size=out_size, mode="linear",
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw_in,hw_out", [((8, 8), (10, 12)),
                                          ((33, 33), (41, 41)),
                                          ((12, 9), (7, 5))])
def test_bilinear_matches_torch(rng, hw_in, hw_out):
    x = rng.standard_normal((2, *hw_in, 3)).astype(np.float32)
    ours = np.asarray(interpolate_2d(jnp.asarray(x), hw_out))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    theirs = F.interpolate(xt, size=hw_out, mode="bilinear",
                           align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("thw_in,thw_out", [((4, 8, 8), (5, 10, 10)),
                                            ((5, 12, 12), (7, 14, 14)),
                                            ((7, 9, 9), (4, 6, 6))])
def test_trilinear_matches_torch(rng, thw_in, thw_out):
    x = rng.standard_normal((2, *thw_in, 3)).astype(np.float32)
    ours = np.asarray(interpolate_3d(jnp.asarray(x), thw_out))
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    theirs = F.interpolate(xt, size=thw_out, mode="trilinear",
                           align_corners=True).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_5d_per_frame_bilinear_matches_reference_interpolate(rng):
    """The reference's `interpolate` flattens 5D to per-frame bilinear
    (utils/images.py:9-19)."""
    x = rng.standard_normal((2, 4, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(interpolate_2d(jnp.asarray(x), (10, 12)))
    xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3).reshape(8, 3, 8, 8))
    theirs = F.interpolate(xt, size=(10, 12), mode="bilinear",
                           align_corners=True).numpy()
    theirs = theirs.reshape(2, 4, 3, 10, 12).transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_interp_matrix_rows_sum_to_one():
    for a, b in [(8, 16), (16, 8), (1, 1), (9, 1), (1, 7)]:
        m = np.asarray(interp_matrix(a, b))
        np.testing.assert_allclose(m.sum(axis=1), np.ones(b), rtol=1e-6)
