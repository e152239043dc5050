"""Pallas fused conv3d+bias+lrelu kernel: correctness (interpret mode) and
custom-VJP gradients vs the pure-XLA oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.ops.pallas.conv3d import (_xla_reference, conv3d_lrelu,
                                            conv3d_lrelu_pallas, fits_vmem)


@pytest.fixture
def toy(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 8, 16)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    return x, w, b


def test_forward_matches_xla(toy):
    x, w, b = toy
    ours = conv3d_lrelu_pallas(x, w, b, interpret=True)
    ref = _xla_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_temporal_edges_zero_padded(rng):
    """SAME padding in T: first/last frames must see zero taps, not clamped
    duplicates."""
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 4)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 4, 4)).astype(np.float32) * 0.1)
    b = jnp.zeros(4)
    ours = conv3d_lrelu_pallas(x, w, b, interpret=True)
    ref = _xla_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(ours[:, 0]), np.asarray(ref[:, 0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours[:, -1]),
                               np.asarray(ref[:, -1]), rtol=1e-4, atol=1e-5)


def test_single_frame_input(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 5, 5, 4)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 4, 4)).astype(np.float32) * 0.1)
    b = jnp.zeros(4)
    ours = conv3d_lrelu_pallas(x, w, b, interpret=True)
    ref = _xla_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_custom_vjp_matches_xla_grads(toy, monkeypatch):
    x, w, b = toy
    # route the custom-vjp primal through interpret mode on CPU
    import hpvaegan_tpu.ops.pallas.conv3d as mod
    orig = mod.conv3d_lrelu_pallas
    monkeypatch.setattr(mod, "conv3d_lrelu_pallas",
                        lambda *a, **k: orig(*a, interpret=True, **k))

    def loss_ours(x, w, b):
        return jnp.sum(jnp.tanh(mod.conv3d_lrelu(x, w, b)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.tanh(_xla_reference(x, w, b)))

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-3,
                                   atol=1e-4)


def test_fits_vmem_bounds():
    # H-tiling makes every pyramid scale of the default workload fit
    assert fits_vmem(5, 102, 102, 64, 64)
    assert fits_vmem(13, 256, 256, 64, 64)
    from hpvaegan_tpu.ops.pallas.conv3d import pick_h_block
    assert pick_h_block(256, 256, 64, 64) in (4, 8, 16, 32)
    assert pick_h_block(8, 8, 8, 16) == 8


def test_h_tiled_ragged(rng, monkeypatch):
    """Force a small H block so tiling + ragged last block + halos are
    exercised (H=10 with HB=4 -> blocks 4,4,2)."""
    import hpvaegan_tpu.ops.pallas.conv3d as mod
    monkeypatch.setattr(mod, "pick_h_block", lambda *a: 4)
    x = jnp.asarray(rng.standard_normal((1, 3, 10, 6, 8)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    ours = mod.conv3d_lrelu_pallas(x, w, b, interpret=True)
    ref = _xla_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
