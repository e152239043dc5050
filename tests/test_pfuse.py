"""Fused conv-pair Pallas kernel (ops/pallas/conv3d_fuse.py) correctness
on CPU (pallas interpreter): forward, the emitted intermediate, first-order
gradients, and edge masking against the unfused lax chain."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvaegan_tpu.ops.pallas.conv3d_fuse as cf
import hpvaegan_tpu.ops.pallas.conv3d_pack as cp

SHAPE = (1, 4, 16, 12, 64)


@pytest.fixture(autouse=True)
def _interpret():
    old = (cf.INTERPRET, cf.FORCE, cp.INTERPRET, cp.FORCE)
    cf.INTERPRET = cf.FORCE = True
    cp.INTERPRET = cp.FORCE = True  # the VJP uses the packed dx kernel
    yield
    cf.INTERPRET, cf.FORCE, cp.INTERPRET, cp.FORCE = old


def _inputs(dtype=jnp.float32, shape=SHAPE, seed=3):
    key = jax.random.PRNGKey(seed)
    x = (jax.random.normal(key, shape) * 0.5).astype(dtype)
    w1 = jax.random.normal(jax.random.fold_in(key, 1),
                           (3, 3, 3, 64, 64)) * 0.05
    b1 = jax.random.normal(jax.random.fold_in(key, 2), (64,)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(key, 4),
                           (3, 3, 3, 64, 64)) * 0.05
    b2 = jax.random.normal(jax.random.fold_in(key, 5), (64,)) * 0.1
    return x, w1, b1, w2, b2


def _conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=dn) + b.astype(x.dtype)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _ref_pair(x, w1, b1, w2, b2):
    z = _lrelu(_conv(x, w1, b1))
    return _lrelu(_conv(z.astype(x.dtype), w2, b2)), z


def test_pfuse_ok_gate():
    assert cf.pfuse_ok(SHAPE, (3, 3, 3, 64, 64))
    assert not cf.pfuse_ok((1, 2, 16, 12, 64), (3, 3, 3, 64, 64))  # T < 3
    assert not cf.pfuse_ok((1, 4, 16, 13, 64), (3, 3, 3, 64, 64))  # odd W
    assert not cf.pfuse_ok((1, 4, 16, 12, 32), (3, 3, 3, 32, 32))  # C != 64
    assert not cf.pfuse_ok(SHAPE, (3, 3, 3, 64, 128))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4),
                                       (jnp.bfloat16, 6e-2)])
def test_forward_matches_unfused(dtype, tol):
    x, w1, b1, w2, b2 = _inputs(dtype)
    ref, _ = _ref_pair(x, w1, b1, w2, b2)
    got = cf.conv3d64_pair_pallas(x, w1.astype(dtype), b1,
                                  w2.astype(dtype), b2)
    scale = max(float(jnp.max(jnp.abs(ref.astype(jnp.float32)))), 1.0)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < tol * scale, err


def test_with_mid_emits_the_intermediate():
    x, w1, b1, w2, b2 = _inputs()
    ref_y, ref_z = _ref_pair(x, w1, b1, w2, b2)
    y, z = cf.conv3d64_pair_pallas(x, w1, b1, w2, b2, with_mid=True)
    assert float(jnp.max(jnp.abs(y - ref_y))) < 1e-4
    assert float(jnp.max(jnp.abs(z - ref_z))) < 1e-4


@pytest.mark.parametrize("shape", [
    (1, 3, 11, 8, 64),    # ragged H vs the block, minimal T
    (2, 5, 8, 10, 64),    # batch > 1, small H
    (1, 6, 19, 12, 64),   # ragged H, longer T (cache rotation exercised)
])
def test_edge_shapes_match(shape):
    x, w1, b1, w2, b2 = _inputs(shape=shape, seed=9)
    if not cf.pfuse_ok(x.shape, w1.shape):
        pytest.skip("below kernel minimum")
    ref, _ = _ref_pair(x, w1, b1, w2, b2)
    got = cf.conv3d64_pair_pallas(x, w1, b1, w2, b2)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_first_order_grads_match_unfused():
    x, w1, b1, w2, b2 = _inputs()

    def ref_fn(x, w1, b1, w2, b2):
        return _ref_pair(x, w1, b1, w2, b2)[0]

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    gr = jax.grad(loss(ref_fn), (0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gp = jax.grad(loss(cf.conv3d64_pair), (0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for name, a, p in zip(("dx", "dw1", "db1", "dw2", "db2"), gr, gp):
        err = float(jnp.max(jnp.abs(a - p)))
        assert err < 2e-3 * max(float(jnp.max(jnp.abs(a))), 1.0), (name, err)


def test_critic_body_pair_routing():
    """WDiscriminator with --pfuse: identical variable tree, same output
    and same parameter grads as the unfused SNConv chain."""
    from hpvaegan_tpu.models.networks import WDiscriminator

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 4, 16, 12, 3))
    base = WDiscriminator(nfc=64, ker_size=3, num_layer=3, ndim=3)
    fused = WDiscriminator(nfc=64, ker_size=3, num_layer=3, ndim=3,
                           pfuse=True)
    v = base.init(jax.random.fold_in(key, 1), x)
    vf = fused.init(jax.random.fold_in(key, 1), x)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(vf)

    def loss(mod, params):
        return jnp.sum(jnp.abs(mod.apply({**v, "params": params}, x)))

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(fused, p))(v["params"])
    assert abs(float(l0 - l1)) < 1e-3 * max(abs(float(l0)), 1.0)
    errs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    mx = max(jax.tree_util.tree_leaves(errs))
    assert mx < 5e-3, (mx, errs)


def test_odd_num_layer_leaves_a_single_block():
    """num_layer=3 -> blocks (0,1) fused + block2 single: the routing must
    compose the pair kernel with the single-conv path without changing
    the score map."""
    from hpvaegan_tpu.models.networks import WDiscriminator

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 3, 8, 8, 3))
    base = WDiscriminator(nfc=64, ker_size=3, num_layer=1, ndim=3)
    fused = WDiscriminator(nfc=64, ker_size=3, num_layer=1, ndim=3,
                           pfuse=True)  # nothing to pair: falls back
    v = base.init(jax.random.fold_in(key, 1), x)
    y0 = base.apply(v, x)
    y1 = fused.apply(v, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
