"""Packed Pallas conv (ops/pallas/conv3d_pack.py) correctness on CPU.

Runs the kernel through the pallas interpreter (no TPU in CI) and checks
forward, first-order gradients, and the WGAN-GP-style second-order path
against XLA's lax.conv at matching dtypes.
"""
import jax
import jax.numpy as jnp
import pytest

import hpvaegan_tpu.ops.pallas.conv3d_pack as cp

SHAPE = (1, 4, 16, 12, 64)


@pytest.fixture(autouse=True)
def _interpret():
    old, oldf = cp.INTERPRET, cp.FORCE
    cp.INTERPRET = True
    cp.FORCE = True  # tiny CPU shapes: bypass the W%256 profitability gate
    yield
    cp.INTERPRET, cp.FORCE = old, oldf


def _inputs(dtype=jnp.float32):
    key = jax.random.PRNGKey(3)
    x = (jax.random.normal(key, SHAPE) * 0.5).astype(dtype)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 64, 64)) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 2), (64,)) * 0.1
    return x, w, b


def _xla(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=dn) + b.astype(x.dtype)


def test_pconv_ok_gate():
    assert cp.pconv_ok(SHAPE, (3, 3, 3, 64, 64))
    assert not cp.pconv_ok((1, 2, 16, 12, 64), (3, 3, 3, 64, 64))  # T < 3
    assert not cp.pconv_ok((1, 4, 16, 13, 64), (3, 3, 3, 64, 64))  # odd W
    assert not cp.pconv_ok((1, 4, 16, 12, 32), (3, 3, 3, 32, 32))  # C != 64
    assert not cp.pconv_ok(SHAPE, (3, 3, 3, 64, 128))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4),
                                       (jnp.bfloat16, 5e-2)])
def test_forward_matches_xla(dtype, tol):
    x, w, b = _inputs(dtype)
    ref = _xla(x, w, b).astype(jnp.float32)
    got = cp.conv3d64_pallas(x, w.astype(dtype), b.astype(dtype)).astype(
        jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < tol * max(scale, 1.0)


def test_fused_lrelu_forward():
    x, w, b = _inputs()
    pre = _xla(x, w, b)
    ref = jnp.where(pre >= 0, pre, 0.2 * pre)
    got = cp.conv3d64_pallas(x, w, b, neg_slope=0.2)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_first_order_grads_match_xla():
    x, w, b = _inputs()

    def loss(fn):
        return lambda x, w, b: jnp.sum(jnp.sin(fn(x, w, b)))

    gr = jax.grad(loss(_xla), (0, 1, 2))(x, w, b)
    gp = jax.grad(loss(cp.conv3d64), (0, 1, 2))(x, w, b)
    for name, a, p in zip(("dx", "dw", "db"), gr, gp):
        err = float(jnp.max(jnp.abs(a - p)))
        assert err < 2e-3 * max(float(jnp.max(jnp.abs(a))), 1.0), (name, err)


def test_second_order_gp_style():
    """Reverse-over-reverse: d/dw of || d/dx sum(conv) ||-style penalty —
    the WGAN-GP composition (losses/__init__.py:46-78)."""
    x, w, b = _inputs()

    def gp(fn):
        def penalty(w):
            g = jax.grad(lambda xx: jnp.sum(jnp.tanh(fn(xx, w, b))))(x)
            n = jnp.sqrt(jnp.sum(g * g) + 1e-12)
            return (n - 1.0) ** 2
        return penalty

    ref = jax.grad(gp(_xla))(w)
    got = jax.grad(gp(cp.conv3d64))(w)
    err = float(jnp.max(jnp.abs(ref - got)))
    assert err < 2e-3 * max(float(jnp.max(jnp.abs(ref))), 1.0), err


def test_ragged_h_and_small_w():
    """H not a multiple of the block, W/2 groups — edge masking exact."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 3, 11, 8, 64))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 64, 64)) * 0.1
    b = jnp.zeros((64,))
    if not cp.pconv_ok(x.shape, w.shape):
        pytest.skip("shape below kernel minimum")
    ref = _xla(x, w, b)
    got = cp.conv3d64_pallas(x, w, b)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_pconv_ok_respects_compute_dtype():
    """The VMEM-fit gate must use the COMPUTE dtype's element size: at
    W=512 the f32 windows exceed the budget (no feasible H block — the
    old bf16-hardcoded gate passed the shape and the block picker then
    divided by zero) while bf16 still fits."""
    shape, w = (1, 3, 16, 512, 64), (3, 3, 3, 64, 64)
    assert cp.pconv_ok(shape, w, dtype=jnp.bfloat16)
    assert not cp.pconv_ok(shape, w)                      # f32 default
    assert not cp.pconv_ok(shape, w, dtype=jnp.float32)


def test_profitability_gate():
    """The model routing only uses the kernel at measured-win shapes
    (W % 256 == 0, BENCHMARKS.md r2 scale-7/8 anti-result); FORCE (set by
    the autouse fixture) bypasses it for tiny CPU test shapes."""
    cp.FORCE = False
    assert cp.pconv_wins((2, 13, 256, 256, 64))      # scale 9: wg = 128
    assert not cp.pconv_wins((2, 7, 162, 162, 64))   # scale 7: wg = 81
    assert not cp.pconv_wins((2, 7, 204, 204, 64))   # scale 8: wg = 102
    cp.FORCE = True
    assert cp.pconv_wins((2, 7, 162, 162, 64))


def test_spmd_keeps_pconv():
    """--spmd + --pconv now compose via the shard_map halo wrapper
    (ops/pallas/conv3d_spmd.py, tests/test_pconv_spmd.py) — adjust_scales
    must no longer drop pconv under a mesh."""
    from hpvaegan_tpu.core.config import Config

    cfg = Config(spmd=True, mesh_shape="2x4", pconv=True, pconv_all=True)
    cfg.adjust_scales()
    assert cfg.pconv and cfg.pconv_all

    cfg = Config(pconv=True)
    cfg.adjust_scales()
    assert cfg.pconv  # untouched without --spmd


def test_stage_module_pconv_parity():
    """A full Stage (head 3->64 on lax, body 64->64 on the kernel, tail
    64->3 on lax) produces the same outputs and parameter grads with
    --pconv on and off; variable trees are interchangeable."""
    from hpvaegan_tpu.models.networks import Stage

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 4, 16, 12, 3))
    base = Stage(nfc=64, nc_im=3, ker_size=3, padd_size=1, num_layer=2,
                 ndim=3)
    fast = Stage(nfc=64, nc_im=3, ker_size=3, padd_size=1, num_layer=2,
                 ndim=3, pconv=True)
    v = base.init(jax.random.fold_in(key, 1), x, True)
    # same tree structure — checkpoints interchangeable
    vp = fast.init(jax.random.fold_in(key, 1), x, True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)

    def loss(mod, params):
        y, _ = mod.apply({**v, "params": params}, x, True,
                         mutable=["batch_stats"])
        return jnp.sum(jnp.abs(y))

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(fast, p))(v["params"])
    assert abs(float(l0 - l1)) < 1e-3 * max(abs(float(l0)), 1.0)
    errs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    mx = max(jax.tree_util.tree_leaves(errs))
    assert mx < 5e-3, (mx, errs)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-3),
                                       (jnp.bfloat16, 5e-2)])
def test_dw_kernel_matches_xla(dtype, tol):
    """Packed-lane weight gradient (conv3d64_dw_pallas) vs XLA's
    correlation, incl. the build_w2-adjoint unpack."""
    x, w, b = _inputs(dtype)
    dy = (jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.3).astype(
        dtype)

    def conv_w(wk):
        dn = jax.lax.conv_dimension_numbers(x.shape, wk.shape,
                                            ("NTHWC", "THWIO", "NTHWC"))
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), wk, (1, 1, 1), "SAME",
            dimension_numbers=dn)

    _, vjp = jax.vjp(conv_w, w.astype(jnp.float32))
    (ref,) = vjp(dy.astype(jnp.float32))
    got = cp.conv3d64_dw_pallas(x, dy)
    scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < tol * scale, err


def test_dw_kernel_ragged_h():
    """H not a multiple of the block: out-of-range dy rows must not
    contribute to the accumulated dW."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 11, 8, 64))
    dy = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
    if not cp.pconv_ok(x.shape, (3, 3, 3, 64, 64)):
        pytest.skip("shape below kernel minimum")

    def conv_w(wk):
        dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, 3, 64, 64),
                                            ("NTHWC", "THWIO", "NTHWC"))
        return jax.lax.conv_general_dilated(
            x, wk, (1, 1, 1), "SAME", dimension_numbers=dn)

    _, vjp = jax.vjp(conv_w, jnp.zeros((3, 3, 3, 64, 64)))
    (ref,) = vjp(dy)
    got = cp.conv3d64_dw_pallas(x, dy)
    scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-3 * scale


def test_dw_pallas_switch_in_bwd(monkeypatch):
    """Both dw routes of conv3d64's backward (XLA correlation vs the
    packed kernel — the r3 default) must agree through the custom_vjp."""
    x, w, b = _inputs()

    def loss(x, w, b):
        return jnp.sum(jnp.sin(cp.conv3d64(x, w, b)))

    monkeypatch.setattr(cp, "DW_PALLAS", False)
    ref = jax.grad(loss, 1)(x, w, b)
    monkeypatch.setattr(cp, "DW_PALLAS", True)
    got = jax.grad(loss, 1)(x, w, b)
    scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-3 * scale
