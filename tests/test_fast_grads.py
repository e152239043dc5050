"""--fast-grads equivalence: trainable-subtree gradients must match the
full-backward gradients exactly (the only permitted difference is the clip
norm's coverage of frozen-stage gradients)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.core.pyramid import Pyramid
from hpvaegan_tpu.losses import mse
from hpvaegan_tpu.models.registry import make_generator
from hpvaegan_tpu.train.optim import (gparams_view, hpvaegan_group_plan,
                                      merge_gparams, scatter_grads,
                                      trainable_merge, trainable_split)


def test_trainable_split_merge_roundtrip(key):
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=1)
    cfg.adjust_scales()
    cfg.ar = 1.0
    pyr = Pyramid.for_image(16, 1.0, 8, 16, 0.75)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 2)
    gvars = G.init(key, 1)
    for i in range(3):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(key, i))
    pview = gparams_view(gvars)
    ml, bl, _ = hpvaegan_group_plan(cfg, 3, 3)
    tr, fz = trainable_split(pview, ml, bl)
    merged = trainable_merge(pview, tr, fz)
    a = jax.tree_util.tree_leaves(pview)
    b = jax.tree_util.tree_leaves(merged)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fast_grads_match_full_grads(key):
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=1)
    cfg.adjust_scales()
    cfg.ar = 1.0
    pyr = Pyramid.for_image(16, 1.0, 8, 16, 0.75)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 2)
    gvars = G.init(key, 1)
    for i in range(3):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(key, i))
    scale = 3
    real = jax.random.normal(jax.random.fold_in(key, 9),
                             (2, *pyr.shape2d(scale), 3))
    rz = jax.random.normal(jax.random.fold_in(key, 10),
                           (2, *pyr.shape2d(0), 3))
    amps = jnp.ones(scale + 1)
    pview = gparams_view(gvars)
    ml, bl, _ = hpvaegan_group_plan(cfg, scale, 3)

    def loss_of_pview(pv):
        gv = merge_gparams(gvars, pv)
        (out, _, _), _ = G.apply(gv, amps, jax.random.PRNGKey(3),
                                 real_zero=rz, mode="rec", train=True)
        return mse(out, real)

    full_grads = jax.grad(loss_of_pview)(pview)

    tr, fz = trainable_split(pview, ml, bl)
    tgrads = jax.grad(
        lambda t: loss_of_pview(trainable_merge(pview, t, fz)))(tr)
    fast_grads = scatter_grads(pview, tgrads)

    # trainable leaves identical; frozen leaves zero in the fast tree
    for i, lab in enumerate(bl):
        for (fa, fb) in zip(
                jax.tree_util.tree_leaves(full_grads["body"][i]),
                jax.tree_util.tree_leaves(fast_grads["body"][i])):
            if lab == "frozen":
                assert np.all(np.asarray(fb) == 0)
            else:
                np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                           rtol=1e-6, atol=1e-7)
