#!/usr/bin/env python
"""Progressive multi-scale 2D HP-VAE-GAN training on a single image (or a
directory of images).  Flag-compatible TPU-native rebuild of the reference
entry point (train_image.py:275-445): outer loop grows the generator one
scale at a time; inner loop runs the VAE phase below --vae-levels and the
WGAN-GP phase above it.
"""
import logging
import os
import random
import sys

import jax

if "--no-cuda" in sys.argv:  # --no-cuda == run on the CPU backend
    jax.config.update("jax_platforms", "cpu")

from hpvaegan_tpu.core.config import build_parser, config_from_args
from hpvaegan_tpu.data import MultipleImageDataset, SingleImageDataset
from hpvaegan_tpu.models.registry import make_generator
from hpvaegan_tpu.train.trainer import train_scale
from hpvaegan_tpu.utils import (ImageSaver, LoggingBlock, TensorboardSummary,
                                configure_logging)
from hpvaegan_tpu.utils.saver import apply_resume


def main() -> None:
    parser = build_parser("image")
    cfg = config_from_args(parser.parse_args())

    from hpvaegan_tpu.parallel import maybe_initialize, multihost
    maybe_initialize(cfg.distributed)

    assert cfg.vae_levels > 0
    assert cfg.disc_loss_weight > 0

    # reference clamp (train_image.py:339-340): images repeat to >= batch
    if cfg.data_rep < cfg.batch_size:
        cfg.data_rep = cfg.batch_size

    # multi-host: one agreed seed, one experiment dir, process-0-only writes
    if cfg.manualSeed is None:
        cfg.manualSeed = random.randint(1, 10000)
    cfg.manualSeed = multihost.agree(cfg.manualSeed)
    primary = multihost.is_primary()

    saver = ImageSaver(cfg)

    # Optional neptune.ai routing when the client is importable and --tag is
    # given (reference train_image.py:31-36, 346-348).  The reference
    # hardcodes a third-party project name; we read NEPTUNE_PROJECT instead
    # (documented deviation, PARITY.md).
    neptune_exp = None
    if primary and cfg.tag and os.environ.get("NEPTUNE_PROJECT"):
        try:
            import neptune
            neptune.init(project_qualified_name=os.environ["NEPTUNE_PROJECT"])
            neptune_exp = neptune.create_experiment(
                name=cfg.checkname, params=vars(cfg), tags=[cfg.tag]
            ).__enter__()
        except Exception as e:  # unavailable client/network: fall back to TB
            logging.warning(f"neptune disabled: {e}")
            neptune_exp = None
    summary = (TensorboardSummary(saver.experiment_dir,
                                  neptune_exp=neptune_exp)
               if primary else None)
    configure_logging(os.path.join(saver.experiment_dir, "logbook.txt")
                      if primary else None)

    cfg.adjust_scales()

    logging.info(f"Random Seed: {cfg.manualSeed}")
    root_key = jax.random.PRNGKey(cfg.manualSeed)

    cfg.scale_idx = 0
    cfg.Noise_Amps = []

    if os.path.isdir(cfg.image_path):
        dataset = MultipleImageDataset(cfg)
    else:
        dataset = SingleImageDataset(cfg)
    pyramid = dataset.pyramid

    # resolved-config snapshot: generate.py / resume rebuild the module tree
    # from this instead of hand-re-specified flags
    saver.save_json(cfg.snapshot_dict(), "config.json")

    with LoggingBlock("Commandline Arguments", emph=True):
        for arg, value in sorted(vars(cfg).items()):
            if type(value) in (str, int, float, tuple, list):
                logging.info(f"{arg}: {value}")

    with LoggingBlock("Experiment Summary", emph=True):
        logging.info(f"Experiment dir: {saver.experiment_dir}")
        logging.info(f"Generator  : {cfg.generator}")
        logging.info(f"Iterations : {cfg.niter}")
        logging.info(f"Device     : {jax.devices()[0].platform}")

    G = make_generator(cfg.generator, cfg, pyramid, ndim=2)
    gvars = G.init(jax.random.fold_in(root_key, 7), batch_size=1)

    if cfg.netG != "":
        gvars = apply_resume(cfg, G, gvars, root_key)
    else:
        cfg.resumed_idx = -1

    while cfg.scale_idx < cfg.stop_scale + 1:
        if cfg.scale_idx > 0 and cfg.resumed_idx != cfg.scale_idx:
            gvars = G.init_next_stage(
                gvars, jax.random.fold_in(root_key, 100 + cfg.scale_idx))
        gvars = train_scale(cfg, G, gvars, dataset, saver, summary, root_key,
                            ndim=2)
        cfg.scale_idx += 1

    if summary is not None:
        summary.close()
    # cleanly finalize the neptune experiment (ADVICE r1: the reference
    # relies on the legacy client's atexit flush and never stops it)
    if neptune_exp is not None:
        try:
            neptune_exp.stop()
        except Exception as e:
            logging.warning(f"neptune experiment stop failed: {e}")


if __name__ == "__main__":
    main()
