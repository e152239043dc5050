#!/usr/bin/env python
"""Progressive multi-scale 3D (spatio-temporal) HP-VAE-GAN training on a
single video.  Flag-compatible TPU-native rebuild of the reference entry
point (train_video.py:261-421): per scale the dataset is re-decoded at that
scale's resolution AND frame rate, then the shared per-scale trainer runs
the VAE or WGAN-GP phase.
"""
import logging
import os
import random
import sys

import jax

if "--no-cuda" in sys.argv:  # --no-cuda == run on the CPU backend
    jax.config.update("jax_platforms", "cpu")

from hpvaegan_tpu.core.config import build_parser, config_from_args
from hpvaegan_tpu.data import SingleVideoDataset
from hpvaegan_tpu.models.registry import make_generator
from hpvaegan_tpu.train.trainer import train_scale
from hpvaegan_tpu.utils import (LoggingBlock, TensorboardSummary, VideoSaver,
                                configure_logging)
from hpvaegan_tpu.utils.saver import apply_resume


def main() -> None:
    parser = build_parser("video")
    cfg = config_from_args(parser.parse_args())

    from hpvaegan_tpu.parallel import maybe_initialize, multihost
    maybe_initialize(cfg.distributed)

    assert cfg.vae_levels > 0
    assert cfg.disc_loss_weight > 0

    # multi-host: the run is defined by ONE seed (every data/RNG stream
    # derives from it — parallel/multihost.py), one experiment dir, and
    # process-0-only writes
    if cfg.manualSeed is None:
        cfg.manualSeed = random.randint(1, 10000)
    cfg.manualSeed = multihost.agree(cfg.manualSeed)

    saver = VideoSaver(cfg)
    primary = multihost.is_primary()
    summary = TensorboardSummary(saver.experiment_dir) if primary else None
    configure_logging(os.path.join(saver.experiment_dir, "logbook.txt")
                      if primary else None)

    cfg.adjust_scales()

    logging.info(f"Random Seed: {cfg.manualSeed}")
    root_key = jax.random.PRNGKey(cfg.manualSeed)

    cfg.scale_idx = 0
    cfg.Noise_Amps = []

    dataset = SingleVideoDataset(cfg)  # probes fps/ar, caches level-0 frames
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
        logging.info(f"Generator      : {cfg.generator}")
        logging.info(f"Iterations     : {cfg.niter}")
        logging.info(f"Sampling rates : {list(cfg.sampling_rates)}")
        logging.info(f"Device         : {jax.devices()[0].platform}")

    G = make_generator(cfg.generator, cfg, pyramid, ndim=3)
    gvars = G.init(jax.random.fold_in(root_key, 7), batch_size=1)

    if cfg.netG != "":
        gvars = apply_resume(cfg, G, gvars, root_key)
    else:
        cfg.resumed_idx = -1

    while cfg.scale_idx < cfg.stop_scale + 1:
        if cfg.scale_idx > 0 and cfg.resumed_idx != cfg.scale_idx:
            gvars = G.init_next_stage(
                gvars, jax.random.fold_in(root_key, 100 + cfg.scale_idx))

        # per-scale dataset regeneration (train_video.py:25-36)
        cfg.fps = pyramid.fps(cfg.scale_idx)
        cfg.td = pyramid.td(cfg.scale_idx)
        cfg.fps_index = pyramid.fps_index(cfg.scale_idx)
        with LoggingBlock("Updating dataset", emph=True):
            logging.info(f"FPS : {cfg.fps}")
            logging.info(f"Time-Depth : {cfg.td}")
            logging.info(
                f"Sampling-Ratio : {cfg.sampling_rates[cfg.fps_index]}")
            dataset.generate_frames(cfg.scale_idx)

        if cfg.decode_ahead and cfg.scale_idx < cfg.stop_scale:
            dataset.prefetch_frames(cfg.scale_idx + 1)

        gvars = train_scale(cfg, G, gvars, dataset, saver, summary, root_key,
                            ndim=3)
        cfg.scale_idx += 1

    if summary is not None:
        summary.close()


if __name__ == "__main__":
    main()
