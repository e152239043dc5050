#!/usr/bin/env python
"""Pure-GAN video baselines (SinGAN / ConSinGAN re-implementations, no VAE).
Flag-compatible TPU-native rebuild of the reference entry point
(train_video_baselines.py:216-370).
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
from hpvaegan_tpu.train.trainer_baselines import train_scale_baselines
from hpvaegan_tpu.utils import (LoggingBlock, TensorboardSummary, VideoSaver,
                                configure_logging)
from hpvaegan_tpu.utils.saver import apply_resume, restore_file


def main() -> None:
    parser = build_parser("video_baselines")
    cfg = config_from_args(parser.parse_args())

    from hpvaegan_tpu.parallel import maybe_initialize, multihost
    maybe_initialize(cfg.distributed)

    # multi-host: one agreed seed, one experiment dir, process-0-only writes
    if cfg.manualSeed is None:
        cfg.manualSeed = random.randint(1, 10000)
    cfg.manualSeed = multihost.agree(cfg.manualSeed)
    primary = multihost.is_primary()

    saver = VideoSaver(cfg)
    summary = TensorboardSummary(saver.experiment_dir) if primary else None
    configure_logging(os.path.join(saver.experiment_dir, "logbook.txt")
                      if primary else None)

    cfg.adjust_scales()

    logging.info(f"Random Seed: {cfg.manualSeed}")
    root_key = jax.random.PRNGKey(cfg.manualSeed)

    cfg.scale_idx = 0
    cfg.Noise_Amps = []

    dataset = SingleVideoDataset(cfg)
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
        logging.info(f"Device         : {jax.devices()[0].platform}")

    G = make_generator(cfg.generator, cfg, pyramid, ndim=3)

    # baselines generators start WITH their first body stage
    cfg.fps = pyramid.fps(0)
    cfg.td = pyramid.td(0)
    cfg.fps_index = pyramid.fps_index(0)
    gvars = G.init(jax.random.fold_in(root_key, 7), batch_size=1)

    if cfg.netG != "":
        gvars = apply_resume(cfg, G, gvars)  # baselines grow without a key
        # Conscious fix of a reference resume bug: the reference regenerates
        # a fresh Z_init on resume (train_video_baselines.py:38-43), breaking
        # the fixed-reconstruction-noise contract — reload the original.
        z_init_path = os.path.join(cfg.resume_dir, "Z_init")
        if os.path.exists(z_init_path):
            import jax.numpy as jnp
            cfg.Z_init = jnp.asarray(restore_file(z_init_path)["data"])
    else:
        cfg.resumed_idx = -1

    while cfg.scale_idx < cfg.stop_scale + 1:
        if cfg.scale_idx > 0 and cfg.resumed_idx != cfg.scale_idx:
            gvars = G.init_next_stage(gvars)

        cfg.fps = pyramid.fps(cfg.scale_idx)
        cfg.td = pyramid.td(cfg.scale_idx)
        cfg.fps_index = pyramid.fps_index(cfg.scale_idx)
        with LoggingBlock("Updating dataset", emph=True):
            logging.info(f"FPS : {cfg.fps}")
            logging.info(f"Time-Depth : {cfg.td}")
            dataset.generate_frames(cfg.scale_idx)

        if cfg.decode_ahead and cfg.scale_idx < cfg.stop_scale:
            dataset.prefetch_frames(cfg.scale_idx + 1)

        gvars = train_scale_baselines(cfg, G, gvars, dataset, saver, summary,
                                      root_key)
        cfg.scale_idx += 1

    if summary is not None:
        summary.close()


if __name__ == "__main__":
    main()
