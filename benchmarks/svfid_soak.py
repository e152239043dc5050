#!/usr/bin/env python
"""SVFID soak evaluation (reproduces the BENCHMARKS.md SVFID row).

Scores a trained checkpoint's generated samples with the paper's metric
(SVFID, arXiv 2006.12226 §5) against the real source clip, next to a
matched pure-noise control — the control contextualizes the random-C3D
fallback numbers used offline (no pretrained Sports-1M weights on this
machine): a trained model must score far below noise.

Usage (after training + generate.py wrote sample_*.avi):
  python benchmarks/svfid_soak.py \
      --samples-dir /tmp/svfid_soak/test_video/svfid_soak/experiment_0/eval \
      --video-path tests/assets/test_video.avi --img-size 48
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.data import SingleVideoDataset
from hpvaegan_tpu.data.video import video_to_frames
from hpvaegan_tpu.eval import svfid


def read_avi(path: str) -> np.ndarray:
    """MJPG clip (saver.write_video format) -> (T,H,W,3) RGB in [-1,1],
    via the dataset's own decoder (incl. its null-read safety guard)."""
    raw = video_to_frames(path, 0, 10 ** 9)
    return raw.astype(np.float32) / 255.0 * 2.0 - 1.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--samples-dir", required=True,
                   help="dir with generate.py's sample_*.avi")
    p.add_argument("--video-path", required=True)
    p.add_argument("--img-size", type=int, default=48)
    p.add_argument("--min-size", type=int, default=32)
    p.add_argument("--max-size", type=int, default=256)
    p.add_argument("--scale", type=int, default=-1,
                   help="pyramid scale of the real clip (-1 = stop scale)")
    p.add_argument("--feature-layer", default="conv3b")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tpu", action="store_true", default=False)
    args = p.parse_args()

    cfg = Config()
    cfg.video_path = args.video_path
    cfg.img_size = args.img_size
    cfg.min_size = args.min_size
    cfg.max_size = args.max_size
    cfg.adjust_scales()
    dataset = SingleVideoDataset(cfg)
    scale = cfg.stop_scale if args.scale < 0 else args.scale
    dataset.generate_frames(scale)
    real, _ = dataset.get(0, hflip=False, scale_idx=scale)
    real = np.asarray(real)

    paths = sorted(glob.glob(os.path.join(args.samples_dir, "sample_*.avi")))
    if not paths:
        raise RuntimeError(f"no sample_*.avi in {args.samples_dir}")
    samples = [read_avi(path) for path in paths]

    rng = np.random.default_rng(args.seed)
    noise = [np.tanh(rng.standard_normal(s.shape)).astype(np.float32)
             for s in samples]

    res_s = svfid(real, samples, feature_layer=args.feature_layer,
                  seed=args.seed)
    res_n = svfid(real, noise, feature_layer=args.feature_layer,
                  seed=args.seed)
    print(json.dumps({
        "real_shape": list(real.shape),
        "num_samples": len(samples),
        "feature_layer": args.feature_layer,
        "pretrained_c3d": res_s["pretrained"],
        "svfid_samples_mean": res_s["mean"],
        "svfid_samples": [round(v, 2) for v in res_s["per_sample"]],
        "svfid_noise_control_mean": res_n["mean"],
    }))


if __name__ == "__main__":
    main()
