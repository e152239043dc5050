#!/usr/bin/env python
"""Multi-clip SVFID harness (VERDICT r2 item 4).

No pretrained Sports-1M C3D checkpoint can be obtained in this
environment (zero egress; no checkpoint on disk — see BENCHMARKS.md
"SVFID availability"), so absolute paper-comparable SVFID remains
blocked on `$C3D_WEIGHTS`.  This harness makes the RELATIVE claims rest
on more than one clip: it scores every (real clip, generated-samples)
set in a manifest under the same fixed-seed random-C3D trunk, with
per-sample scores, a bootstrap confidence band of the per-clip mean,
and a matched pure-noise control per clip.

Manifest: JSON list of entries
  {"name": ..., "video_path": ..., "samples_glob": ...,
   "img_size": 256, "min_size": 32, "max_size": 256, "scale": -1}

Usage:
  python benchmarks/svfid_multiclip.py --manifest benchmarks/svfid_clips.json
  python benchmarks/svfid_multiclip.py \
      --clip name=wingsuit,video_path=data/vids/wingsuit.avi,\
             samples_glob='docs/samples/wingsuit_3000it_sample_*.avi'
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
    raw = video_to_frames(path, 0, 10 ** 9)
    return raw.astype(np.float32) / 255.0 * 2.0 - 1.0


def real_clip(entry) -> np.ndarray:
    cfg = Config()
    cfg.video_path = entry["video_path"]
    cfg.img_size = int(entry.get("img_size", 256))
    cfg.min_size = int(entry.get("min_size", 32))
    cfg.max_size = int(entry.get("max_size", 256))
    cfg.adjust_scales()
    dataset = SingleVideoDataset(cfg)
    scale = int(entry.get("scale", -1))
    scale = cfg.stop_scale if scale < 0 else scale
    dataset.generate_frames(scale)
    real, _ = dataset.get(0, hflip=False, scale_idx=scale)
    return np.asarray(real)


def bootstrap_ci(scores, seed=0, n_boot=10000, lo=2.5, hi=97.5):
    """Percentile bootstrap CI of the mean over the per-sample scores."""
    rng = np.random.default_rng(seed)
    scores = np.asarray(scores, np.float64)
    means = rng.choice(scores, size=(n_boot, len(scores)),
                       replace=True).mean(axis=1)
    return [float(np.percentile(means, lo)), float(np.percentile(means, hi))]


def score_entry(entry, feature_layer: str, seed: int) -> dict:
    real = real_clip(entry)
    paths = sorted(glob.glob(entry["samples_glob"]))
    if not paths:
        raise RuntimeError(f"{entry['name']}: no samples match "
                           f"{entry['samples_glob']!r}")
    samples = [read_avi(p) for p in paths]
    rng = np.random.default_rng(seed)
    noise = [np.tanh(rng.standard_normal(s.shape)).astype(np.float32)
             for s in samples]

    res_s = svfid(real, samples, feature_layer=feature_layer, seed=seed)
    res_n = svfid(real, noise, feature_layer=feature_layer, seed=seed)
    per = res_s["per_sample"]
    return {
        "name": entry["name"],
        "real_shape": list(real.shape),
        "num_samples": len(samples),
        "pretrained_c3d": res_s["pretrained"],
        "svfid_mean": round(res_s["mean"], 1),
        "svfid_std": round(float(np.std(per)), 1),
        "svfid_ci95_of_mean": [round(v, 1) for v in bootstrap_ci(per, seed)]
        if len(per) >= 2 else None,
        "svfid_per_sample": [round(v, 1) for v in per],
        "noise_control_mean": round(res_n["mean"], 1),
        "separation_x": round(res_n["mean"] / res_s["mean"], 1)
        if res_s["mean"] > 0 else None,
    }


def parse_inline_clip(spec: str) -> dict:
    entry = {}
    for kv in spec.split(","):
        k, v = kv.split("=", 1)
        entry[k.strip()] = v.strip()
    return entry


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", default="",
                   help="JSON list of clip entries")
    p.add_argument("--clip", action="append", default=[],
                   help="inline entry: name=..,video_path=..,samples_glob=..")
    p.add_argument("--feature-layer", default="conv3b")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tpu", action="store_true", default=False)
    args = p.parse_args()

    entries = []
    if args.manifest:
        with open(args.manifest) as f:
            entries += json.load(f)
    entries += [parse_inline_clip(s) for s in args.clip]
    if not entries:
        raise SystemExit("no clips: pass --manifest or --clip")

    out = [score_entry(e, args.feature_layer, args.seed) for e in entries]
    print(json.dumps({"feature_layer": args.feature_layer,
                      "seed": args.seed, "clips": out}, indent=1))


if __name__ == "__main__":
    main()
