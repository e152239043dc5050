#!/usr/bin/env python
"""Multi-image SIFID harness (VERDICT r4 item 4) — the 2D counterpart of
svfid_multiclip.py.

No pretrained InceptionV3 checkpoint can be obtained in this environment
(zero egress, torchvision not installed, no torch-hub cache), so absolute
paper-comparable SIFID remains blocked on `$INCEPTION_WEIGHTS`.  This
harness makes the RELATIVE claims robust the same way the 3D one does:
it scores every (real image, generated-samples) set in a manifest under
the same fixed-seed random Inception stem, with per-sample scores, a
bootstrap confidence band of the per-image mean, and a matched pure-noise
control per image.

Manifest: JSON list of entries
  {"name": ..., "image_path": ..., "samples_glob": ...,
   "img_size": 256, "min_size": 32, "max_size": 256, "scale": -1}

Usage:
  python benchmarks/sifid_multiimage.py --manifest benchmarks/sifid_imgs.json
  python benchmarks/sifid_multiimage.py \
      --image name=balloons,image_path=/root/reference/data/imgs/air_balloons.jpg,\
              img_size=248,samples_glob='run/air_balloons/soak50000/*/eval/sample_*.png'
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
from hpvaegan_tpu.data import SingleImageDataset
from hpvaegan_tpu.eval import sifid


def read_png(path: str) -> np.ndarray:
    import imageio

    img = np.asarray(imageio.imread(path))[:, :, :3]
    return img.astype(np.float32) / 255.0 * 2.0 - 1.0


def real_image(entry) -> np.ndarray:
    cfg = Config()
    cfg.image_path = entry["image_path"]
    cfg.img_size = int(entry.get("img_size", 256))
    cfg.min_size = int(entry.get("min_size", 32))
    cfg.max_size = int(entry.get("max_size", 256))
    cfg.adjust_scales()
    dataset = SingleImageDataset(cfg)
    scale = int(entry.get("scale", -1))
    scale = cfg.stop_scale if scale < 0 else scale
    real, _ = dataset.get(0, scale, hflip=False)
    return np.asarray(real)


def bootstrap_ci(scores, seed=0, n_boot=10000, lo=2.5, hi=97.5):
    """Percentile bootstrap CI of the mean over the per-sample scores."""
    rng = np.random.default_rng(seed)
    scores = np.asarray(scores, np.float64)
    means = rng.choice(scores, size=(n_boot, len(scores)),
                       replace=True).mean(axis=1)
    return [float(np.percentile(means, lo)), float(np.percentile(means, hi))]


def score_entry(entry, tap: str, seed: int) -> dict:
    real = real_image(entry)
    paths = sorted(glob.glob(entry["samples_glob"]))
    if not paths:
        raise RuntimeError(f"{entry['name']}: no samples match "
                           f"{entry['samples_glob']!r}")
    samples = [read_png(p) for p in paths]
    rng = np.random.default_rng(seed)
    noise = [np.tanh(rng.standard_normal(s.shape)).astype(np.float32)
             for s in samples]

    res_s = sifid(real, samples, tap=tap, seed=seed)
    res_n = sifid(real, noise, tap=tap, seed=seed)
    per = res_s["per_sample"]
    return {
        "name": entry["name"],
        "real_shape": list(real.shape),
        "num_samples": len(samples),
        "pretrained_inception": res_s["pretrained"],
        "sifid_mean": round(res_s["mean"], 3),
        "sifid_std": round(float(np.std(per)), 3),
        "sifid_ci95_of_mean": [round(v, 3) for v in bootstrap_ci(per, seed)]
        if len(per) >= 2 else None,
        "sifid_per_sample": [round(v, 3) for v in per],
        "noise_control_mean": round(res_n["mean"], 3),
        "separation_x": round(res_n["mean"] / res_s["mean"], 1)
        if res_s["mean"] > 0 else None,
    }


def parse_inline_image(spec: str) -> dict:
    entry = {}
    for kv in spec.split(","):
        k, v = kv.split("=", 1)
        entry[k.strip()] = v.strip()
    return entry


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", default="",
                   help="JSON list of image entries")
    p.add_argument("--image", action="append", default=[],
                   help="inline entry: name=..,image_path=..,samples_glob=..")
    p.add_argument("--tap", default="pool1")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tpu", action="store_true", default=False)
    args = p.parse_args()

    entries = []
    if args.manifest:
        with open(args.manifest) as f:
            entries += json.load(f)
    entries += [parse_inline_image(s) for s in args.image]
    if not entries:
        raise SystemExit("no images: pass --manifest or --image")

    out = [score_entry(e, args.tap, args.seed) for e in entries]
    print(json.dumps({"tap": args.tap, "seed": args.seed, "images": out},
                     indent=1))


if __name__ == "__main__":
    main()
