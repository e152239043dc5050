#!/usr/bin/env python
"""Standalone sampling / evaluation CLI.

The reference fork has no generation script — rand-mode sampling exists only
inside training visualization (train_video.py:226-241, SURVEY.md §5.8 quirk
list).  This entry point loads a trained checkpoint and generates novel
samples (mode 'rand') or reconstructions (mode 'rec'), batched over seeds.
Model loading + the jitted samplers live in hpvaegan_tpu.serving (shared
with the persistent ``hpvaegan-serve`` server).

Examples:
  python generate.py --netG run/clip/DEBUG/experiment_0/netG \
      --video-path data/vids/clip.mp4 --num-samples 8
  python generate.py --netG run/img/DEBUG/experiment_0/netG \
      --image-path img.png --num-samples 4
"""
import argparse
import logging
import os
import sys

import jax

if "--no-cuda" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu.serving import (SamplerSession, apply_snapshot,
                                  config_from_cli_args)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--netG", required=True, help="path to trained netG")
    p.add_argument("--video-path", default="", help="source video (3D model)")
    p.add_argument("--image-path", default="", help="source image (2D model)")
    p.add_argument("--output-dir", default="", help="output dir (default: "
                   "<ckpt dir>/eval)")
    p.add_argument("--num-samples", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--mode", default="rand", choices=["rand", "rec"])
    p.add_argument("--metrics", action="store_true", default=False,
                   help="report diversity (rand) / PSNR (rec) metrics")
    p.add_argument("--svfid", action="store_true", default=False,
                   help="SVFID of the samples vs the real clip (3D only; "
                        "the paper's metric). Pretrained C3D via "
                        "--c3d-weights / $C3D_WEIGHTS; without weights a "
                        "fixed-seed random C3D is used (relative numbers "
                        "only)")
    p.add_argument("--c3d-weights", type=str, default="",
                   help="torch C3D Sports-1M checkpoint for --svfid")
    p.add_argument("--svfid-layer", type=str, default="conv3b",
                   help="C3D tap layer for --svfid (conv1..conv5b)")
    p.add_argument("--sifid", action="store_true", default=False,
                   help="SIFID of the samples vs the real image (2D only; "
                        "SinGAN's metric, the 2D counterpart of --svfid). "
                        "Pretrained InceptionV3 via --inception-weights / "
                        "$INCEPTION_WEIGHTS; without weights a fixed-seed "
                        "random stem is used (relative numbers only)")
    p.add_argument("--inception-weights", type=str, default="",
                   help="torchvision inception_v3 state dict for --sifid")
    p.add_argument("--sifid-layer", type=str, default="pool1",
                   help="Inception-stem tap for --sifid "
                        "(Conv2d_1a_3x3/Conv2d_2a_3x3/Conv2d_2b_3x3/pool1)")
    p.add_argument("--manualSeed", type=int, default=0)
    # network/pyramid flags — must match training
    p.add_argument("--generator", type=str, default="GeneratorHPVAEGAN")
    p.add_argument("--nc-im", type=int, default=3)
    p.add_argument("--nfc", type=int, default=64)
    p.add_argument("--latent-dim", type=int, default=128)
    p.add_argument("--vae-levels", type=int, default=3)
    p.add_argument("--enc-blocks", type=int, default=2)
    p.add_argument("--ker-size", type=int, default=3)
    p.add_argument("--num-layer", type=int, default=5)
    p.add_argument("--padd-size", type=int, default=1)
    p.add_argument("--scale-factor", type=float, default=0.75)
    p.add_argument("--min-size", type=int, default=32)
    p.add_argument("--max-size", type=int, default=256)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--sampling-rates", type=int, nargs="+",
                   default=[4, 3, 2, 1])
    p.add_argument("--stop-scale-time", type=int, default=-1)
    p.add_argument("--start-frame", default=0, type=int)
    p.add_argument("--max-frames", default=1000, type=int)
    p.add_argument("--train-all", action="store_true", default=False)
    p.add_argument("--no-cuda", action="store_true", default=False)
    p.add_argument("--bf16", action="store_true", default=False)
    # extrapolation: generate at a multiple of the training geometry
    # (fully-convolutional pyramid; BASELINE config 5)
    p.add_argument("--h-factor", type=float, default=1.0)
    p.add_argument("--w-factor", type=float, default=1.0)
    p.add_argument("--t-factor", type=float, default=1.0)
    # multi-seed generation sharded over the device mesh
    p.add_argument("--mesh-shape", type=str, default="",
                   help="shard the sample batch over a device mesh, e.g. 8")
    # pyramid injection (the reference's unused sample_init hook,
    # networks_3d.py:368-380): refine the REAL sample from level K upward —
    # the paper's editing/harmonization application surface
    p.add_argument("--inject-scale", type=int, default=-1,
                   help="start refinement from the real sample at this "
                        "pyramid level (rand mode above it)")
    return p


def _explicit_cli_keys(argv=None) -> set:
    from hpvaegan_tpu.serving import explicit_cli_keys
    return explicit_cli_keys(build_parser, argv)


def main() -> None:
    args = build_parser().parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = config_from_cli_args(args)

    # auto-load the experiment's resolved config snapshot (VERDICT r1 item
    # 4): `--netG <ckpt>` alone rebuilds the exact training module tree; a
    # mismatched hand-specified tree previously failed only at restore.
    apply_snapshot(cfg, args.netG, _explicit_cli_keys(),
                   user_chose_source=bool(args.video_path or args.image_path))
    cfg.adjust_scales()

    ndim = 3 if cfg.video_path else 2
    if args.svfid and ndim != 3:
        raise ValueError("--svfid is a video metric (needs --video-path)")
    if args.sifid and ndim != 2:
        raise ValueError("--sifid is an image metric (needs --image-path)")

    sess = SamplerSession(cfg, batch_size=args.batch_size,
                          manual_seed=args.manualSeed, h_factor=args.h_factor,
                          w_factor=args.w_factor, t_factor=args.t_factor,
                          mesh_shape=args.mesh_shape)
    dataset, scale = sess.dataset, sess.scale
    root_key = sess.root_key

    out_dir = args.output_dir or os.path.join(os.path.dirname(cfg.netG),
                                              "eval")
    os.makedirs(out_dir, exist_ok=True)

    def report_svfid(samples):
        """SVFID of generated clips vs the real current-scale clip.

        Shapes need not match (feature statistics are per-position), so
        this also works for extrapolated (--h/w/t-factor) samples.
        """
        from hpvaegan_tpu.eval import svfid as _svfid
        dataset.generate_frames(scale)  # no-op if rec/inject already did
        real_cur, _ = dataset.get(0, hflip=False, scale_idx=scale)
        res = _svfid(np.asarray(real_cur), samples,
                     weights_path=args.c3d_weights,
                     feature_layer=args.svfid_layer)
        tag = "" if res["pretrained"] else " (RANDOM C3D — relative only)"
        logging.info(f"SVFID[{res['feature_layer']}]{tag}: "
                     f"mean {res['mean']:.4f}  per-sample "
                     f"{[round(s, 4) for s in res['per_sample']]}")

    def report_sifid(samples):
        """SIFID of generated images vs the real current-scale image.

        Shapes need not match (feature statistics are per-position), so
        this also works for extrapolated (--h/w-factor) samples.
        """
        from hpvaegan_tpu.eval import sifid as _sifid
        real_cur, _ = dataset.get(0, scale, hflip=False)
        res = _sifid(np.asarray(real_cur), samples,
                     weights_path=args.inception_weights,
                     tap=args.sifid_layer)
        tag = "" if res["pretrained"] else " (RANDOM stem — relative only)"
        logging.info(f"SIFID[{res['tap']}]{tag}: "
                     f"mean {res['mean']:.4f}  per-sample "
                     f"{[round(s, 4) for s in res['per_sample']]}")

    write_sample = sess.write_sample

    if args.inject_scale >= 0:
        if not sess.is_triple:
            raise ValueError("--inject-scale requires GeneratorHPVAEGAN")
        s0 = args.inject_scale
        if s0 >= len(sess.gvars["body"]):
            raise ValueError(
                f"--inject-scale {s0} out of range: checkpoint was trained "
                f"to scale {scale} with {len(sess.gvars['body'])} body stages")
        if ndim == 3:
            dataset.generate_frames(s0)
            cur, _ = dataset.get(0, hflip=False, scale_idx=s0)
        else:
            cur, _ = dataset.get(0, s0, hflip=False)
        x_init = jnp.asarray(np.stack([cur] * args.batch_size))
        produced = 0
        batch_idx = 0
        injected = []
        while produced < args.num_samples:
            key = jax.random.fold_in(root_key, 3000 + batch_idx)
            out = np.asarray(sess.inject_fn(sess.gvars, x_init, key, s0))
            for b in range(out.shape[0]):
                if produced >= args.num_samples:
                    break
                write_sample(out[b],
                             os.path.join(out_dir, f"inject_{produced}"))
                injected.append(out[b])
                produced += 1
            batch_idx += 1
        logging.info(f"wrote {produced} injected samples (from level {s0}) "
                     f"to {out_dir}")
        if args.metrics:
            from hpvaegan_tpu.eval import diversity_score
            logging.info(f"sample diversity (mean pairwise L1): "
                         f"{diversity_score(np.stack(injected)):.4f}")
        if args.svfid:
            report_svfid(injected)
        if args.sifid:
            report_sifid(injected)
        return

    real_top = None
    if args.mode == "rec":
        _, real_top = sess.rec_input()

    produced = 0
    batch_idx = 0
    all_samples = []
    while produced < args.num_samples:
        key = jax.random.fold_in(root_key, 1000 + batch_idx)
        if args.mode == "rec":
            out = sess.reconstruct_batch(key)
        else:
            out = sess.sample_batch(key)
        for b in range(out.shape[0]):
            if produced >= args.num_samples:
                break
            write_sample(out[b], os.path.join(out_dir, f"sample_{produced}"))
            all_samples.append(out[b])
            produced += 1
        batch_idx += 1
    logging.info(f"wrote {produced} samples to {out_dir}")

    if args.metrics:
        from hpvaegan_tpu.eval import diversity_score, reconstruction_psnr
        if args.mode == "rec" and real_top is not None:
            val = reconstruction_psnr(np.stack(all_samples),
                                      np.stack([real_top] * produced))
            logging.info(f"reconstruction PSNR: {val:.2f} dB")
        else:
            val = diversity_score(np.stack(all_samples))
            logging.info(f"sample diversity (mean pairwise L1): {val:.4f}")
    if args.svfid:
        report_svfid(all_samples)
    if args.sifid:
        report_sifid(all_samples)


if __name__ == "__main__":
    main()
