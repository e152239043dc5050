#!/usr/bin/env python
"""Standalone sampling / evaluation CLI.

The reference fork has no generation script — rand-mode sampling exists only
inside training visualization (train_video.py:226-241, SURVEY.md §5.8 quirk
list).  This entry point loads a trained checkpoint and generates novel
samples (mode 'rand') or reconstructions (mode 'rec'), batched over seeds.

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

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.models.registry import make_generator
from hpvaegan_tpu.utils.saver import restore_file, write_video


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


# training-time keys restored from the experiment's config.json snapshot
# (written at train start); any flag the user passes explicitly wins
_SNAPSHOT_KEYS = (
    "generator", "nc_im", "nfc", "latent_dim", "vae_levels", "enc_blocks",
    "ker_size", "num_layer", "padd_size", "scale_factor", "noise_amp",
    "min_size", "max_size", "img_size", "sampling_rates", "stop_scale_time",
    "start_frame", "max_frames", "train_all", "bf16",
    "video_path", "image_path",
)


def _explicit_cli_keys(argv=None) -> set:
    """Which dest names were explicitly present on the command line (parse
    with every default suppressed)."""
    p = build_parser()
    for action in p._actions:
        action.default = argparse.SUPPRESS
        action.required = False
    return set(vars(p.parse_args(argv)).keys())


def main() -> None:
    args = build_parser().parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = Config()
    for key, value in vars(args).items():
        attr = key.replace("-", "_")
        if hasattr(cfg, attr):
            setattr(cfg, attr, tuple(value) if attr == "sampling_rates"
                    else value)

    # auto-load the experiment's resolved config snapshot (VERDICT r1 item
    # 4): `--netG <ckpt>` alone rebuilds the exact training module tree; a
    # mismatched hand-specified tree previously failed only at restore.
    snap_path = os.path.join(os.path.dirname(args.netG), "config.json")
    if os.path.isfile(snap_path):
        import json
        with open(snap_path) as f:
            snap = json.load(f)
        explicit = _explicit_cli_keys()
        applied = []
        for key in _SNAPSHOT_KEYS:
            if key not in snap or key in explicit:
                continue
            if key in ("video_path", "image_path") and (
                    args.video_path or args.image_path):
                continue  # the user chose a source clip/image
            value = snap[key]
            if key == "sampling_rates":
                value = tuple(value)
            # the snapshot is written AFTER adjust_scales: restore the
            # pre-adjust inputs so re-adjusting reproduces the training
            # pyramid exactly
            elif key == "scale_factor":
                value = snap.get("scale_factor_init", value)
            elif key == "noise_amp":
                value = snap.get("noise_amp_init", value)
            setattr(cfg, key, value)
            applied.append(key)
        if applied:
            logging.info(f"config.json snapshot: restored {applied} "
                         f"from {snap_path}")
    cfg.adjust_scales()

    ndim = 3 if cfg.video_path else 2
    if args.svfid and ndim != 3:
        raise ValueError("--svfid is a video metric (needs --video-path)")
    if ndim == 3:
        from hpvaegan_tpu.data import SingleVideoDataset
        dataset = SingleVideoDataset(cfg)
        pyramid = dataset.pyramid
    else:
        from hpvaegan_tpu.data import SingleImageDataset
        dataset = SingleImageDataset(cfg)
        pyramid = dataset.pyramid

    if not os.path.isfile(cfg.netG):
        raise RuntimeError(f"=> no <G> checkpoint found at '{cfg.netG}'")
    raw = restore_file(cfg.netG)
    scale = int(raw["scale"])
    cfg.scale_idx = scale

    if cfg.generator not in ("GeneratorHPVAEGAN", "GeneratorVAE_nb",
                             "GeneratorCSG", "GeneratorSG"):
        raise ValueError(f"unknown generator for generate.py: "
                         f"{cfg.generator!r}")

    root_key = jax.random.PRNGKey(args.manualSeed)
    G = make_generator(cfg.generator, cfg, pyramid, ndim=ndim)
    gvars = G.init(jax.random.fold_in(root_key, 7), batch_size=1)
    # sampling generator — possibly over an extrapolated pyramid
    if (args.h_factor, args.w_factor, args.t_factor) != (1.0, 1.0, 1.0):
        from hpvaegan_tpu.core.pyramid import ScaledPyramid
        pyramid = ScaledPyramid(pyramid, args.h_factor, args.w_factor,
                                args.t_factor)
        G = make_generator(cfg.generator, cfg, pyramid, ndim=ndim)
    for i in range(scale):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(root_key, 100 + i))
    gvars = restore_file(cfg.netG, target={"scale": 0, "gvars": gvars,
                                           "noise_amps": raw["noise_amps"],
                                           "opt_g": raw.get("opt_g")}
                         )["gvars"]
    amps = jnp.asarray(raw["noise_amps"], jnp.float32)

    out_dir = args.output_dir or os.path.join(os.path.dirname(cfg.netG),
                                              "eval")
    os.makedirs(out_dir, exist_ok=True)

    # HPVAEGAN samples latent-dim noise through the decoder; the CSG/SG
    # baselines sample image-channel noise (train_video_baselines.py:41)
    is_triple = getattr(G, "returns_triple", True)
    noise_ch = cfg.latent_dim if is_triple else cfg.nc_im
    h0, w0 = pyramid.shape2d(0)
    if ndim == 3:
        td0 = pyramid.td(0)
        noise_shape = (args.batch_size, td0, h0, w0, noise_ch)
    else:
        noise_shape = (args.batch_size, h0, w0, noise_ch)

    import functools

    mesh = None
    if args.mesh_shape:
        from hpvaegan_tpu.parallel import (make_mesh, parse_mesh_shape,
                                           shard_batch, shard_gvars)
        mesh = make_mesh(parse_mesh_shape(args.mesh_shape))
        gvars = shard_gvars(gvars, mesh)

    @functools.partial(jax.jit, static_argnames=())
    def sample_fn(gv, noise, key):
        ret, _ = G.apply(gv, amps, key, noise_init=noise, mode="rand",
                         train=True)
        return ret[0] if is_triple else ret

    @functools.partial(jax.jit, static_argnames=())
    def reconstruct_fn(gv, real_zero, key):
        if is_triple:
            (out, _, _), _ = G.apply(gv, amps, key, real_zero=real_zero,
                                     mode="rec", train=True)
        else:  # baselines reconstruct from their fixed Z_init noise
            out, _ = G.apply(gv, amps, key, noise_init=real_zero, mode="rec",
                             train=True)
        return out

    @functools.partial(jax.jit, static_argnames=("start",))
    def inject_fn(gv, x_init, key, start):
        (out, _, _), _ = G.apply(gv, amps, key, noise_init=jnp.zeros(
            (x_init.shape[0], *noise_shape[1:])),
            sample_init=(start, x_init), mode="rand", train=True)
        return out

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

    def write_sample(frame, path_base):
        """[-1,1] sample -> .avi (3D) or .png (2D)."""
        if ndim == 3:
            write_video(frame, path_base + ".avi", pyramid.fps(scale))
        else:
            import cv2
            img = (np.clip(frame, -1, 1) + 1.0) * 127.5
            cv2.imwrite(path_base + ".png", np.uint8(img[:, :, ::-1]))

    if args.inject_scale >= 0:
        if not is_triple:
            raise ValueError("--inject-scale requires GeneratorHPVAEGAN")
        s0 = args.inject_scale
        if s0 >= len(gvars["body"]):
            raise ValueError(
                f"--inject-scale {s0} out of range: checkpoint was trained "
                f"to scale {scale} with {len(gvars['body'])} body stages")
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
            out = np.asarray(inject_fn(gvars, x_init, key, s0))
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
        return

    # rec mode: reconstruct from the real sample's zero-scale clip
    # (HPVAEGAN) or the checkpointed fixed Z_init noise (CSG/SG baselines,
    # train_video_baselines.py:38-43)
    real_zero = real_top = None
    if args.mode == "rec":
        if ndim == 3:
            dataset.generate_frames(scale)
            cur, zero = dataset.get(0, hflip=False, scale_idx=scale)
        else:
            cur, zero = dataset.get(0, scale, hflip=False)
        if zero is None:
            zero = cur
        real_top = np.stack([cur] * args.batch_size)
        if is_triple:
            real_zero = jnp.asarray(np.stack([zero] * args.batch_size))
        else:
            z_path = os.path.join(os.path.dirname(cfg.netG), "Z_init")
            if not os.path.exists(z_path):
                raise RuntimeError(f"baselines rec mode needs {z_path}")
            real_zero = jnp.asarray(restore_file(z_path)["data"])

    produced = 0
    batch_idx = 0
    all_samples = []
    while produced < args.num_samples:
        key = jax.random.fold_in(root_key, 1000 + batch_idx)
        if args.mode == "rec":
            out = np.asarray(reconstruct_fn(gvars, real_zero,
                                            jax.random.fold_in(key, 1)))
        else:
            noise = jax.random.normal(key, noise_shape)
            if mesh is not None:
                from hpvaegan_tpu.parallel import shard_batch
                noise = shard_batch(noise, mesh, ndim)
            out = np.asarray(sample_fn(gvars, noise,
                                       jax.random.fold_in(key, 1)))
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
                                      np.stack([real_top[0]] * produced))
            logging.info(f"reconstruction PSNR: {val:.2f} dB")
        else:
            val = diversity_score(np.stack(all_samples))
            logging.info(f"sample diversity (mean pairwise L1): {val:.4f}")
    if args.svfid:
        report_svfid(all_samples)


if __name__ == "__main__":
    main()
