"""Per-scale training driver for the pure-GAN video baselines
(reference: train_video_baselines.py:24-213): critic exists at every scale,
fixed Z_init reconstruction noise, Dsteps/Gsteps inner loops, alpha-weighted
reconstruction loss, frozen early body stages."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import BatchLoader
from ..models.registry import make_discriminator
from ..utils import create_progressbar
from .optim import (baselines_group_plan, build_d_optimizer,
                    build_g_optimizer, dparams_view, gparams_view)
from .fallback import oom_dispatch
from .steps import make_baseline_steps
from .trainer import init_discriminator

__all__ = ["train_scale_baselines"]


def train_scale_baselines(cfg, G, gvars: Dict[str, Any], dataset, saver,
                          summary, root_key: jax.Array) -> Dict[str, Any]:
    scale_idx = cfg.scale_idx
    pyramid = G.pyramid
    key = jax.random.fold_in(root_key, scale_idx)

    # ---- fixed Z_init created once, checkpointed
    # (train_video_baselines.py:38-43)
    if not hasattr(cfg, "Z_init"):
        h0, w0 = pyramid.shape2d(0)
        cfg.Z_init = jax.random.normal(
            jax.random.fold_in(root_key, 999),
            (cfg.batch_size, cfg.td, h0, w0, cfg.nc_im))
        saver.save_checkpoint({"data": cfg.Z_init}, "Z_init")

    # ---- mid-scale resume (--save-interval): same contract as trainer.py —
    # the CLI stashed the netG_mid payload (gvars already restored there);
    # critic + both optimizer states are restored below and the loop starts
    # at the saved iteration.
    import flax.serialization as _fser
    mid_raw = None
    start_it = 0
    if cfg.resumed_idx == scale_idx and getattr(cfg, "_mid_raw", None) \
            is not None:
        mid_raw = cfg._mid_raw
        cfg._mid_raw = None
        start_it = min(int(cfg.resume_iteration), cfg.niter)

    # ---- critic always exists; warm start (train_video_baselines.py:45-48)
    D = make_discriminator(cfg.discriminator, cfg, 3)
    sample_shape = (cfg.batch_size, *pyramid.shape3d(scale_idx), cfg.nc_im)
    dvars = init_discriminator(D, jax.random.fold_in(key, 101), sample_shape)
    if mid_raw is not None:
        dvars = _fser.from_state_dict(dvars, mid_raw["dvars"])
    elif scale_idx > 0:
        # Conscious fix of a reference resume bug: the reference always warm
        # starts from the CURRENT experiment dir (train_video_baselines.py:
        # 46-48), which doesn't exist when resuming into a fresh experiment —
        # fall back to the resume dir.  Multi-host: process 0 (the only
        # writer) reads, then broadcasts into the fresh structure.
        import os

        from ..parallel import multihost
        if multihost.is_primary():
            d_name = f"netD_{scale_idx - 1}"
            directory = None
            if not os.path.exists(os.path.join(saver.experiment_dir, d_name)) \
                    and getattr(cfg, "resume_dir", ""):
                directory = cfg.resume_dir
            dvars = saver.load_checkpoint(d_name,
                                          target={"scale": 0, "dvars": dvars},
                                          directory=directory)["dvars"]
        dvars = multihost.broadcast_pytree(dvars)
    tx_d, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
    if mid_raw is not None:
        opt_d = _fser.from_state_dict(opt_d, mid_raw["opt_d"])

    # ---- generator optimizer (train_video_baselines.py:55-70)
    pview = gparams_view(gvars)
    has_head = getattr(G, "has_head_tail", False)
    module_labels, body_labels, lrs = baselines_group_plan(
        cfg, scale_idx, len(gvars["body"]), has_head)
    tx_g, opt_g = build_g_optimizer(cfg, pview, module_labels, body_labels,
                                    lrs, grad_clip=None)
    if mid_raw is not None:
        opt_g = _fser.from_state_dict(opt_g, mid_raw["opt_g"])

    # ---- optional SPMD over the device mesh (--spmd --mesh-shape AxB),
    # same wiring as trainer.py ----
    place = mesh = None
    if cfg.spmd and cfg.mesh_shape:
        from ..parallel import (make_mesh, parse_mesh_shape, shard_batch,
                                shard_gvars)
        mesh = make_mesh(parse_mesh_shape(cfg.mesh_shape))
        gvars = shard_gvars(gvars, mesh)
        opt_g = shard_gvars(opt_g, mesh)
        dvars = shard_gvars(dvars, mesh)
        opt_d = shard_gvars(opt_d, mesh)
        cfg.Z_init = shard_batch(cfg.Z_init, mesh, 3)
        place = lambda a: shard_batch(a, mesh, 3)  # noqa: E731

    dispatch = oom_dispatch(cfg, scale_idx,
                            lambda: make_baseline_steps(G, D, cfg, tx_g, tx_d,
                                                        mesh=mesh))

    from ..data import DeviceCacheLoader, supports_device_cache
    if (not getattr(cfg, "host_loader", False)
            and supports_device_cache(dataset)):
        from ..parallel import replicated_sharding
        store_sharding = replicated_sharding(mesh)
        loader = DeviceCacheLoader(
            dataset, cfg.batch_size,
            seed=(cfg.manualSeed or 0) * 1000 + scale_idx,
            scale_idx=scale_idx, sharding=store_sharding,
            start_iteration=start_it)
    else:
        loader = BatchLoader(dataset, cfg.batch_size,
                             seed=(cfg.manualSeed or 0) * 1000 + scale_idx,
                             scale_idx=scale_idx, device=place,
                             start_iteration=start_it)
    bar = create_progressbar(
        iterable=range(start_it, cfg.niter), initial=start_it,
        total=cfg.niter,
        desc=f"Training scale [{scale_idx + 1}/{cfg.stop_scale + 1}]")

    # honest throughput through the async-dispatch relay (SURVEY §5.1)
    from ..utils.profiling import StepTimer
    timer = StepTimer()

    # convert silent relay wedges into clean resumable exits (SURVEY §5.3)
    from ..utils.watchdog import Watchdog
    watchdog = Watchdog(getattr(cfg, "watchdog", 0.0),
                        context=f"scale {scale_idx} start").start()

    noise_amp = cfg.Noise_Amps[-1] if cfg.Noise_Amps else 1.0
    try:
        for iteration in bar:
            it_key = jax.random.fold_in(key, iteration)
            k_noise, k_step, k_vis = jax.random.split(it_key, 3)
            real, _ = next(loader)

            noise_init = jax.random.normal(k_noise, cfg.Z_init.shape,
                                           cfg.Z_init.dtype)
            if place is not None:
                noise_init = place(noise_init)

            if iteration == start_it:
                # on mid-scale resume start_it > 0 the amp was calibrated
                # before the first netG_mid existed -> the reuse branch
                if len(cfg.Noise_Amps) >= scale_idx + 1:
                    noise_amp = float(cfg.Noise_Amps[scale_idx])  # resume
                elif scale_idx == 0:
                    noise_amp = 1.0
                    cfg.Noise_Amps.append(noise_amp)
                else:
                    cfg.Noise_Amps.append(0.0)
                    amps = jnp.asarray(cfg.Noise_Amps, jnp.float32)
                    rmse, gvars = dispatch("calibrate", gvars, real,
                                           cfg.Z_init, amps, k_step)
                    noise_amp = (cfg.noise_amp_init * float(rmse)
                                 / cfg.batch_size)
                    cfg.Noise_Amps[-1] = noise_amp

            amps = jnp.asarray(cfg.Noise_Amps, jnp.float32)
            gvars, dvars, opt_g, opt_d, metrics = dispatch(
                "step", gvars, dvars, opt_g, opt_d, real, noise_init,
                cfg.Z_init, amps, k_step)

            timer.step(metrics.get("errG"))
            watchdog.beat(f"scale {scale_idx} iteration {iteration + 1}")

            # ---- intra-scale checkpoint (--save-interval), same contract
            # as trainer.py: one atomic netG_mid with params + both
            # optimizer states + iteration
            si = int(getattr(cfg, "save_interval", 0))
            if si > 0 and iteration + 1 < cfg.niter \
                    and (iteration + 1) % si == 0:
                watchdog.beat(f"scale {scale_idx} mid checkpoint "
                              f"(iteration {iteration + 1})")
                saver.save_checkpoint(
                    {"scale": scale_idx, "iteration": iteration + 1,
                     "gvars": gvars, "opt_g": opt_g, "dvars": dvars,
                     "opt_d": opt_d,
                     "noise_amps": np.asarray(cfg.Noise_Amps, np.float32)},
                    "netG_mid")
            bar.set_description(
                f"Scale [{scale_idx + 1}/{cfg.stop_scale + 1}], "
                f"Iteration [{iteration + 1}/{cfg.niter}]" + timer.suffix)

            if cfg.visualize and summary is not None:
                tag = f"Video/Scale {scale_idx}"
                summary.add_scalar(f"{tag}/errG", metrics["errG"], iteration)
                summary.add_scalar(f"{tag}/errD_fake", metrics["errD_fake"],
                                   iteration)
                summary.add_scalar(f"{tag}/errD_real", metrics["errD_real"],
                                   iteration)
                if cfg.alpha > 0:
                    summary.add_scalar(f"{tag}/rec_loss",
                                       metrics["rec_loss"], iteration)
                    summary.add_scalar(f"{tag}/noise_amp", noise_amp,
                                       iteration)
            if cfg.visualize and iteration % cfg.print_interval == 0:
                # dispatches + fetches run on EVERY process (collectives
                # under --distributed); only the TB write is primary-only
                from ..parallel.multihost import fetch
                fake = dispatch("sample", gvars, noise_init, amps,
                                jax.random.fold_in(k_vis, 1))
                grids = [(fetch(real), "Real"), (fetch(fake), "Fake")]
                if cfg.alpha > 0:
                    gen = dispatch("sample", gvars, cfg.Z_init, amps,
                                   jax.random.fold_in(k_vis, 2),
                                   mode="rec")
                    grids.append((fetch(gen), "Generated"))
                if summary is not None:
                    for arr, name in grids:
                        summary.visualize_video(cfg, iteration, arr, name)
    except BaseException:
        watchdog.stop()  # checkpoint block below never runs on this path
        raise
    finally:
        loader.close()
        bar.close()

    # ---- checkpoints (train_video_baselines.py:200-213)
    # still under the watchdog: serializing gvars/dvars is a large
    # device->host fetch through the relay (the wedge-prone operation)
    try:
        watchdog.beat(f"scale {scale_idx} checkpoint save")
        saver.save_checkpoint({"data": cfg.Z_init}, "Z_init")
        saver.save_checkpoint({"data": np.asarray(cfg.Noise_Amps,
                                                  np.float32)},
                              "Noise_Amps")
        saver.save_json({"noise_amps": [float(a) for a in cfg.Noise_Amps],
                         "scale": scale_idx}, "Noise_Amps.json")
        saver.save_checkpoint({"scale": scale_idx, "gvars": gvars,
                               "noise_amps": np.asarray(cfg.Noise_Amps,
                                                        np.float32),
                               "opt_g": opt_g}, "netG")
        saver.save_checkpoint({"scale": scale_idx, "dvars": dvars,
                               "opt_d": opt_d}, f"netD_{scale_idx}",
                              blocking=True)
        saver.wait()
        # multi-host: lockstep at scale boundaries (see trainer.py)
        from ..parallel.multihost import barrier
        barrier(f"end_of_scale_{scale_idx}")
    finally:
        watchdog.stop()
    return gvars
