"""Per-scale training driver shared by the image & video entry points.

Mirrors the reference's ``train(opt, netG)`` call stack (train_video.py:25-258,
train_image.py:39-272): per-scale critic construction with warm start, fresh
per-scale optimizers with depth-decayed LR groups, iteration-0 noise-amp
calibration, VAE-phase / GAN-phase step dispatch, TensorBoard scalars and
sample grids, and end-of-scale checkpoints.

The hot loop body is one jitted XLA program per phase (train/steps.py); this
file is pure Python orchestration.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import BatchLoader
from ..models.registry import make_discriminator
from ..utils import create_progressbar
from .optim import (build_d_optimizer, build_g_optimizer, dparams_view,
                    gparams_view, hpvaegan_group_plan)
from .fallback import oom_dispatch
from .steps import make_hpvaegan_steps

__all__ = ["train_scale", "init_discriminator"]


def _load_chunk(loader, k: int, first=None):
    """(k, B, ...) pre-stacked (real, real_zero) pair for a scan chunk by
    stacking k host-prefetched batches (BatchLoader path only — cache
    loaders take the fused in-step gather instead).  ``first`` prepends an
    already-fetched batch (the iteration-0 calibration batch)."""
    batches = [first] if first is not None else []
    while len(batches) < k:
        batches.append(next(loader))
    return (jnp.stack([b[0] for b in batches]),
            jnp.stack([b[1] for b in batches]))


def _warm_start_dvars(saver, scale_idx: int, dvars, directory):
    """Critic warm start from the previous scale's checkpoint
    (train_video.py:50-52).  Multi-host: only process 0 reads the file
    (it is the only writer, utils/saver.py), then the payload is broadcast
    into every process's structure-matching fresh ``dvars`` — no shared
    filesystem required on non-primary hosts."""
    from ..parallel import multihost
    if multihost.is_primary():
        dvars = saver.load_checkpoint(f"netD_{scale_idx - 1}",
                                      target={"scale": 0, "dvars": dvars},
                                      directory=directory)["dvars"]
    return multihost.broadcast_pytree(dvars)


def init_discriminator(D, key: jax.Array, sample_shape) -> Dict[str, Any]:
    x = jnp.zeros(sample_shape)
    try:
        return dict(D.init(key, x))          # WDiscriminator (no train arg)
    except TypeError:
        return dict(D.init(key, x, True))    # baselines critic (train arg)


def train_scale(cfg, G, gvars: Dict[str, Any], dataset, saver, summary,
                root_key: jax.Array, ndim: int) -> Dict[str, Any]:
    """Train one pyramid scale; returns updated generator variables."""
    scale_idx = cfg.scale_idx
    pyramid = G.pyramid
    gan_phase = cfg.vae_levels < scale_idx + 1
    key = jax.random.fold_in(root_key, scale_idx)

    # ---- Z_init noise geometry (train_video.py:39-42, train_image.py:137-139)
    if ndim == 3:
        if not hasattr(cfg, "Z_init_size"):
            h0, w0 = pyramid.shape2d(0)
            # reference quirk: uses the td of the FIRST trained scale
            cfg.Z_init_size = [cfg.batch_size, cfg.td, h0, w0, cfg.latent_dim]
    else:
        h0, w0 = pyramid.shape2d(0)
        cfg.Z_init_size = [cfg.batch_size, h0, w0, cfg.latent_dim]

    # ---- mid-scale resume (--save-interval checkpoints): the CLI stashes
    # the raw netG_mid payload; gvars were already restored there.  The
    # optimizer states and critic are restored below INSTEAD of being built
    # fresh / warm-started, and the loop starts at the saved iteration —
    # extends the reference's per-scale resume granularity
    # (train_video.py:399-416) without changing the fresh-Adam-per-scale
    # semantics at scale boundaries.
    mid_raw = None
    start_it = 0
    if cfg.resumed_idx == scale_idx and getattr(cfg, "_mid_raw", None) \
            is not None:
        mid_raw = cfg._mid_raw
        cfg._mid_raw = None  # consumed: later scales start fresh
        start_it = min(int(cfg.resume_iteration), cfg.niter)

    import flax.serialization as _fser

    # ---- critic (GAN phase only; warm start, train_video.py:44-55) ----
    D = dvars = tx_d = opt_d = None
    if gan_phase:
        D = make_discriminator(cfg.discriminator, cfg, ndim)
        sample_shape = ((cfg.batch_size, *pyramid.shape3d(scale_idx), cfg.nc_im)
                        if ndim == 3 else
                        (cfg.batch_size, *pyramid.shape2d(scale_idx), cfg.nc_im))
        dvars = init_discriminator(D, jax.random.fold_in(key, 101),
                                   sample_shape)
        if mid_raw is not None:
            dvars = _fser.from_state_dict(dvars, mid_raw["dvars"])
        elif cfg.netG != "" and cfg.resumed_idx == scale_idx:
            dvars = _warm_start_dvars(saver, scale_idx, dvars,
                                      cfg.resume_dir)
        elif cfg.vae_levels < scale_idx:
            dvars = _warm_start_dvars(saver, scale_idx, dvars, None)
        tx_d, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
        if mid_raw is not None:
            opt_d = _fser.from_state_dict(opt_d, mid_raw["opt_d"])

    # ---- generator optimizer (fresh per scale, train_video.py:57-88) ----
    pview = gparams_view(gvars)
    module_labels, body_labels, lrs = hpvaegan_group_plan(
        cfg, scale_idx, len(gvars["body"]))
    tx_g, opt_g = build_g_optimizer(cfg, pview, module_labels, body_labels,
                                    lrs, cfg.grad_clip)
    if mid_raw is not None:
        opt_g = _fser.from_state_dict(opt_g, mid_raw["opt_g"])

    # ---- optional SPMD over the device mesh (--spmd --mesh-shape AxB) ----
    place = mesh = None
    if cfg.spmd and cfg.mesh_shape:
        from ..parallel import (make_mesh, parse_mesh_shape, shard_batch,
                                shard_gvars)
        mesh = make_mesh(parse_mesh_shape(cfg.mesh_shape))
        gvars = shard_gvars(gvars, mesh)
        opt_g = shard_gvars(opt_g, mesh)
        if gan_phase:
            dvars = shard_gvars(dvars, mesh)
            opt_d = shard_gvars(opt_d, mesh)
        place = lambda a: shard_batch(a, mesh, ndim)  # noqa: E731

    # device-resident frame cache: per-scale store uploaded once, crops/
    # flips jitted on device — removes the host (and the relay round trip)
    # from the hot loop.  --host-loader restores the prefetching host
    # pipeline.  Under --spmd the stores are replicated over the mesh and
    # the steps' in-body sharding constraints (parallel/mesh.
    # spatial_constraint) re-shard each gathered batch over
    # (data, spatial) — the cache composes with SPMD.
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
        gather = loader.sample_gather()
    else:
        loader = BatchLoader(dataset, cfg.batch_size,
                             seed=(cfg.manualSeed or 0) * 1000 + scale_idx,
                             scale_idx=scale_idx, device=place,
                             prefetch=max(2, int(getattr(cfg,
                                                         "scan_steps", 1))),
                             start_iteration=start_it)
        gather = None

    def _rebuild():
        return make_hpvaegan_steps(G, D, cfg, tx_g, tx_d,
                                   group_plan=(module_labels, body_labels),
                                   mesh=mesh, gather=gather)

    dispatch = oom_dispatch(cfg, scale_idx, _rebuild)

    # ---- compile-ahead (--compile-ahead): join the thread that has been
    # compiling THIS scale's programs since the previous scale started, so
    # the first dispatch below hits the compilation cache; then capture the
    # shape skeleton needed to launch the NEXT scale's thread (before any
    # donation invalidates the buffers).  train/precompile.py.
    ahead_enabled = bool(getattr(cfg, "compile_ahead", False))
    prev_ahead = getattr(cfg, "_compile_ahead_thread", None)
    if prev_ahead is not None and prev_ahead.is_alive():
        prev_ahead.join(timeout=900)
    cfg._compile_ahead_thread = None
    ahead_started = not ahead_enabled
    if ahead_enabled:
        from .precompile import abstract_tree
        gvars_abs = abstract_tree(gvars)

    bar = create_progressbar(
        total=cfg.niter,
        desc=f"Training scale [{scale_idx + 1}/{cfg.stop_scale + 1}]")
    if start_it:
        bar.update(start_it)  # resumed progress

    # honest throughput through the async-dispatch relay (SURVEY §5.1)
    from ..utils.profiling import StepTimer
    timer = StepTimer(sync_every=max(50, int(getattr(cfg, "scan_steps", 1))))

    # convert silent relay wedges into clean resumable exits (SURVEY §5.3)
    from ..utils.watchdog import Watchdog
    watchdog = Watchdog(getattr(cfg, "watchdog", 0.0),
                        context=f"scale {scale_idx} start").start()

    noise_amp = cfg.Noise_Amps[-1] if cfg.Noise_Amps else cfg.noise_amp_init
    metrics: Dict[str, Any] = {}
    profiling = False
    profile_done = False
    profile_start = 0
    scan_k = max(1, int(getattr(cfg, "scan_steps", 1)))
    save_interval = int(getattr(cfg, "save_interval", 0))
    iteration = start_it
    real = real_zero = None
    try:
        while iteration < cfg.niter:
            # optional XLA trace of a chunk-aligned steady-state window of
            # >=10 iterations starting at the first loop visit past 5
            # (SURVEY §5.1)
            if cfg.profile_dir:
                import jax.profiler as _prof
                if iteration >= 5 and not profiling and not profile_done:
                    _prof.start_trace(
                        f"{cfg.profile_dir}/scale_{scale_idx}")
                    profiling = True
                    profile_start = iteration
                elif profiling and iteration >= profile_start + 10:
                    jax.block_until_ready(metrics)
                    _prof.stop_trace()
                    profiling = False
                    profile_done = True
            it_key = jax.random.fold_in(key, iteration)
            k_noise, k_step, k_vis = jax.random.split(it_key, 3)

            # ---- iteration-0 noise-amp calibration (train_video.py:131-145)
            # (on mid-scale resume start_it > 0: the amp was calibrated
            # before the first netG_mid was written, so the reuse branch
            # always takes it from cfg.Noise_Amps)
            if iteration == start_it:
                real, real_zero = next(loader)
                if len(cfg.Noise_Amps) >= scale_idx + 1:
                    # Resuming a scale whose amp was already calibrated:
                    # reuse it.  (Conscious fix of a reference bug — the
                    # reference re-appends on resume, shifting every later
                    # scale's amp slot by one, train_video.py:131-145 after
                    # :399-416 resume.)
                    noise_amp = float(cfg.Noise_Amps[scale_idx])
                elif cfg.const_amp:
                    cfg.Noise_Amps.append(1.0)
                    noise_amp = 1.0
                elif scale_idx == 0:
                    noise_amp = 1.0
                    cfg.Noise_Amps.append(noise_amp)
                else:
                    cfg.Noise_Amps.append(0.0)
                    amps = jnp.asarray(cfg.Noise_Amps, jnp.float32)
                    rmse, gvars = dispatch("calibrate", gvars, real,
                                           real_zero, amps, k_step)
                    noise_amp = (cfg.noise_amp_init * float(rmse)
                                 / cfg.batch_size)
                    cfg.Noise_Amps[-1] = noise_amp

            if iteration == start_it:  # amps fixed after calibration: build
                amps = jnp.asarray(cfg.Noise_Amps, jnp.float32)  # once

            # ---- chunk size: scan k iterations per dispatch, stopping at
            # print-interval boundaries so visualization cadence holds ----
            k = min(scan_k, cfg.niter - iteration)
            if cfg.visualize and cfg.print_interval > 0:
                next_boundary = ((iteration // cfg.print_interval) + 1) \
                    * cfg.print_interval
                k = max(1, min(k, next_boundary - iteration))

            if k == 1:
                if iteration > start_it:
                    real, real_zero = next(loader)
                noise_init = jax.random.normal(k_noise,
                                               tuple(cfg.Z_init_size))
                if gan_phase:
                    gvars, dvars, opt_g, opt_d, metrics = dispatch(
                        "gan_step", gvars, dvars, opt_g, opt_d, real,
                        real_zero, noise_init, amps, k_step)
                else:
                    gvars, opt_g, metrics = dispatch(
                        "vae_step", gvars, opt_g, real, real_zero, amps,
                        k_step)
            elif gather is not None:
                # fused data path: the whole chunk — gather + per-iteration
                # keys/noise + K train steps — is ONE device dispatch
                # (steps.py *_scan_cache_step); the host only draws (k, B)
                # start indices + flip bits.  Keys derive from the same
                # fold_in/split stream as the unfused paths.
                idxs_h, flips_h = loader.draw(k)
                idxs, flips = jnp.asarray(idxs_h), jnp.asarray(flips_h)
                if gan_phase:
                    gvars, dvars, opt_g, opt_d, metrics_hist = dispatch(
                        "gan_scan_cache_step", gvars, dvars, opt_g, opt_d,
                        *loader.stores, idxs, flips, amps, key, iteration)
                else:
                    gvars, opt_g, metrics_hist = dispatch(
                        "vae_scan_cache_step", gvars, opt_g, *loader.stores,
                        idxs, flips, amps, key, iteration)
                metrics = jax.tree_util.tree_map(lambda a: a[-1],
                                                 metrics_hist)
                if cfg.visualize and cfg.print_interval > 0 \
                        and iteration % cfg.print_interval == 0:
                    # the visualization below wants this chunk's last batch
                    # + a fresh noise draw — one jitted gather (the
                    # loader's chunk program), dispatched only on TB chunks
                    rs, rzs = loader.gather_rows(idxs_h[-1:], flips_h[-1:])
                    real, real_zero = rs[0], rzs[0]
                    noise_init = jax.random.normal(k_noise,
                                                   tuple(cfg.Z_init_size))
            else:
                first = (real, real_zero) if iteration == start_it else None
                reals, rzs = _load_chunk(loader, k, first)
                # per-iteration keys/noise built in ONE vmapped dispatch
                # each (numerically identical to the k-loop of
                # fold_in/split/normal it replaces): the 1-core host can't
                # afford ~3k small dispatches per chunk, which measurably
                # throttled e2e throughput at the sub-10ms scales
                its = jnp.arange(iteration, iteration + k)
                chunk_keys = jax.vmap(
                    lambda j: jax.random.split(jax.random.fold_in(key, j), 3)
                )(its)
                step_keys = chunk_keys[:, 1]
                if gan_phase:
                    noise_inits = jax.vmap(
                        lambda nk: jax.random.normal(
                            nk, tuple(cfg.Z_init_size)))(chunk_keys[:, 0])
                    gvars, dvars, opt_g, opt_d, metrics_hist = dispatch(
                        "gan_scan_step", gvars, dvars, opt_g, opt_d,
                        reals, rzs, noise_inits, amps, step_keys)
                else:
                    gvars, opt_g, metrics_hist = dispatch(
                        "vae_scan_step", gvars, opt_g, reals, rzs, amps,
                        step_keys)
                # scan steps return the FULL (K,) metric stack; keep the
                # last iteration's scalars as the current view
                metrics = jax.tree_util.tree_map(lambda a: a[-1],
                                                 metrics_hist)
                real, real_zero = reals[-1], rzs[-1]
                noise_init = jax.random.normal(k_noise,
                                               tuple(cfg.Z_init_size))

            if not ahead_started:
                # this scale's programs are compiled (the dispatch above
                # returned) — start compiling the next scale's in parallel
                ahead_started = True
                from .precompile import start_compile_ahead
                cfg._compile_ahead_thread = start_compile_ahead(
                    cfg, G, gvars_abs, dataset, scale_idx + 1, ndim)

            it_logged = iteration + k - 1  # last iteration of this chunk
            bar.update(k)
            timer.step(metrics.get("loss"), n=k)
            watchdog.beat(f"scale {scale_idx} iteration {it_logged + 1}")

            # ---- intra-scale checkpoint (--save-interval): one atomic
            # netG_mid file carrying params + BOTH optimizer states + the
            # iteration counter, so a wedge/preemption near the end of a
            # multi-hour scale costs at most save_interval iterations
            # instead of the whole scale (SURVEY §5.3/5.4 extension; the
            # reference only checkpoints at scale boundaries,
            # train_video.py:246-258)
            if save_interval > 0 and iteration + k < cfg.niter and \
                    (iteration + k) // save_interval > \
                    iteration // save_interval:
                watchdog.beat(f"scale {scale_idx} mid checkpoint "
                              f"(iteration {iteration + k})")
                saver.save_checkpoint(
                    {"scale": scale_idx, "iteration": iteration + k,
                     "gvars": gvars, "opt_g": opt_g,
                     "dvars": dvars if gan_phase else {},
                     "opt_d": opt_d if gan_phase else {},
                     "noise_amps": np.asarray(cfg.Noise_Amps, np.float32)},
                    "netG_mid")
            bar.set_description(
                f"Scale [{scale_idx + 1}/{cfg.stop_scale + 1}], "
                f"Iteration [{it_logged + 1}/{cfg.niter}]" + timer.suffix)

            # ---- TensorBoard (train_video.py:210-241) ----
            # scalar writes are primary-only (summary is None elsewhere);
            # the sample grids below run their dispatches + fetches on
            # EVERY process (collective under --distributed) with only the
            # TB write itself gated inside _visualize
            if cfg.visualize and summary is not None:
                # the reference uses 'Video/Scale {s}' tags in BOTH trainers
                # (train_image.py:227 quirk) — kept.  Every iteration of a
                # scan chunk is logged at its TRUE index (the stacked
                # metrics), so curve density is independent of --scan-steps
                # (reference logs per-iter, train_video.py:210-223).
                tag = f"Video/Scale {scale_idx}"
                if k == 1:
                    get = lambda name, j: metrics[name]  # noqa: E731
                else:
                    # ONE device fetch for the whole chunk's metric stack
                    # (per-leaf np.asarray = one ~40 ms relay round trip
                    # EACH; stacking on device first makes it a single RTT)
                    names = sorted(metrics_hist)
                    block = np.asarray(
                        jnp.stack([metrics_hist[n] for n in names]))
                    host_hist = dict(zip(names, block))
                    get = lambda name, j: host_hist[name][j]  # noqa: E731
                for j in range(k):
                    it_j = iteration + j
                    summary.add_scalar(f"{tag}/noise_amp", noise_amp, it_j)
                    if not gan_phase:
                        summary.add_scalar(f"{tag}/KLD", get("kl_loss", j),
                                           it_j)
                        summary.add_scalar(f"{tag}/Rec VAE",
                                           get("rec_vae_loss", j), it_j)
                    else:
                        summary.add_scalar(f"{tag}/rec loss",
                                           get("rec_loss", j), it_j)
                        summary.add_scalar(f"{tag}/errG", get("errG", j),
                                           it_j)
                        summary.add_scalar(f"{tag}/errD_fake",
                                           get("errD_fake", j), it_j)
                        summary.add_scalar(f"{tag}/errD_real",
                                           get("errD_real", j), it_j)

            if cfg.visualize and iteration % cfg.print_interval == 0:
                _visualize(cfg, G, gvars, dispatch, amps, real, real_zero,
                           noise_init, k_vis, summary, ndim, iteration)

            iteration += k
    except BaseException:
        # the checkpoint block below never runs on this path — disarm the
        # watchdog here so it can't os._exit a process that is busy
        # handling the real error (or a test suite running in-process)
        watchdog.stop()
        raise
    finally:
        if profiling:
            import jax.profiler as _prof
            _prof.stop_trace()
        loader.close()
        bar.close()

    # ---- end-of-scale checkpoints (train_video.py:246-258) ----
    # still under the watchdog: serializing gvars/dvars is a large
    # device->host fetch through the relay — exactly the wedge-prone
    # operation the watchdog exists for
    try:
        watchdog.beat(f"scale {scale_idx} checkpoint save")
        saver.save_checkpoint({"data": np.asarray(cfg.Noise_Amps,
                                                  np.float32)},
                              "Noise_Amps")
        saver.save_json({"noise_amps": [float(a) for a in cfg.Noise_Amps],
                         "scale": scale_idx}, "Noise_Amps.json")
        saver.save_checkpoint({"scale": scale_idx, "gvars": gvars,
                               "noise_amps": np.asarray(cfg.Noise_Amps,
                                                        np.float32),
                               "opt_g": opt_g}, "netG")
        if gan_phase:
            saver.save_checkpoint({"scale": scale_idx, "dvars": dvars,
                                   "opt_d": opt_d}, f"netD_{scale_idx}",
                                  blocking=True)
        saver.wait()
        # multi-host: keep processes in lockstep at scale boundaries (no
        # process may start re-jitting the next scale's programs while
        # process 0 is still flushing checkpoints)
        from ..parallel.multihost import barrier
        barrier(f"end_of_scale_{scale_idx}")
    finally:
        watchdog.stop()
    return gvars


def _visualize(cfg, G, gvars, dispatch, amps, real, real_zero, noise_init,
               key, summary, ndim: int, iteration: int) -> None:
    """3 independent rand-mode samples -> grids (train_video.py:225-241).

    Runs on EVERY process (the sample/reconstruct dispatches and the
    cross-process batch replication in ``fetch`` are collectives); only
    the TB writes are primary-only (``summary is None`` elsewhere)."""
    fakes, fake_vaes = [], []
    for i in range(3):
        k = jax.random.fold_in(key, i)
        noise = jax.random.normal(k, noise_init.shape, noise_init.dtype)
        fake, fake_vae = dispatch("sample", gvars, noise, amps,
                                  jax.random.fold_in(k, 1))
        fakes.append(fake)
        fake_vaes.append(fake_vae)
    fake_var = jnp.concatenate(fakes, axis=0)
    fake_vae_var = jnp.concatenate(fake_vaes, axis=0)
    generated, generated_vae = dispatch("reconstruct", gvars, real_zero,
                                        amps, jax.random.fold_in(key, 7))

    # multihost.fetch == np.asarray single-process; under --distributed it
    # first replicates batches whose 'data' shards live on other hosts
    # (a collective — hence fetched on every process, before the gate)
    from ..parallel.multihost import fetch
    grids = [(fetch(real), "Real"), (fetch(generated), "Generated"),
             (fetch(generated_vae), "Generated VAE"),
             (fetch(fake_var), "Fake var"),
             (fetch(fake_vae_var), "Fake VAE var")]
    if summary is None:
        return
    viz = summary.visualize_video if ndim == 3 else summary.visualize_image
    for arr, name in grids:
        viz(cfg, iteration, arr, name)
