"""Compile-ahead: overlap the NEXT pyramid scale's XLA compilation with the
current scale's training.

Per-scale recompilation is inherent to the progressive pyramid — every scale
has different static (T, H, W) shapes and a longer stage list, so each scale
boundary pays a full trace + compile of the new step programs.  Through the
remote-compile TPU transport that is ~30 s with a warm persistent cache and
up to ~260 s cold (BENCHMARKS.md "Warm-start") of dead device time per
scale, ~10 scales per run.

This module removes that from the critical path the TPU-native way: while
scale ``s`` trains, a daemon thread lowers and compiles scale ``s+1``'s
programs — the hot train step (scan/cache/plain, mirroring the trainer's
dispatch choice), the iteration-0 noise-amp calibration, the device-cache
gather, and (with --visualize) the sampling/reconstruction programs — from
``jax.ShapeDtypeStruct``s only.  Nothing touches HBM: next-scale parameter,
optimizer, and frame-store shapes are derived with ``jax.eval_shape`` over
the same constructors the trainer will run (``G.init_next_stage``,
``D.init``, ``tx.init``), so the traced programs are bit-identical to the
boundary's and land in the in-process + persistent compilation cache
(core/cache.py) before they are needed.

If the next scale's step does not fit HBM, the OOM ladder
(train/fallback.py ``escalate``) fires HERE, off the critical path — the
boundary then compiles the already-escalated rung directly instead of
discovering the OOM live.

No reference analogue (the reference is eager PyTorch — nothing compiles,
train_video.py:111-241); this is infrastructure the compilation model
requires.  Never on by default — opt in with --compile-ahead.  Under
--spmd the abstractions carry the trainer's exact NamedShardings
(replicated variables/stores, batch_spec'd host batches) so the sharded
program lowers identically too.
"""
from __future__ import annotations

import logging
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import make_discriminator
from .fallback import escalate, is_hbm_oom
from .optim import (d_transform, dparams_view, g_transform, gparams_view,
                    hpvaegan_group_plan)
from .steps import make_hpvaegan_steps

__all__ = ["start_compile_ahead", "abstract_tree", "build_programs"]


def abstract_tree(tree):
    """Shape/dtype skeleton of a pytree — safe to capture before the buffers
    are donated away."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.result_type(a)), tree)


def _sds(shape, dtype=jnp.float32, sharding=None) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(tuple(int(d) for d in shape), dtype,
                                sharding=sharding)


def _attach(tree, sharding):
    """Re-issue every ShapeDtypeStruct leaf with ``sharding`` (None = leave
    unspecified, mirroring an uncommitted runtime array)."""
    if sharding is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding),
        tree)


def _chunk_k(cfg) -> int:
    """The trainer's steady-state chunk size (trainer.py chunk logic at
    iteration 0): scan depth, clipped to the first print boundary when
    visualizing."""
    k = max(1, min(int(getattr(cfg, "scan_steps", 1)), cfg.niter))
    if cfg.visualize and cfg.print_interval > 0:
        k = max(1, min(k, cfg.print_interval))
    return k


def build_programs(cfg, G, gvars_abs: Dict[str, Any], dataset,
                   scale_idx: int, ndim: int, n_amps: int
                   ) -> List[Tuple[str, Any, tuple, dict]]:
    """Abstractly construct scale ``scale_idx``'s step set and return
    ``[(name, jitted_fn, args, kwargs), ...]`` ready for
    ``fn.lower(*args, **kwargs).compile()``.  Pure host work — nothing is
    allocated on the device."""
    pyramid = G.pyramid
    key0 = jax.random.PRNGKey(0)
    B = cfg.batch_size

    # ---- SPMD: mirror the trainer's mesh + placements exactly ----
    # (trainer.py "optional SPMD" block: variables/optimizers replicated,
    # host batches batch_spec-sharded, cache stores replicated; everything
    # else uncommitted).  Wrong predictions only cost a boundary cache miss.
    mesh = rep = batch_sharding = None
    if getattr(cfg, "spmd", False) and getattr(cfg, "mesh_shape", ""):
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel import batch_spec, make_mesh, parse_mesh_shape
        mesh = make_mesh(parse_mesh_shape(cfg.mesh_shape))
        rep = NamedSharding(mesh, PartitionSpec())

    # ---- next-scale generator variables: growth under eval_shape ----
    gv = jax.eval_shape(lambda g: G.init_next_stage(g, key0), gvars_abs)
    gv = _attach(gv, rep)

    # ---- batch geometry ----
    if ndim == 3:
        real_shape = (B, *pyramid.shape3d(scale_idx), cfg.nc_im)
        zero_batch_shape = (B, *pyramid.shape3d(0), cfg.nc_im)
    else:
        real_shape = (B, *pyramid.shape2d(scale_idx), cfg.nc_im)
        zero_batch_shape = (B, *pyramid.shape2d(0), cfg.nc_im)
    use_cache = (not getattr(cfg, "host_loader", False)
                 and hasattr(dataset, "device_cache_spec"))
    if mesh is not None:
        from jax.sharding import NamedSharding
        if use_cache:
            # calibration batch = gather-program output over replicated
            # stores — replicated
            real_sh = rz_sh = rep
        else:  # host loader: shard_batch at the boundary
            real_sh = NamedSharding(
                mesh, batch_spec(mesh, ndim, real_shape))
            rz_sh = NamedSharding(
                mesh, batch_spec(mesh, ndim, zero_batch_shape))
    else:
        real_sh = rz_sh = None
    real_abs = _sds(real_shape, sharding=real_sh)
    rz_abs = _sds(zero_batch_shape, sharding=rz_sh)
    amps_abs = _sds((n_amps,), jnp.float32)
    z_init = tuple(getattr(cfg, "Z_init_size", ()) or ())

    # ---- critic + optimizers (abstract) ----
    gan = cfg.vae_levels < scale_idx + 1
    D = dv = tx_d = od = None
    if gan:
        D = make_discriminator(cfg.discriminator, cfg, ndim)
        from .trainer import init_discriminator
        dv = _attach(jax.eval_shape(
            lambda k: init_discriminator(D, k, real_shape), key0), rep)
        tx_d = d_transform(cfg)
        od = _attach(jax.eval_shape(tx_d.init, dparams_view(dv)), rep)

    pview = gparams_view(gv)
    module_labels, body_labels, lrs = hpvaegan_group_plan(
        cfg, scale_idx, len(gv["body"]))
    tx_g = g_transform(cfg, pview, module_labels, body_labels, lrs,
                       cfg.grad_clip)
    og = _attach(jax.eval_shape(tx_g.init, pview), rep)

    # ---- data path: device-cache gather (default) or host loader ----
    gather = None
    store_abs: Optional[Tuple[Any, Any]] = None
    idx_abs = flip_abs = None
    k = _chunk_k(cfg)
    if use_cache:
        from ..data.device_cache import make_sample_gather
        cur_shape, zero_shape, _, kw = dataset.device_cache_spec(scale_idx)
        hflip = bool(kw.pop("hflip"))
        kw.pop("virtual_len")
        gather = make_sample_gather(kw, hflip)
        store_abs = (_sds(cur_shape, sharding=rep),
                     _sds(zero_shape, sharding=rep))
        trail = (1,) * (4 if ndim == 3 else 3)
        idx_abs = _sds((k, B), jnp.int32)
        flip_abs = _sds((k, B) + trail, jnp.bool_)

    steps = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d,
                                group_plan=(module_labels, body_labels),
                                mesh=mesh, gather=gather)

    progs: List[Tuple[str, Any, tuple, dict]] = []
    progs.append(("calibrate", steps["calibrate"],
                  (gv, real_abs, rz_abs, amps_abs, key0), {}))

    if use_cache and k > 1:
        if gan and "gan_scan_cache_step" in steps:
            progs.append(("gan_scan_cache_step", steps["gan_scan_cache_step"],
                          (gv, dv, og, od, *store_abs, idx_abs, flip_abs,
                           amps_abs, key0, 0), {}))
        elif not gan:
            progs.append(("vae_scan_cache_step", steps["vae_scan_cache_step"],
                          (gv, og, *store_abs, idx_abs, flip_abs, amps_abs,
                           key0, 0), {}))
    elif k > 1 and mesh is not None:
        pass  # host-loader scan chunks are stacked from sharded batches
        #       eagerly (trainer._load_chunk) — their committed sharding is
        #       compiler-chosen, so a prediction here would likely miss;
        #       calibrate (below loop) still precompiles
    elif k > 1:
        keys_abs = _sds((k,) + np.shape(key0), key0.dtype)
        reals_abs = _sds((k,) + real_shape)
        rzs_abs = _sds((k,) + zero_batch_shape)
        if gan:
            noises_abs = _sds((k,) + z_init)
            progs.append(("gan_scan_step", steps["gan_scan_step"],
                          (gv, dv, og, od, reals_abs, rzs_abs, noises_abs,
                           amps_abs, keys_abs), {}))
        else:
            progs.append(("vae_scan_step", steps["vae_scan_step"],
                          (gv, og, reals_abs, rzs_abs, amps_abs, keys_abs),
                          {}))
    else:
        if gan:
            progs.append(("gan_step", steps["gan_step"],
                          (gv, dv, og, od, real_abs, rz_abs, _sds(z_init),
                           amps_abs, key0), {}))
        else:
            progs.append(("vae_step", steps["vae_step"],
                          (gv, og, real_abs, rz_abs, amps_abs, key0), {}))

    if use_cache:
        # iteration-0 calibration batch comes from loader.__next__ -> the
        # standalone chunk-gather program (k=1 rows)
        from ..data import device_cache as dc
        idx1 = _sds((1, B), jnp.int32)
        flip1 = _sds((1, B) + (1,) * (4 if ndim == 3 else 3), jnp.bool_)
        if ndim == 3:
            progs.append(("gather_chunk", dc._gather_chunk,
                          (*store_abs, idx1, flip1),
                          dict(hflip=hflip, **kw)))
        else:
            progs.append(("gather_chunk_2d", dc._gather_chunk_2d,
                          (*store_abs, idx1, flip1), dict(hflip=hflip)))

    if cfg.visualize:
        noise_abs = _sds(z_init)
        progs.append(("sample", steps["sample"],
                      (gv, noise_abs, amps_abs, key0), dict(train=True)))
        progs.append(("reconstruct", steps["reconstruct"],
                      (gv, rz_abs, amps_abs, key0), {}))
    return progs


def _predicted_n_amps(cfg, scale_idx: int) -> int:
    """Noise_Amps length the trainer will see at ``scale_idx`` iteration 0:
    one more than now unless a resumed run's list already covers it
    (trainer.py calibration block)."""
    n = len(cfg.Noise_Amps)
    return n if n >= scale_idx + 1 else scale_idx + 1


def _run(cfg, G, gvars_abs, dataset, scale_idx: int, ndim: int) -> None:
    log = logging.getLogger("hpvaegan_tpu")
    t0 = time.monotonic()
    n_amps = _predicted_n_amps(cfg, scale_idx)
    compiled = 0
    try:
        while True:
            progs = build_programs(cfg, G, gvars_abs, dataset, scale_idx,
                                   ndim, n_amps)
            try:
                for _name, fn, args, kwargs in progs[compiled:]:
                    fn.lower(*args, **kwargs).compile()
                    compiled += 1
                break
            except Exception as e:
                if not is_hbm_oom(e):
                    raise
                what = escalate(cfg)
                if what is None:
                    raise
                log.warning(
                    f"compile-ahead scale {scale_idx}: step does not fit "
                    f"HBM — enabling {what} (discovered off the critical "
                    f"path)")
                compiled = 0  # flags changed: every program re-lowers
        log.info(f"compile-ahead scale {scale_idx}: {len(progs)} programs "
                 f"ready in {time.monotonic() - t0:.1f}s")
    except Exception as e:  # never let a speculative compile kill training
        log.warning(f"compile-ahead for scale {scale_idx} failed "
                    f"(training unaffected): {e!r}")


def start_compile_ahead(cfg, G, gvars_abs, dataset, scale_idx: int,
                        ndim: int) -> Optional[threading.Thread]:
    """Kick off next-scale compilation in a daemon thread; returns the
    thread (the next ``train_scale`` joins it before its first dispatch) or
    None when compile-ahead does not apply."""
    if scale_idx > cfg.stop_scale:
        return None
    if getattr(cfg, "resumed_idx", -1) == scale_idx:
        return None  # growth is skipped on the resumed scale
    t = threading.Thread(target=_run,
                         args=(cfg, G, gvars_abs, dataset, scale_idx, ndim),
                         daemon=True, name=f"compile-ahead-{scale_idx}")
    t.start()
    return t
