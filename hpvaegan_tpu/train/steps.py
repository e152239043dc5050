"""Jitted per-scale training steps.

Each scale gets its own compiled step functions (shapes legitimately change
per scale — ~10 distinct programs per run, reference call stack
train_video.py:111-202).  Everything inside a step — both generator
forwards, the critic update including the WGAN-GP double-backprop, gradient
clipping, Adam — compiles into ONE fused XLA program per phase, replacing
the reference's eager op-by-op loop.

Replication notes (torch semantics preserved):
* Spectral-norm power iteration runs once per optimization step on the
  weights alone (torch runs its pre-forward hook on every forward — up to 4x
  per iteration; documented deviation, same fixed point).
* The same rand-mode noise key is used for the critic-step fake and the
  generator-step fake, so both see the identical sample like the reference's
  shared ``fake`` tensor (train_video.py:174-193).
* The generator's adversarial term uses the critic AFTER its Adam update,
  exactly like the reference's sequential D-then-G step ordering.
* BatchNorm train-mode outputs depend only on the current batch, so the
  reference's running-stat update ordering does not affect training math;
  running averages here are threaded rec-forward -> rand-forward (the
  gradient-penalty forward does not contribute a stats update — deviation).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import (calc_gradient_penalty, kl_bern_criterion, kl_criterion,
                      mse)
from ..models.blocks import spectral_update
from .optim import (dparams_view, gparams_view, merge_dparams, merge_gparams,
                    scatter_grads, trainable_merge, trainable_split)

__all__ = ["apply_disc", "update_g_spectral", "make_hpvaegan_steps",
           "make_baseline_steps"]


def apply_disc(D, dvars: Dict[str, Any], x: jnp.ndarray, train: bool,
               remat: bool = False, cfg=None):
    """Critic forward; threads batch_stats for the baselines critic.

    ``remat`` wraps the forward in ``jax.checkpoint`` so the WGAN-GP
    double-backprop recomputes the critic's internal activations instead of
    keeping them live — required to fit the largest pyramid scales in HBM.

    ``cfg`` (passed by the hpvaegan steps only): with cfg.wpack and a
    qualifying shape, the SN critic runs the width-packed execution path
    (models/packed.py) — numerically equivalent, full-MXU-tile convs."""
    blocks = (remat == "blocks")

    if cfg is not None and "spectral" in dvars:
        from ..models.packed import wdisc_apply_packed, wpack_ok
        if wpack_ok(cfg, x.shape):
            def pfwd(dvars, x):
                return wdisc_apply_packed(dvars, x, num_layer=D.num_layer,
                                          dtype=D.dtype,
                                          blocks_remat=blocks), dvars
            if remat:
                pfwd = jax.checkpoint(pfwd)
            return pfwd(dvars, x)

    def fwd(dvars, x):
        if "batch_stats" in dvars:
            if train:
                out, upd = D.apply(dvars, x, True, blocks,
                                   mutable=["batch_stats"])
                return out, {**dvars, **upd}
            return D.apply(dvars, x, False, blocks), dvars
        return D.apply(dvars, x, blocks), dvars

    if remat:
        fwd = jax.checkpoint(fwd)
    return fwd(dvars, x)


def update_g_spectral(gvars: Dict[str, Any]) -> Dict[str, Any]:
    """One power-iteration step for every SN conv owned by the generator
    (the encoder's FeatureExtractor)."""
    out = dict(gvars)
    for key, val in gvars.items():
        if key != "body" and isinstance(val, dict) and "spectral" in val:
            out[key] = {**val,
                        "spectral": spectral_update(val["params"],
                                                    val["spectral"])}
    return out


def update_d_spectral(dvars: Dict[str, Any]) -> Dict[str, Any]:
    if "spectral" in dvars:
        return {**dvars, "spectral": spectral_update(dvars["params"],
                                                     dvars["spectral"])}
    return dvars


# ---------------------------------------------------------------------------
# HP-VAE-GAN steps (train_image.py / train_video.py)
# ---------------------------------------------------------------------------

def make_hpvaegan_steps(G, D, cfg, tx_g: optax.GradientTransformation,
                        tx_d: Optional[optax.GradientTransformation],
                        group_plan=None, mesh=None, gather=None):
    """Build the jitted (calibrate, vae_step, gan_step, sample) functions for
    one scale.  G is a generator orchestrator, D a critic module (or None in
    the VAE phase).

    ``group_plan`` = (module_labels, body_labels) from the optimizer plan.
    With cfg.fast_grads it enables differentiating ONLY the trainable
    subtree: XLA dead-code-eliminates the backward pass through frozen
    stages.  Deviation from exact reference parity: the global grad-clip
    norm then covers trainable grads only (the reference's frozen-but-
    reachable stages contribute to its clip norm, train_video.py:201).

    ``mesh``: when given (--spmd), batch inputs and the generated fake get
    in-step uneven sharding constraints (parallel/mesh.spatial_constraint)
    so activations span the 'spatial' mesh axis even when H is not
    divisible by it — the replacement for the reference's DataParallel
    scatter (train_video.py:91-96)."""
    from ..parallel import spatial_constraint

    def shard_act(x):
        return spatial_constraint(x, mesh)

    # inter-stage upscales re-anchor the spatial sharding inside G.apply
    # (resize = dense H-mixing matmul; propagation alone loses the split).
    # G.mesh is read at first-trace time, so only set it when explicit: a
    # later mesh-less builder for the same G (e.g. a benchmark step set)
    # must not clobber an --spmd run's constraint anchoring.
    if mesh is not None or getattr(G, "mesh", None) is None:
        G.mesh = mesh
    # --pconv composes with --spmd via the shard_map+halo kernel wrapper
    # (ops/pallas/conv3d_spmd.py): plumb the mesh into the pconv-routed
    # modules the same way pconv itself is plumbed — as a flax field
    if mesh is not None:
        if D is not None and getattr(D, "pconv", False):
            D = D.clone(mesh=mesh)
        stage_def = getattr(G, "stage_def", None)
        if stage_def is not None and getattr(stage_def, "pconv", False) \
                and getattr(stage_def, "mesh", None) is not mesh:
            G.stage_def = stage_def.clone(mesh=mesh)

    rec_weight = cfg.rec_weight
    kl_weight = cfg.kl_weight
    disc_w = cfg.disc_loss_weight
    lambda_grad = cfg.lambda_grad
    use_fast = bool(getattr(cfg, "fast_grads", False)) and group_plan is not None
    use_fused = bool(getattr(cfg, "fused_forwards", False)) \
        and hasattr(G, "apply_fused")
    from ..models.generators import _remat_level
    use_remat = _remat_level(cfg)
    # False | True (lax.map) | "unroll" — preserve the mode, not just truthiness
    use_chunked = getattr(cfg, "gp_chunked", False)

    # Frozen-prefix hoist (--hoist-prefix with --fast-grads, GAN phase): when the
    # encoder/decoder and a contiguous prefix of body stages are all frozen,
    # the generator-step rand forward's prefix is value-identical to the
    # critic-step fake's (same params + same key by construction,
    # train_video.py:174-193's shared `fake`), and constant w.r.t. every
    # trainable param — so it is computed ONCE per iteration instead of
    # twice.  Gradients are bit-identical (prefix activations enter the VJP
    # as constants either way).  Deviation: frozen-prefix BatchNorm running
    # averages then see only the rec forward's update (training math never
    # reads running stats — PARITY.md).
    # Measured at the bench shape (scale-5 3D GAN, fast stack): flat — the
    # compiled program is FLOP-identical with/without the hoist because XLA
    # CSE already eliminates the duplicated frozen-prefix computation inside
    # the single jitted step (BENCHMARKS.md "frozen-prefix hoist").  Kept as
    # an opt-in for regimes where CSE might not fire.
    hoist_idx = None
    if use_fast and getattr(cfg, "hoist_prefix", False) \
            and hasattr(G, "apply_prefix"):
        ml_, bl_ = group_plan
        trainable_body = [i for i, lab in enumerate(bl_) if lab != "frozen"]
        if (all(lab == "frozen" for lab in ml_.values()) and trainable_body
                and trainable_body[0] >= 1
                and all(lab != "frozen"
                        for lab in bl_[trainable_body[0]:])):
            hoist_idx = trainable_body[0]

    def g_value_and_grad(gvars, loss_of_pview):
        """value_and_grad over the full params view, or — fast path — over
        the trainable subtree only, scattered back to full structure."""
        pview = gparams_view(gvars)
        if not use_fast:
            (val, aux), grads = jax.value_and_grad(
                loss_of_pview, has_aux=True)(pview)
            return (val, aux), grads, pview
        train_sub, frozen_sub = trainable_split(pview, *group_plan)

        def loss_of_trainable(tsub):
            return loss_of_pview(trainable_merge(pview, tsub, frozen_sub))

        (val, aux), tgrads = jax.value_and_grad(
            loss_of_trainable, has_aux=True)(train_sub)
        return (val, aux), scatter_grads(pview, tgrads), pview

    @jax.jit
    def calibrate(gvars, real, real_zero, amps, key):
        """Noise-amp RMSE probe (train_video.py:131-145): rec forward in
        train mode, returns sqrt(MSE(real, reconstruction))."""
        real, real_zero = shard_act(real), shard_act(real_zero)
        (out, _, _), new_gvars = G.apply(gvars, amps, key,
                                         real_zero=real_zero, mode="rec",
                                         train=True)
        return jnp.sqrt(mse(real, out)), new_gvars

    def _vae_body(gvars, opt_g, real, real_zero, amps, key):
        real, real_zero = shard_act(real), shard_act(real_zero)
        gvars = update_g_spectral(gvars)

        def loss_fn(params_view):
            gv = merge_gparams(gvars, params_view)
            (generated, generated_vae, stats), gv_new = G.apply(
                gv, amps, key, real_zero=real_zero, mode="rec", train=True)
            if len(stats) == 3:
                # GeneratorVAE_nb: Bernoulli-gated latent.  EXTENSION — the
                # reference trainers crash unpacking this 3-tuple
                # (train_video.py:147 vs networks_3d.py:465); its losses
                # module ships kl_bern_criterion (modules/losses.py:12-14)
                # for exactly this term, so we wire it.
                mu, logvar, bern = stats
                kl = kl_criterion(mu, logvar) + kl_bern_criterion(bern)
            else:
                mu, logvar = stats
                kl = kl_criterion(mu, logvar)
            rec_vae = mse(generated, real) + mse(generated_vae, real_zero)
            total = rec_weight * rec_vae + kl_weight * kl
            return total, (rec_vae, kl, gv_new)

        (total, (rec_vae, kl, gv_new)), grads, pview = g_value_and_grad(
            gvars, loss_fn)
        updates, opt_g = tx_g.update(grads, opt_g, pview)
        new_params = optax.apply_updates(pview, updates)
        gvars = merge_gparams(gv_new, new_params)
        metrics = {"loss": total, "rec_vae_loss": rec_vae, "kl_loss": kl}
        return gvars, opt_g, metrics

    # Buffer donation: the previous step's params/optimizer/state buffers are
    # dead after each call — donating them lets XLA update in place instead
    # of allocating fresh HBM every iteration.
    vae_step = functools.partial(jax.jit, donate_argnums=(0, 1))(_vae_body)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def vae_scan_step(gvars, opt_g, reals, real_zeros, amps, keys):
        """K iterations in one dispatch (lax.scan) — amortizes per-step
        overhead; batches are pre-stacked (K, B, ...)."""
        def body(carry, xs):
            gv, og = carry
            real, rz, k = xs
            gv, og, m = _vae_body(gv, og, real, rz, amps, k)
            return (gv, og), m

        (gvars, opt_g), ms = jax.lax.scan(body, (gvars, opt_g),
                                          (reals, real_zeros, keys))
        # full per-iteration metric stack (K,) — the trainer logs every
        # iteration at its true index, so TB curve density is independent
        # of the scan depth (reference logs per-iter, train_video.py:210-223)
        return gvars, opt_g, ms

    def _gan_body(gvars, dvars, opt_g, opt_d, real, real_zero, noise_init,
                  amps, key):
        real, real_zero = shard_act(real), shard_act(real_zero)
        noise_init = shard_act(noise_init)
        k_fake, k_gp, k_rec = jax.random.split(key, 3)
        gvars = update_g_spectral(gvars)
        dvars = update_d_spectral(dvars)

        # ---- critic step (train_video.py:168-183) ----
        # Fusion needs matching decoder-input geometry: the preserved
        # Z_init_size quirk (td of the FIRST scale trained in this process)
        # can give noise_init a different temporal dim than real_zero after
        # a resume — fall back to the unfused path for that shape combo.
        fusable = (use_fused
                   and noise_init.shape[1:-1] == real_zero.shape[1:-1])
        x_pre_rand = key_sfx = None
        if fusable:
            (_, fake, _, _), _ = G.apply_fused(gvars, amps, k_fake,
                                               real_zero, noise_init,
                                               train=True)
        elif hoist_idx is not None:
            # split the fake forward at the frozen/trainable boundary so the
            # prefix activation can be reused by the generator step below —
            # the threaded key keeps the noise stream bit-identical to the
            # unsplit G.apply
            (x_pre_rand, _, _, key_sfx), _ = G.apply_prefix(
                gvars, amps, k_fake, noise_init=noise_init, mode="rand",
                train=True, upto=hoist_idx)
            fake, _ = G.apply_suffix(gvars, amps, key_sfx, x_pre_rand,
                                     hoist_idx, mode="rand", train=True)
        else:
            (fake, _, _), _ = G.apply(gvars, amps, k_fake,
                                      noise_init=noise_init, mode="rand",
                                      train=True)
        fake = shard_act(jax.lax.stop_gradient(fake))
        nb = real.shape[0]

        def d_loss_fn(dparams):
            dv = merge_dparams(dvars, dparams)
            if "batch_stats" not in dvars:
                # SN critic has no normalization state: real+fake batch into
                # one forward (identical math, half the dispatches)
                out, dv = apply_disc(D, dv,
                                     jnp.concatenate([real, fake], axis=0),
                                     train=True, remat=use_remat, cfg=cfg)
                errD_real = -jnp.mean(out[:nb])
                errD_fake = jnp.mean(out[nb:])
            else:
                out_real, dv = apply_disc(D, dv, real, train=True, remat=use_remat, cfg=cfg)
                errD_real = -jnp.mean(out_real)
                out_fake, dv = apply_disc(D, dv, fake, train=True, remat=use_remat, cfg=cfg)
                errD_fake = jnp.mean(out_fake)
            # the GP's reverse-over-reverse is measured FASTER through
            # XLA's native double-backprop than through the packed Pallas
            # kernel's recursive custom_vjp (BENCHMARKS.md r2 pconv A/B:
            # gp_grads 307 -> 471 ms), so the penalty term always runs the
            # lax critic; variable trees are identical by construction
            D_gp = (D.clone(pconv=False, pfuse=False)
                    if getattr(D, "pconv", False)
                    or getattr(D, "pfuse", False) else D)
            gp = calc_gradient_penalty(
                lambda x: apply_disc(D_gp, dv, x, train=True, remat=use_remat, cfg=cfg)[0],
                real, fake, lambda_grad, k_gp,
                chunked=use_chunked if "batch_stats" not in dvars else False)
            return errD_real + errD_fake + gp, (errD_real, errD_fake, gp, dv)

        dview = dparams_view(dvars)
        (_, (errD_real, errD_fake, gp, dv_new)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True)(dview)
        upd_d, opt_d = tx_d.update(grads_d, opt_d, dview)
        dvars = merge_dparams(dv_new, optax.apply_updates(dview, upd_d))

        # ---- generator step with the UPDATED critic ----
        def g_loss_fn(params_view):
            gv = merge_gparams(gvars, params_view)
            if fusable:
                (generated, fake_g, _, _), gv2 = G.apply_fused(
                    gv, amps, k_fake, real_zero, noise_init, train=True)
            elif hoist_idx is not None:
                # frozen-prefix hoist: the rand forward's prefix is the
                # critic step's x_pre_rand (identical values — same frozen
                # params, same k_fake stream), entering this VJP as a
                # constant exactly like the frozen params it came from
                (generated, _, _), gv1 = G.apply(gv, amps, k_rec,
                                                 real_zero=real_zero,
                                                 mode="rec", train=True)
                fake_g, gv2 = G.apply_suffix(gv1, amps, key_sfx, x_pre_rand,
                                             hoist_idx, mode="rand",
                                             train=True)
            else:
                (generated, _, _), gv1 = G.apply(gv, amps, k_rec,
                                                 real_zero=real_zero,
                                                 mode="rec", train=True)
                (fake_g, _, _), gv2 = G.apply(gv1, amps, k_fake,
                                              noise_init=noise_init,
                                              mode="rand", train=True)
            rec = mse(generated, real)
            out_fake, _ = apply_disc(D, dvars, fake_g, train=True, remat=use_remat, cfg=cfg)
            errG = -jnp.mean(out_fake) * disc_w
            total = rec_weight * rec + errG
            return total, (rec, errG, gv2)

        (total, (rec, errG, gv_new)), grads_g, pview = g_value_and_grad(
            gvars, g_loss_fn)
        upd_g, opt_g = tx_g.update(grads_g, opt_g, pview)
        gvars = merge_gparams(gv_new, optax.apply_updates(pview, upd_g))

        metrics = {"loss": total, "rec_loss": rec, "errG": errG,
                   "errD_real": errD_real, "errD_fake": errD_fake,
                   "gradient_penalty": gp}
        return gvars, dvars, opt_g, opt_d, metrics

    gan_step = functools.partial(jax.jit,
                                 donate_argnums=(0, 1, 2, 3))(_gan_body)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def gan_scan_step(gvars, dvars, opt_g, opt_d, reals, real_zeros,
                      noise_inits, amps, keys):
        """K GAN iterations in one dispatch (lax.scan)."""
        def body(carry, xs):
            gv, dv, og, od = carry
            real, rz, ni, k = xs
            gv, dv, og, od, m = _gan_body(gv, dv, og, od, real, rz, ni,
                                          amps, k)
            return (gv, dv, og, od), m

        (gvars, dvars, opt_g, opt_d), ms = jax.lax.scan(
            body, (gvars, dvars, opt_g, opt_d),
            (reals, real_zeros, noise_inits, keys))
        # full per-iteration metric stack (K,) — see vae_scan_step
        return gvars, dvars, opt_g, opt_d, ms

    # ---- fused data path: gather + RNG INSIDE the scanned dispatch ----
    # With the device-resident frame cache (data/device_cache.py), a whole
    # K-iteration chunk becomes ONE device program: the frame stores ride
    # as scan constants, each iteration gathers its own batch and derives
    # its own keys/noise (bit-identical to the trainer's unfused
    # fold_in/split stream), and no (K, B, ...) staged-batch buffers are
    # ever materialized.  This removes the last per-chunk host dispatches
    # that bounded the sub-10 ms pyramid scales (BENCHMARKS.md "End-to-end
    # trainer throughput").
    cache_steps = {}
    if gather is not None:
        gather_b = jax.vmap(gather, in_axes=(None, None, 0, 0))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def vae_scan_cache_step(gvars, opt_g, cur, zero, idxs, flips, amps,
                                key, it0):
            def body(carry, xs):
                gv, og = carry
                idx, flip, i = xs
                real, rz = gather_b(cur, zero, idx, flip)
                k = jax.random.split(jax.random.fold_in(key, i), 3)[1]
                gv, og, m = _vae_body(gv, og, real, rz, amps, k)
                return (gv, og), m

            its = it0 + jnp.arange(idxs.shape[0], dtype=jnp.int32)
            (gvars, opt_g), ms = jax.lax.scan(body, (gvars, opt_g),
                                              (idxs, flips, its))
            return gvars, opt_g, ms

        cache_steps["vae_scan_cache_step"] = vae_scan_cache_step

        z_init_size = tuple(getattr(cfg, "Z_init_size", ()) or ())
        if D is not None and z_init_size:
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def gan_scan_cache_step(gvars, dvars, opt_g, opt_d, cur, zero,
                                    idxs, flips, amps, key, it0):
                def body(carry, xs):
                    gv, dv, og, od = carry
                    idx, flip, i = xs
                    real, rz = gather_b(cur, zero, idx, flip)
                    ks = jax.random.split(jax.random.fold_in(key, i), 3)
                    noise = jax.random.normal(ks[0], z_init_size)
                    gv, dv, og, od, m = _gan_body(gv, dv, og, od, real, rz,
                                                  noise, amps, ks[1])
                    return (gv, dv, og, od), m

                its = it0 + jnp.arange(idxs.shape[0], dtype=jnp.int32)
                (gvars, dvars, opt_g, opt_d), ms = jax.lax.scan(
                    body, (gvars, dvars, opt_g, opt_d), (idxs, flips, its))
                return gvars, dvars, opt_g, opt_d, ms

            cache_steps["gan_scan_cache_step"] = gan_scan_cache_step

    @functools.partial(jax.jit, static_argnames=("train",))
    def sample(gvars, noise_init, amps, key, train=True):
        """rand-mode generation (visualization path, train_video.py:226-241
        runs under no_grad with modules left in train mode — BN uses the
        sample batch's own stats).  State updates are discarded."""
        (fake, fake_vae, _), _ = G.apply(gvars, amps, key,
                                         noise_init=noise_init, mode="rand",
                                         train=train)
        return fake, fake_vae

    @jax.jit
    def reconstruct(gvars, real_zero, amps, key):
        (out, vae_out, stats), _ = G.apply(gvars, amps, key,
                                           real_zero=real_zero, mode="rec",
                                           train=True)
        return out, vae_out

    return dict(calibrate=calibrate, vae_step=vae_step, gan_step=gan_step,
                vae_scan_step=vae_scan_step, gan_scan_step=gan_scan_step,
                sample=sample, reconstruct=reconstruct, **cache_steps)


# ---------------------------------------------------------------------------
# Baseline steps (train_video_baselines.py)
# ---------------------------------------------------------------------------

def make_baseline_steps(G, D, cfg, tx_g: optax.GradientTransformation,
                        tx_d: optax.GradientTransformation, mesh=None):
    """SinGAN/ConSinGAN pure-GAN steps: Dsteps critic loop, fixed Z_init
    reconstruction, Gsteps-times-applied generator update
    (train_video_baselines.py:24-173).  ``mesh``: see make_hpvaegan_steps."""
    from ..parallel import spatial_constraint

    def shard_act(x):
        return spatial_constraint(x, mesh)

    G.mesh = mesh

    alpha = cfg.alpha
    disc_w = cfg.disc_loss_weight
    lambda_grad = cfg.lambda_grad
    dsteps = cfg.Dsteps
    gsteps = cfg.Gsteps
    from ..models.generators import _remat_level
    use_remat = _remat_level(cfg)
    # False | True (lax.map) | "unroll" — preserve the mode, not just truthiness
    use_chunked = getattr(cfg, "gp_chunked", False)

    @jax.jit
    def calibrate(gvars, real, z_init, amps, key):
        out, new_gvars = G.apply(gvars, amps, key, noise_init=z_init,
                                 mode="rec", train=True)
        return jnp.sqrt(mse(real, out)), new_gvars

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step(gvars, dvars, opt_g, opt_d, real, noise_init, z_init, amps, key):
        real = shard_act(real)
        noise_init, z_init = shard_act(noise_init), shard_act(z_init)
        k_gp = jax.random.fold_in(key, 0)
        # the default baselines critic is the SN WDiscriminator3D
        # (train_video_baselines.py:233) — run its power iteration
        dvars = update_d_spectral(dvars)

        errD_real = errD_fake = gp = jnp.float32(0)
        fake = None
        # --- Dsteps critic updates; fake recomputed each inner step with the
        # same noise (train_video_baselines.py:126-150) ---
        for j in range(dsteps):
            fake, gvars = G.apply(gvars, amps, key, noise_init=noise_init,
                                  mode="rand", train=True)
            fake = shard_act(jax.lax.stop_gradient(fake))

            def d_loss_fn(dparams, fake=fake):
                dv = merge_dparams(dvars, dparams)
                out_real, dv = apply_disc(D, dv, real, train=True, remat=use_remat)
                e_real = -jnp.mean(out_real)
                out_fake, dv = apply_disc(D, dv, fake, train=True, remat=use_remat)
                e_fake = jnp.mean(out_fake)
                pen = calc_gradient_penalty(
                    lambda x: apply_disc(D, dv, x, train=True, remat=use_remat)[0],
                    real, fake, lambda_grad, jax.random.fold_in(k_gp, j),
                    chunked=use_chunked if "batch_stats" not in dvars else False)
                return e_real + e_fake + pen, (e_real, e_fake, pen, dv)

            dview = dparams_view(dvars)
            (_, (errD_real, errD_fake, gp, dv_new)), grads_d = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(dview)
            upd_d, opt_d = tx_d.update(grads_d, opt_d, dview)
            dvars = merge_dparams(dv_new, optax.apply_updates(dview, upd_d))

        # --- generator step (train_video_baselines.py:155-173) ---
        def g_loss_fn(params_view):
            gv = merge_gparams(gvars, params_view)
            fake_g, gv1 = G.apply(gv, amps, key, noise_init=noise_init,
                                  mode="rand", train=True)
            out_fake, _ = apply_disc(D, dvars, fake_g, train=True, remat=use_remat)
            errG = -jnp.mean(out_fake) * disc_w
            total = errG
            rec = jnp.float32(0)
            if alpha > 0:
                generated, gv1 = G.apply(gv1, amps, key, noise_init=z_init,
                                         mode="rec", train=True)
                rec = alpha * mse(generated, real)
                total = total + rec
            return total, (errG, rec, gv1)

        pview = gparams_view(gvars)
        (_, (errG, rec, gv_new)), grads_g = jax.value_and_grad(
            g_loss_fn, has_aux=True)(pview)
        # Gsteps repeated optimizer.step() on the SAME gradients
        # (train_video_baselines.py:172-173) — replicated literally.
        new_params = pview
        for _ in range(gsteps):
            upd_g, opt_g = tx_g.update(grads_g, opt_g, new_params)
            new_params = optax.apply_updates(new_params, upd_g)
        gvars = merge_gparams(gv_new, new_params)

        metrics = {"errG": errG, "rec_loss": rec, "errD_real": errD_real,
                   "errD_fake": errD_fake, "gradient_penalty": gp}
        return gvars, dvars, opt_g, opt_d, metrics

    @functools.partial(jax.jit, static_argnames=("mode",))
    def sample(gvars, noise_init, amps, key, mode="rand"):
        out, _ = G.apply(gvars, amps, key, noise_init=noise_init, mode=mode,
                         train=True)
        return out

    return dict(calibrate=calibrate, step=step, sample=sample)
