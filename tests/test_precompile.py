"""Compile-ahead (train/precompile.py): shape-spec fidelity, HLO identity
with the trainer's boundary lowering (the cache-hit guarantee), and an e2e
run proving --compile-ahead changes nothing about training math."""
import os
import sys

import jax
import numpy as np
import pytest

IMG = os.path.join(os.path.dirname(__file__), "assets", "test_image.png")
VID = os.path.join(os.path.dirname(__file__), "assets", "test_video.avi")

TINY = ["--image-path", IMG, "--img-size", "16", "--min-size", "8",
        "--max-size", "16", "--niter", "2", "--vae-levels", "2",
        "--nfc", "8", "--latent-dim", "8", "--num-layer", "2",
        "--enc-blocks", "1", "--batch-size", "2", "--manualSeed", "7"]


def _image_cfg(extra=()):
    from hpvaegan_tpu.core.config import build_parser, config_from_args
    cfg = config_from_args(build_parser("image").parse_args(
        TINY + list(extra)))
    cfg.adjust_scales()
    cfg.scale_idx = 0
    cfg.Noise_Amps = [1.0]
    return cfg


def test_image_spec_matches_views():
    from hpvaegan_tpu.data import SingleImageDataset
    cfg = _image_cfg()
    ds = SingleImageDataset(cfg)
    for s in (0, 1, 3):
        cur, zero, n_start, kw = ds.device_cache_views(s)
        cur_shape, zero_shape, n_start2, kw2 = ds.device_cache_spec(s)
        assert tuple(cur.shape) == cur_shape
        assert tuple(zero.shape) == zero_shape
        assert n_start == n_start2 and kw == kw2


def test_video_spec_matches_views():
    from hpvaegan_tpu.core.config import build_parser, config_from_args
    from hpvaegan_tpu.data import SingleVideoDataset
    cfg = config_from_args(build_parser("video").parse_args(
        ["--video-path", VID, "--img-size", "16", "--min-size", "8",
         "--max-size", "16", "--batch-size", "2"]))
    cfg.adjust_scales()
    ds = SingleVideoDataset(cfg)
    for s in (0, 1, 3):
        cur, zero, n_start, kw = ds.device_cache_views(s)
        cur_shape, zero_shape, n_start2, kw2 = ds.device_cache_spec(s)
        assert tuple(cur.shape) == cur_shape
        assert tuple(zero.shape) == zero_shape
        assert n_start == n_start2 and kw == kw2


def test_hlo_identical_to_boundary_lowering():
    """The precompiled hot program must trace to the SAME HLO the trainer
    lowers at the scale boundary — that equality IS the cache hit."""
    import jax.numpy as jnp
    from hpvaegan_tpu.data import SingleImageDataset
    from hpvaegan_tpu.data.device_cache import DeviceCacheLoader
    from hpvaegan_tpu.models.registry import (make_discriminator,
                                              make_generator)
    from hpvaegan_tpu.train.optim import (build_d_optimizer,
                                          build_g_optimizer, dparams_view,
                                          gparams_view, hpvaegan_group_plan)
    from hpvaegan_tpu.train.precompile import abstract_tree, build_programs
    from hpvaegan_tpu.train.steps import make_hpvaegan_steps
    from hpvaegan_tpu.train.trainer import init_discriminator

    cfg = _image_cfg(["--scan-steps", "2"])
    cfg.discriminator = "WDiscriminator2D"
    ds = SingleImageDataset(cfg)
    G = make_generator(cfg.generator, cfg, ds.pyramid, ndim=2)
    gvars = G.init(jax.random.PRNGKey(0), batch_size=1)
    h0, w0 = ds.pyramid.shape2d(0)
    cfg.Z_init_size = [cfg.batch_size, h0, w0, cfg.latent_dim]
    for i in range(2):
        gvars = G.init_next_stage(gvars, jax.random.PRNGKey(i))

    # --- precompile side: abstract lowering of scale 3's hot program ---
    progs = build_programs(cfg, G, abstract_tree(gvars), ds, 3, 2, 4)
    by_name = {name: (fn, args, kw) for name, fn, args, kw in progs}
    fn, args, kw = by_name["gan_scan_cache_step"]
    ahead_hlo = fn.lower(*args, **kw).as_text()

    # --- trainer side: concrete boundary construction for scale 3 ---
    gv3 = G.init_next_stage(gvars, jax.random.PRNGKey(3))
    D = make_discriminator(cfg.discriminator, cfg, 2)
    shape = (cfg.batch_size, *ds.pyramid.shape2d(3), cfg.nc_im)
    dvars = init_discriminator(D, jax.random.PRNGKey(4), shape)
    _, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
    tx_d, _ = build_d_optimizer(cfg, dparams_view(dvars))
    plan = hpvaegan_group_plan(cfg, 3, len(gv3["body"]))
    tx_g, opt_g = build_g_optimizer(cfg, gparams_view(gv3), plan[0], plan[1],
                                    plan[2], cfg.grad_clip)
    loader = DeviceCacheLoader(ds, cfg.batch_size, seed=0, scale_idx=3)
    steps = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d,
                                group_plan=(plan[0], plan[1]),
                                gather=loader.sample_gather())
    idxs, flips = loader.draw(2)
    amps = jnp.asarray([1.0, 0.1, 0.1, 0.1], jnp.float32)
    boundary_hlo = steps["gan_scan_cache_step"].lower(
        gv3, dvars, opt_g, opt_d, *loader.stores, jnp.asarray(idxs),
        jnp.asarray(flips), amps, jax.random.PRNGKey(5), 0).as_text()

    assert ahead_hlo == boundary_hlo


def _run_train_image(extra, run_dir):
    import train_image
    argv = (["train_image.py"] + TINY + ["--run-dir", str(run_dir)]
            + list(extra))
    old = sys.argv
    sys.argv = argv
    try:
        train_image.main()
    finally:
        sys.argv = old


def test_compile_ahead_e2e_identical(tmp_path):
    """--compile-ahead is pure overlap: a run with it produces bit-identical
    final parameters to a run without it."""
    from hpvaegan_tpu.utils.saver import restore_file
    _run_train_image([], tmp_path / "plain")
    _run_train_image(["--compile-ahead"], tmp_path / "ahead")
    a = restore_file(os.path.join(tmp_path, "plain", "test_image", "DEBUG",
                                  "experiment_0", "netG"))
    b = restore_file(os.path.join(tmp_path, "ahead", "test_image", "DEBUG",
                                  "experiment_0", "netG"))
    assert int(a["scale"]) == int(b["scale"]) == 4
    la = jax.tree_util.tree_leaves(a["gvars"])
    lb = jax.tree_util.tree_leaves(b["gvars"])
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hlo_identical_under_spmd_mesh():
    """--compile-ahead composes with --spmd: with the trainer's exact
    NamedShardings attached to the abstract avals, the precompiled sharded
    program lowers to the SAME HLO the trainer builds at the boundary."""
    import jax.numpy as jnp
    from hpvaegan_tpu.data import SingleImageDataset
    from hpvaegan_tpu.data.device_cache import DeviceCacheLoader
    from hpvaegan_tpu.models.registry import (make_discriminator,
                                              make_generator)
    from hpvaegan_tpu.parallel import (make_mesh, replicated_sharding,
                                       shard_gvars)
    from hpvaegan_tpu.train.optim import (build_d_optimizer,
                                          build_g_optimizer, dparams_view,
                                          gparams_view, hpvaegan_group_plan)
    from hpvaegan_tpu.train.precompile import abstract_tree, build_programs
    from hpvaegan_tpu.train.steps import make_hpvaegan_steps
    from hpvaegan_tpu.train.trainer import init_discriminator

    cfg = _image_cfg(["--scan-steps", "2", "--spmd", "--mesh-shape", "2x4"])
    cfg.discriminator = "WDiscriminator2D"
    ds = SingleImageDataset(cfg)
    G = make_generator(cfg.generator, cfg, ds.pyramid, ndim=2)
    gvars = G.init(jax.random.PRNGKey(0), batch_size=1)
    h0, w0 = ds.pyramid.shape2d(0)
    cfg.Z_init_size = [cfg.batch_size, h0, w0, cfg.latent_dim]
    for i in range(2):
        gvars = G.init_next_stage(gvars, jax.random.PRNGKey(i))

    progs = build_programs(cfg, G, abstract_tree(gvars), ds, 3, 2, 4)
    by_name = {name: (fn, args, kw) for name, fn, args, kw in progs}
    fn, args, kw = by_name["gan_scan_cache_step"]
    ahead_hlo = fn.lower(*args, **kw).as_text()

    # --- trainer side: concrete sharded boundary construction (trainer.py
    # "optional SPMD" block) ---
    mesh = make_mesh((2, 4))
    gv3 = G.init_next_stage(gvars, jax.random.PRNGKey(3))
    D = make_discriminator(cfg.discriminator, cfg, 2)
    shape = (cfg.batch_size, *ds.pyramid.shape2d(3), cfg.nc_im)
    dvars = init_discriminator(D, jax.random.PRNGKey(4), shape)
    tx_d, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
    plan = hpvaegan_group_plan(cfg, 3, len(gv3["body"]))
    tx_g, opt_g = build_g_optimizer(cfg, gparams_view(gv3), plan[0], plan[1],
                                    plan[2], cfg.grad_clip)
    gv3 = shard_gvars(gv3, mesh)
    opt_g = shard_gvars(opt_g, mesh)
    dvars = shard_gvars(dvars, mesh)
    opt_d = shard_gvars(opt_d, mesh)
    loader = DeviceCacheLoader(ds, cfg.batch_size, seed=0, scale_idx=3,
                               sharding=replicated_sharding(mesh))
    steps = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d,
                                group_plan=(plan[0], plan[1]), mesh=mesh,
                                gather=loader.sample_gather())
    idxs, flips = loader.draw(2)
    amps = jnp.asarray([1.0, 0.1, 0.1, 0.1], jnp.float32)
    boundary_hlo = steps["gan_scan_cache_step"].lower(
        gv3, dvars, opt_g, opt_d, *loader.stores, jnp.asarray(idxs),
        jnp.asarray(flips), amps, jax.random.PRNGKey(5), 0).as_text()

    assert ahead_hlo == boundary_hlo
