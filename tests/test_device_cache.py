"""Device-resident frame cache (data/device_cache.py): the gathered
batches must be value-identical to the host loader's slice/flip path
(datasets/video.py:44-66 / datasets/image.py:40-63 semantics)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.data import (DeviceCacheLoader, SingleImageDataset,
                               SingleVideoDataset, supports_device_cache)
from hpvaegan_tpu.data.device_cache import _gather_chunk

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _video_ds():
    cfg = Config(video_path=os.path.join(ASSETS, "test_video.avi"),
                 img_size=16, min_size=8, max_size=16)
    cfg.adjust_scales()
    return cfg, SingleVideoDataset(cfg)


def _image_ds():
    cfg = Config(image_path=os.path.join(ASSETS, "test_image.png"),
                 img_size=16, min_size=8, max_size=16)
    cfg.adjust_scales()
    return cfg, SingleImageDataset(cfg)


@pytest.mark.parametrize("scale_idx", [0, 2])
@pytest.mark.parametrize("hflip", [False, True])
def test_video_gather_matches_host_get(scale_idx, hflip):
    cfg, ds = _video_ds()
    cfg.hflip = True  # the kernel's flip path must be built either way
    assert supports_device_cache(ds)
    cur, zero, n_start, kw = ds.device_cache_views(scale_idx)
    kw = dict(kw)
    kw.pop("virtual_len")
    for idx in (0, 3, n_start - 1):
        idxs = jnp.asarray([[idx]], jnp.int32)
        flips = jnp.full((1, 1, 1, 1, 1, 1), hflip)
        reals, rzs = _gather_chunk(jnp.asarray(cur), jnp.asarray(zero),
                                   idxs, flips, **kw)
        # host reference path
        cfg.scale_idx = scale_idx
        cfg.fps_index = ds.pyramid.fps_index(scale_idx)
        clip, zpair = ds.get(idx, hflip=hflip, scale_idx=scale_idx)
        np.testing.assert_allclose(np.asarray(reals[0, 0]), clip, atol=0)
        expect_zero = clip if zpair is None else zpair
        np.testing.assert_allclose(np.asarray(rzs[0, 0]), expect_zero,
                                   atol=0)


def test_video_loader_chunk_shapes_and_pairing():
    cfg, ds = _video_ds()
    scale_idx = 2
    loader = DeviceCacheLoader(ds, batch_size=2, seed=7, scale_idx=scale_idx)
    reals, rzs = loader.next_chunk(3)
    td = ds.pyramid.td(scale_idx)
    h, w = ds.pyramid.shape2d(scale_idx)
    h0, w0 = ds.pyramid.shape2d(0)
    assert reals.shape == (3, 2, td, h, w, 3)
    assert rzs.shape == (3, 2, cfg.fps_lcm // cfg.sampling_rates[0] + 1,
                         h0, w0, 3)
    # pair shares the start index: frame 0 of the zero clip == the raw
    # zero-scale frame at the same index the current clip started at
    single = next(loader)
    assert single[0].shape == (2, td, h, w, 3)


def test_image_gather_matches_host_get():
    cfg, ds = _image_ds()
    for scale_idx in (0, 2):
        loader = DeviceCacheLoader(ds, batch_size=2, seed=3,
                                   scale_idx=scale_idx)
        reals, rzs = loader.next_chunk(2)
        h, w = ds.pyramid.shape2d(scale_idx)
        assert reals.shape == (2, 2, h, w, 3)
        cur, zpair = ds.get(0, scale_idx, hflip=False)
        np.testing.assert_allclose(np.asarray(reals[0, 0]), cur, atol=0)
        expect_zero = cur if zpair is None else zpair
        np.testing.assert_allclose(np.asarray(rzs[0, 0]), expect_zero,
                                   atol=0)


def test_fused_scan_cache_step_matches_unfused():
    """steps.py gan_scan_cache_step (gather + RNG inside the scanned
    dispatch) must replicate the unfused gan_scan_step fed the same
    gathered batches and the trainer's fold_in/split key stream."""
    from hpvaegan_tpu.core.pyramid import Pyramid
    from hpvaegan_tpu.models.registry import make_discriminator, \
        make_generator
    from hpvaegan_tpu.train.optim import (build_d_optimizer,
                                          build_g_optimizer, dparams_view,
                                          gparams_view, hpvaegan_group_plan)
    from hpvaegan_tpu.train.steps import make_hpvaegan_steps
    from hpvaegan_tpu.train.trainer import init_discriminator

    cfg, ds = _video_ds()
    cfg.nfc, cfg.latent_dim, cfg.num_layer, cfg.enc_blocks = 8, 8, 2, 1
    cfg.vae_levels, cfg.batch_size = 1, 2
    scale = 2
    cfg.scale_idx = scale
    pyr = ds.pyramid
    h0, w0 = pyr.shape2d(0)
    cfg.td = pyr.td(0)
    cfg.Z_init_size = [2, cfg.td, h0, w0, cfg.latent_dim]

    key = jax.random.PRNGKey(4)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 3)
    gvars = G.init(key, 1)
    for i in range(scale):
        gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 100 + i))
    D = make_discriminator("WDiscriminator3D", cfg, 3)
    dvars = init_discriminator(D, jax.random.fold_in(key, 1),
                               (2, *pyr.shape3d(scale), 3))
    ml, bl, lrs = hpvaegan_group_plan(cfg, scale, len(gvars["body"]))
    tx_g, opt_g = build_g_optimizer(cfg, gparams_view(gvars), ml, bl, lrs,
                                    cfg.grad_clip)
    tx_d, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
    amps = jnp.full(scale + 1, 0.1, jnp.float32)

    loader = DeviceCacheLoader(ds, batch_size=2, seed=5, scale_idx=scale)
    gather = loader.sample_gather()
    steps_f = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d,
                                  group_plan=(ml, bl), gather=gather)
    steps_u = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d,
                                  group_plan=(ml, bl))
    assert "gan_scan_cache_step" in steps_f

    k, it0 = 3, 5
    idxs_h, flips_h = loader.draw(k)
    idxs, flips = jnp.asarray(idxs_h), jnp.asarray(flips_h)
    skey = jax.random.fold_in(key, 77)

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    out_f = steps_f["gan_scan_cache_step"](
        copy(gvars), copy(dvars), copy(opt_g), copy(opt_d), *loader.stores,
        idxs, flips, amps, skey, it0)

    # unfused replica: same batches, trainer-style key/noise construction
    gb = jax.vmap(jax.vmap(gather, in_axes=(None, None, 0, 0)),
                  in_axes=(None, None, 0, 0))
    reals, rzs = gb(*loader.stores, idxs, flips)
    its = jnp.arange(it0, it0 + k)
    ck = jax.vmap(lambda j: jax.random.split(jax.random.fold_in(skey, j),
                                             3))(its)
    noise_inits = jax.vmap(lambda nk: jax.random.normal(
        nk, tuple(cfg.Z_init_size)))(ck[:, 0])
    out_u = steps_u["gan_scan_step"](
        copy(gvars), copy(dvars), copy(opt_g), copy(opt_d), reals, rzs,
        noise_inits, amps, ck[:, 1])

    # per-iteration metric stacks must agree (later iterations compound
    # param updates, so allow loose float-reassociation tolerance there)
    for name in out_f[-1]:
        a = np.asarray(out_f[-1][name])
        b = np.asarray(out_u[-1][name])
        np.testing.assert_allclose(a[0], b[0], rtol=1e-4, atol=1e-5,
                                   err_msg=f"{name}[0]")
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-3,
                                   err_msg=name)


def test_hflip_draws_vary_per_sample():
    """With --hflip, the per-sample Bernoulli(0.5) draws must produce BOTH
    orientations across a 16-sample chunk (shared-flip pair semantics are
    covered by test_video_gather_matches_host_get)."""
    cfg, ds = _video_ds()
    cfg.hflip = True
    loader = DeviceCacheLoader(ds, batch_size=2, seed=11, scale_idx=1)
    reals, _ = loader.next_chunk(8)
    arr = np.asarray(reals)
    base = np.asarray(ds.frames)  # scale-1 store, unflipped
    unflipped = flipped = 0
    for frame0 in arr[:, :, 0].reshape(-1, *arr.shape[3:]):
        if any(np.array_equal(frame0, f) for f in base):
            unflipped += 1
        elif any(np.array_equal(frame0, f[:, ::-1]) for f in base):
            flipped += 1
        else:  # must match one of the two orientations exactly
            raise AssertionError("gathered frame matches no source frame")
    assert unflipped >= 1 and flipped >= 1


def test_draw_stream_is_pure_in_iteration():
    """The index/flip stream must be a pure function of (seed, iteration):
    a loader started at iteration j draws exactly what a fresh loader
    draws for its rows j.. — the property mid-scale resume
    (--save-interval) relies on for bit-exact continuation."""
    cfg, ds = _video_ds()
    cfg.hflip = True
    a = DeviceCacheLoader(ds, batch_size=2, seed=9, scale_idx=1)
    idxs_a, flips_a = a.draw(8)

    b = DeviceCacheLoader(ds, batch_size=2, seed=9, scale_idx=1,
                          start_iteration=3)
    idxs_b, flips_b = b.draw(5)
    np.testing.assert_array_equal(idxs_a[3:], idxs_b)
    np.testing.assert_array_equal(flips_a[3:], flips_b)

    # chunk-split independence: 3+5 draws == one 8-draw
    c = DeviceCacheLoader(ds, batch_size=2, seed=9, scale_idx=1)
    i1, f1 = c.draw(3)
    i2, f2 = c.draw(5)
    np.testing.assert_array_equal(np.concatenate([i1, i2]), idxs_a)
    np.testing.assert_array_equal(np.concatenate([f1, f2]), flips_a)

    # different seed -> different stream (sanity that the key matters)
    d = DeviceCacheLoader(ds, batch_size=2, seed=10, scale_idx=1)
    idxs_d, flips_d = d.draw(8)
    assert not (np.array_equal(idxs_a, idxs_d)
                and np.array_equal(flips_a, flips_d))


def test_draw_stream_epoch_semantics():
    """Shuffled-epoch semantics survive the pure re-keying: within one
    epoch every full batch is disjoint (drop_last, no replacement)."""
    cfg, ds = _video_ds()
    loader = DeviceCacheLoader(ds, batch_size=2, seed=1, scale_idx=1)
    n = loader._data_rep_len
    per_epoch = n // 2
    idxs, _ = loader.draw(per_epoch)
    virt = []
    # reconstruct the virtual draws via the epoch permutation directly
    perm = loader._epoch_perm(0)
    for j in range(per_epoch):
        virt.extend(perm[j * 2:(j + 1) * 2])
    assert len(set(virt)) == len(virt)  # epoch 0 is a permutation slice
    np.testing.assert_array_equal(
        idxs.ravel(), (np.asarray(virt) % loader._n_start).astype(np.int32))
