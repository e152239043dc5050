"""Noise generation and data pipeline tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.ops.noise import generate_noise

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def test_noise_shapes_and_types(key):
    ref = jnp.zeros((2, 4, 4, 3))
    n = generate_noise(key, ref=ref)
    assert n.shape == ref.shape and n.dtype == ref.dtype
    n = generate_noise(key, size=(2, 8, 8, 1))
    assert n.shape == (2, 8, 8, 1)
    # the reference's 'benoulli' typo is accepted (utils/images.py:51)
    b = generate_noise(key, size=(100, 100), type="benoulli")
    assert set(np.unique(np.asarray(b))) <= {0.0, 1.0}
    u = generate_noise(key, size=(100,), type="whatever")
    assert np.all((np.asarray(u) >= 0) & (np.asarray(u) <= 1))
    with pytest.raises(ValueError):
        generate_noise(key)


def test_noise_is_standard_normal(key):
    n = np.asarray(generate_noise(key, size=(100_000,)))
    assert abs(n.mean()) < 0.02
    assert abs(n.std() - 1.0) < 0.02


def _video_cfg():
    cfg = Config(video_path=os.path.join(ASSETS, "test_video.avi"),
                 img_size=16, min_size=8, max_size=16)
    cfg.adjust_scales()
    return cfg


def test_video_dataset_geometry():
    from hpvaegan_tpu.data import SingleVideoDataset
    cfg = _video_cfg()
    ds = SingleVideoDataset(cfg)
    assert cfg.org_fps == 24.0
    assert np.isclose(cfg.ar, 48 / 64)
    assert cfg.fps_lcm == 12
    # 40 frames - fps_lcm -> 28 items
    assert len(ds) == 28
    assert ds.zero_scale_frames.shape[0] == 40
    h0, w0 = ds.pyramid.shape2d(0)
    assert ds.zero_scale_frames.shape[1:] == (h0, w0, 3)
    assert ds.zero_scale_frames.min() >= -1.0
    assert ds.zero_scale_frames.max() <= 1.0


def test_video_pair_semantics():
    from hpvaegan_tpu.data import SingleVideoDataset
    cfg = _video_cfg()
    ds = SingleVideoDataset(cfg)
    cfg.scale_idx = 2
    cfg.fps_index = ds.pyramid.fps_index(2)
    ds.generate_frames(2)
    clip, zero = ds.get(3, hflip=False)
    td = ds.pyramid.td(2)
    assert clip.shape[0] == td
    # zero-scale pair always strides at sampling_rates[0]
    assert zero.shape[0] == cfg.fps_lcm // cfg.sampling_rates[0] + 1
    # same start index: strided subsets of the same window
    every = cfg.sampling_rates[cfg.fps_index]
    np.testing.assert_array_equal(
        zero[0], ds.zero_scale_frames[3])


def test_video_hflip_shared():
    from hpvaegan_tpu.data import SingleVideoDataset
    cfg = _video_cfg()
    ds = SingleVideoDataset(cfg)
    cfg.scale_idx = 1
    cfg.fps_index = ds.pyramid.fps_index(1)
    ds.generate_frames(1)
    clip_f, zero_f = ds.get(0, hflip=True)
    clip, zero = ds.get(0, hflip=False)
    np.testing.assert_array_equal(clip_f, clip[:, :, ::-1])
    np.testing.assert_array_equal(zero_f, zero[:, :, ::-1])


def test_image_dataset_scales():
    from hpvaegan_tpu.data import SingleImageDataset
    cfg = Config(image_path=os.path.join(ASSETS, "test_image.png"),
                 img_size=16, min_size=8, max_size=16)
    cfg.adjust_scales()
    ds = SingleImageDataset(cfg)
    cur, zero = ds.get(0, scale_idx=2, hflip=False)
    assert cur.shape == (*ds.pyramid.shape2d(2), 3)
    assert zero.shape == (*ds.pyramid.shape2d(0), 3)
    cur0, z = ds.get(0, scale_idx=0, hflip=False)
    assert z is None


def test_loader_batches_and_replacement():
    from hpvaegan_tpu.data import BatchLoader, SingleImageDataset
    cfg = Config(image_path=os.path.join(ASSETS, "test_image.png"),
                 img_size=16, min_size=8, max_size=16, data_rep=1)
    cfg.adjust_scales()
    ds = SingleImageDataset(cfg)
    # len(ds)=1 < batch 2: replacement path must still yield batches
    loader = BatchLoader(ds, batch_size=2, seed=0, scale_idx=0)
    real, real_zero = next(loader)
    assert real.shape[0] == 2
    loader.close()


def test_loader_start_iteration_resumes_stream():
    """BatchLoader draws are a pure function of (seed, batch index): a
    loader built with start_iteration=k yields exactly the batches the
    uninterrupted loader yields from its k-th batch on — the host-loader
    leg of the mid-scale resume guarantee (--save-interval), matching the
    device cache's (seed, iteration)-keyed semantics."""
    from hpvaegan_tpu.data import BatchLoader

    cfg = _video_cfg()
    cfg.hflip = True  # per-batch hflip coins must be iteration-keyed too
    cfg.data_rep = 4  # len(ds) >= batch: exercises the epoch-perm path
    from hpvaegan_tpu.data import SingleVideoDataset
    ds = SingleVideoDataset(cfg)
    ds.generate_frames(1)

    full = BatchLoader(ds, batch_size=2, seed=7, scale_idx=1)
    ref = [next(full) for _ in range(6)]
    full.close()

    resumed = BatchLoader(ds, batch_size=2, seed=7, scale_idx=1,
                          start_iteration=3)
    got = [next(resumed) for _ in range(3)]
    resumed.close()
    for (r, rz), (g, gz) in zip(ref[3:], got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
        np.testing.assert_array_equal(np.asarray(rz), np.asarray(gz))

    # and the replacement path (len < batch) is keyed the same way
    cfg2 = _video_cfg()
    ds2 = SingleVideoDataset(cfg2)
    ds2.generate_frames(0)
    a = BatchLoader(ds2, batch_size=len(ds2) + 1, seed=3, scale_idx=0)
    ra = [np.asarray(next(a)[0]) for _ in range(4)]
    a.close()
    b = BatchLoader(ds2, batch_size=len(ds2) + 1, seed=3, scale_idx=0,
                    start_iteration=2)
    rb = [np.asarray(next(b)[0]) for _ in range(2)]
    b.close()
    np.testing.assert_array_equal(ra[2], rb[0])
    np.testing.assert_array_equal(ra[3], rb[1])


def test_decode_ahead_prefetch_identical():
    """prefetch_frames + generate_frames yields the same frame store as a
    synchronous decode (--decode-ahead is pure overlap)."""
    from hpvaegan_tpu.data import SingleVideoDataset
    sync = SingleVideoDataset(_video_cfg())
    sync.generate_frames(2)
    ds = SingleVideoDataset(_video_cfg())
    ds.prefetch_frames(2)
    assert ds._prefetch is not None and ds._prefetch[0] == 2
    ds.generate_frames(2)  # joins the thread
    assert ds._prefetch is None and ds._frames_scale == 2
    np.testing.assert_array_equal(ds.frames, sync.frames)
    # idempotent: a repeat prefetch of the decoded scale is a no-op
    ds.prefetch_frames(2)
    assert ds._prefetch is None


def test_decode_ahead_failure_falls_back(caplog):
    """A decode error inside the prefetch thread falls back to a synchronous
    re-decode in generate_frames instead of surfacing from the thread."""
    import threading

    from hpvaegan_tpu.data import SingleVideoDataset
    ds = SingleVideoDataset(_video_cfg())
    real = ds._generate_frames

    def flaky(scale_idx):
        if threading.current_thread().name.startswith("decode-ahead"):
            raise RuntimeError("boom")
        return real(scale_idx)

    ds._generate_frames = flaky
    ds.prefetch_frames(1)
    with caplog.at_level("WARNING"):
        ds.generate_frames(1)
    assert ds._frames_scale == 1 and ds.frames is not None
    assert any("decode-ahead" in r.message for r in caplog.records)
