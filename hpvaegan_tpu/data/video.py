"""Single-video dataset (reference: datasets/video.py + generate_frames.py).

Decode path: OpenCV seek/read/BGR2RGB/resize per scale, exactly the
reference contract (generate_frames.py:7-54) including the 500-null-read
safety guard.  The per-scale frame cache is normalized to float32 [-1, 1]
once at generation time so hot-loop batch assembly is a strided slice +
optional flip — no per-iteration arithmetic on the host.

Pair semantics preserved (datasets/video.py:44-66): for scale_idx > 0,
each sample is (current-scale clip, zero-scale clip at sampling_rates[0])
taken at the SAME start index with a SHARED hflip decision.
"""
from __future__ import annotations

import logging
import os
import threading
from typing import Optional, Tuple

import cv2
import numpy as np

__all__ = ["video_to_frames", "SingleVideoDataset"]


def video_to_frames(video_path: str, start_frame: int, max_frames: int,
                    scaled_size: Optional[Tuple[int, int]] = None
                    ) -> np.ndarray:
    """Decode up to max_frames RGB frames resized to scaled_size (H, W)
    (generate_frames.py:7-54)."""
    assert os.path.exists(video_path)
    capture = cv2.VideoCapture(video_path)
    total_frames = int(capture.get(cv2.CAP_PROP_FRAME_COUNT))
    assert total_frames > start_frame >= 0, "Start-Frame out of range"

    trimmed = total_frames - start_frame
    end = max_frames if trimmed > max_frames else trimmed

    capture.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
    frames = []
    while_safety = 0
    while len(frames) < end:
        if while_safety > 500:
            break
        _, image = capture.read()
        if image is None:
            while_safety += 1
            continue
        while_safety = 0
        rgb = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        if scaled_size is not None:
            rgb = cv2.resize(rgb, (scaled_size[1], scaled_size[0]),
                             interpolation=cv2.INTER_LINEAR)
        frames.append(rgb)
    capture.release()
    return np.stack(frames)


class SingleVideoDataset:
    """Per-scale re-decoded frame store (datasets/video.py:12-92)."""

    def __init__(self, cfg, pyramid=None):
        if not os.path.exists(cfg.video_path):
            logging.error("invalid path")
            raise FileNotFoundError(cfg.video_path)
        capture = cv2.VideoCapture(cfg.video_path)
        cfg.org_fps = capture.get(cv2.CAP_PROP_FPS)
        h = capture.get(cv2.CAP_PROP_FRAME_HEIGHT)
        w = capture.get(cv2.CAP_PROP_FRAME_WIDTH)
        capture.release()
        self.org_frame_size = [h, w]
        cfg.ar = h / w  # H2W (datasets/video.py:32)
        cfg.fps_lcm = int(np.lcm.reduce(np.asarray(cfg.sampling_rates)))

        self.cfg = cfg
        self.pyramid = pyramid if pyramid is not None else cfg.pyramid()

        logging.info("Saving zero-level frames...")
        self.zero_scale_frames = self._generate_frames(0)  # float32 [-1,1]
        self.frames: Optional[np.ndarray] = None
        self._frames_scale: Optional[int] = None
        self._prefetch: Optional[tuple] = None  # (scale_idx, thread, box)

    def _generate_frames(self, scale_idx: int) -> np.ndarray:
        h, w = self.pyramid.shape2d(scale_idx)
        raw = video_to_frames(self.cfg.video_path, self.cfg.start_frame,
                              self.cfg.max_frames, (h, w))
        return raw.astype(np.float32) / 255.0 * 2.0 - 1.0  # (N, H, W, 3)

    def generate_frames(self, scale_idx: int) -> None:
        """Re-decode the whole video at this scale's resolution — called once
        per scale by the trainer (train_video.py:36).  Idempotent per scale:
        a repeat call for the already-decoded scale skips the full-video
        re-decode (generate.py may ask for the same scale twice)."""
        if self._frames_scale == scale_idx and self.frames is not None:
            return
        pf = self._prefetch
        if pf is not None and pf[0] == scale_idx:
            _, thread, box = pf
            thread.join()
            self._prefetch = None
            if "frames" in box:
                self.frames = box["frames"]
                self._frames_scale = scale_idx
                return
            logging.warning(
                f"decode-ahead for scale {scale_idx} failed "
                f"({box.get('error')!r}); re-decoding synchronously")
        self.frames = self._generate_frames(scale_idx)
        self._frames_scale = scale_idx

    def prefetch_frames(self, scale_idx: int) -> None:
        """Start decoding ``scale_idx``'s frames in a daemon thread
        (--decode-ahead): the per-scale full-video re-decode — a synchronous
        scale-boundary cost in the reference (train_video.py:36 →
        generate_frames.py:7-54) — overlaps this scale's training instead.
        OpenCV's decode/resize release the GIL, and with the device-resident
        frame cache the host is idle between chunk dispatches, so the decode
        rides free CPU time.  The next ``generate_frames(scale_idx)`` call
        joins the thread; decode errors fall back to a synchronous re-decode
        there."""
        if (self._frames_scale == scale_idx
                or (self._prefetch is not None
                    and self._prefetch[0] == scale_idx)):
            return
        box: dict = {}

        def _work() -> None:
            try:
                box["frames"] = self._generate_frames(scale_idx)
            except Exception as e:  # re-raised as a sync-decode fallback
                box["error"] = e

        thread = threading.Thread(target=_work, daemon=True,
                                  name=f"decode-ahead-{scale_idx}")
        thread.start()
        self._prefetch = (scale_idx, thread, box)

    def __len__(self) -> int:
        return (len(self.zero_scale_frames) - self.cfg.fps_lcm) \
            * self.cfg.data_rep

    def get(self, idx: int, hflip: bool, scale_idx: Optional[int] = None
            ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """One (T, H, W, C) clip; plus the zero-scale pair for scale_idx>0.

        ``scale_idx`` selects the temporal stride (falls back to the
        config's current scale for reference-style mutable-state callers).
        """
        cfg = self.cfg
        if scale_idx is None:
            scale_idx = cfg.scale_idx
            fps_index = cfg.fps_index
        else:
            fps_index = self.pyramid.fps_index(scale_idx)
        idx = idx % (len(self.zero_scale_frames) - cfg.fps_lcm)
        every = cfg.sampling_rates[fps_index]
        clip = self.frames[idx:idx + cfg.fps_lcm + 1:every]
        if hflip:
            clip = clip[:, :, ::-1]
        if scale_idx > 0:
            every0 = cfg.sampling_rates[0]
            zero = self.zero_scale_frames[idx:idx + cfg.fps_lcm + 1:every0]
            if hflip:
                zero = zero[:, :, ::-1]
            return clip, zero
        return clip, None

    def device_cache_views(self, scale_idx: int):
        """(cur_store, zero_store, n_start, gather_kwargs) for
        data/device_cache.DeviceCacheLoader — the whole per-scale frame
        store goes to HBM once; crops/flips happen on device."""
        self.generate_frames(scale_idx)
        cfg = self.cfg
        every = cfg.sampling_rates[self.pyramid.fps_index(scale_idx)]
        td = cfg.fps_lcm // every + 1
        if scale_idx > 0:
            zero, every0 = self.zero_scale_frames, cfg.sampling_rates[0]
        else:
            # scale 0 has no pair: the loader duplicates the current clip
            # (loader.py batch() semantics) — same store, same stride
            zero, every0 = self.frames, every
        td0 = cfg.fps_lcm // every0 + 1
        n_start = len(self.zero_scale_frames) - cfg.fps_lcm
        kw = dict(td=td, every=every, td0=td0, every0=every0,
                  hflip=bool(cfg.hflip),
                  virtual_len=n_start * cfg.data_rep)
        return self.frames, zero, n_start, kw

    def device_cache_spec(self, scale_idx: int):
        """Shape-only twin of device_cache_views — (cur_shape, zero_shape,
        n_start, gather_kwargs) WITHOUT decoding that scale's frames, so the
        compile-ahead thread (train/precompile.py) can lower next scale's
        programs while this scale still trains."""
        cfg = self.cfg
        n = len(self.zero_scale_frames)
        h, w = self.pyramid.shape2d(scale_idx)
        every = cfg.sampling_rates[self.pyramid.fps_index(scale_idx)]
        td = cfg.fps_lcm // every + 1
        if scale_idx > 0:
            zero_shape = tuple(self.zero_scale_frames.shape)
            every0 = cfg.sampling_rates[0]
        else:
            zero_shape, every0 = (n, h, w, 3), every
        td0 = cfg.fps_lcm // every0 + 1
        n_start = n - cfg.fps_lcm
        kw = dict(td=td, every=every, td0=td0, every0=every0,
                  hflip=bool(cfg.hflip), virtual_len=n_start * cfg.data_rep)
        return (n, h, w, 3), zero_shape, n_start, kw

    def batch(self, rng: np.random.Generator, indices: np.ndarray,
              scale_idx: int) -> Tuple[np.ndarray, np.ndarray]:
        cur_list, zero_list = [], []
        for idx in indices:
            hflip = bool(rng.random() < 0.5) if self.cfg.hflip else False
            cur, zero = self.get(int(idx), hflip, scale_idx)
            cur_list.append(cur)
            zero_list.append(cur if zero is None else zero)
        return np.ascontiguousarray(np.stack(cur_list)), \
            np.ascontiguousarray(np.stack(zero_list))
