"""Image datasets (reference: datasets/image.py).

Host-side decode/resize stays on numpy/cv2; tensors cross into JAX as
channels-last float32 in [-1, 1].  Per-scale resized copies are cached so the
hot loop does zero decoding — batch assembly is a cheap gather + optional
flip, and normalization is fused into the cached array once per scale.
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

import cv2
import imageio
import numpy as np

__all__ = ["SingleImageDataset", "MultipleImageDataset"]


def _to_unit_range(img_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC in [-1, 1] (kornia normalize(0.5, 0.5)
    equivalent, datasets/image.py:22-36)."""
    return img_u8.astype(np.float32) / 255.0 * 2.0 - 1.0


class _ImageDatasetBase:
    """Shared per-scale resize cache + pair semantics
    (datasets/image.py:13-69): for scale_idx > 0, __getitem__ returns the
    (current-scale, zero-scale) pair with a SHARED hflip decision."""

    def __init__(self, cfg, pyramid):
        self.cfg = cfg
        self.pyramid = pyramid
        self._cache: dict = {}  # scale_idx -> (num_images, H, W, 3) float32

    # subclasses define self.images: List[np.ndarray] (full-scale RGB uint8)

    def _scaled(self, scale_idx: int) -> np.ndarray:
        if scale_idx not in self._cache:
            h, w = self.pyramid.shape2d(scale_idx)
            resized = [
                _to_unit_range(cv2.resize(img, (w, h),
                                          interpolation=cv2.INTER_LINEAR))
                for img in self.images]
            self._cache[scale_idx] = np.stack(resized)
        return self._cache[scale_idx]

    def __len__(self) -> int:
        return self.cfg.data_rep * len(self.images)

    def get(self, idx: int, scale_idx: int, hflip: bool
            ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        img_idx = idx % len(self.images)
        cur = self._scaled(scale_idx)[img_idx]
        if hflip:
            cur = cur[:, ::-1]
        if scale_idx > 0:
            zero = self._scaled(0)[img_idx]
            if hflip:
                zero = zero[:, ::-1]
            return cur, zero
        return cur, None

    def device_cache_views(self, scale_idx: int):
        """(cur_store, zero_store, n_start, gather_kwargs) for
        data/device_cache.DeviceCacheLoader (2D flavor)."""
        cur = self._scaled(scale_idx)
        zero = self._scaled(0) if scale_idx > 0 else cur
        kw = dict(hflip=bool(self.cfg.hflip), virtual_len=len(self))
        return cur, zero, len(self.images), kw

    def device_cache_spec(self, scale_idx: int):
        """Shape-only twin of device_cache_views for the compile-ahead
        thread (train/precompile.py): next scale's store shapes without
        resizing that scale's images."""
        n = len(self.images)
        h, w = self.pyramid.shape2d(scale_idx)
        cur_shape = (n, h, w, 3)
        if scale_idx > 0:
            h0, w0 = self.pyramid.shape2d(0)
            zero_shape = (n, h0, w0, 3)
        else:
            zero_shape = cur_shape
        kw = dict(hflip=bool(self.cfg.hflip), virtual_len=len(self))
        return cur_shape, zero_shape, n, kw

    def batch(self, rng: np.random.Generator, indices: np.ndarray,
              scale_idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Assemble one batch; each item gets its own hflip draw
        (datasets/image.py:51)."""
        cur_list, zero_list = [], []
        for idx in indices:
            hflip = bool(rng.random() < 0.5) if self.cfg.hflip else False
            cur, zero = self.get(int(idx), scale_idx, hflip)
            cur_list.append(cur)
            zero_list.append(cur if zero is None else zero)
        return np.ascontiguousarray(np.stack(cur_list)), \
            np.ascontiguousarray(np.stack(zero_list))


class SingleImageDataset(_ImageDatasetBase):
    """One image, __len__ = data_rep (datasets/image.py:72-91)."""

    def __init__(self, cfg, pyramid=None):
        if not os.path.exists(cfg.image_path):
            logging.error("invalid path")
            raise FileNotFoundError(cfg.image_path)
        img = np.asarray(imageio.imread(cfg.image_path))[:, :, :3]
        self.images = [img]
        h, w = img.shape[:2]
        cfg.ar = h / w  # H2W aspect ratio (datasets/image.py:85)
        if pyramid is None:
            pyramid = cfg.pyramid2d()
        super().__init__(cfg, pyramid)


class MultipleImageDataset(_ImageDatasetBase):
    """All images in a directory; assumes equal sizes
    (datasets/image.py:94-120)."""

    def __init__(self, cfg, pyramid=None):
        if not (os.path.exists(cfg.image_path)
                and os.path.isdir(cfg.image_path)):
            logging.error("invalid path")
            raise FileNotFoundError(cfg.image_path)
        self.images = []
        for name in os.listdir(cfg.image_path):
            img = np.asarray(
                imageio.imread(os.path.join(cfg.image_path, name)))[:, :, :3]
            self.images.append(img)
        assert len(self.images) > 0
        h, w = self.images[0].shape[:2]
        cfg.ar = h / w
        if pyramid is None:
            pyramid = cfg.pyramid2d()
        super().__init__(cfg, pyramid)
