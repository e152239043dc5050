"""Device-resident frame cache: the TPU-native hot-loop data path.

The reference feeds training through DataLoader workers that re-assemble
and re-upload every batch (train_video.py:364-368).  Through a ~40 ms
remote-relay round trip — and on this 1-core host — that per-batch host
work is what actually bounds the sub-10 ms pyramid scales (measured e2e:
55-71 it/s at scales 0-2 vs 594-336 it/s step-only, BENCHMARKS.md
"End-to-end trainer throughput").

This loader removes the host from the hot loop entirely: the per-scale
frame store (already normalized float32, a few MB even at 256 px) is
placed in HBM ONCE per scale, and each training chunk is one jitted
gather — temporal strided crop, optional shared hflip, pair semantics
(current-scale clip + zero-scale clip at sampling_rates[0], same start
index and flip, datasets/video.py:44-66) — driven by a tiny (k, B) int32
index array and a (k, B) flip mask, the only per-chunk upload.

Sampling semantics match BatchLoader: shuffled epochs over
(N - fps_lcm) * data_rep virtual samples, drop_last, with-replacement
fallback for tiny datasets, Bernoulli(0.5) per-sample hflip when
--hflip.  (The index stream is a reimplementation, not a bit-identical
replay of BatchLoader's np.random.Generator draws — data ORDER differs
from the host loader, data VALUES are identical.)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceCacheLoader", "supports_device_cache",
           "make_sample_gather"]


def supports_device_cache(dataset) -> bool:
    """Video and image datasets expose the raw per-scale frame stores the
    cache gathers from."""
    return hasattr(dataset, "device_cache_views")


def make_sample_gather(gather_kw: dict, hflip: bool):
    """Pure per-sample gather ``one(frames, zero_frames, idx, flip)`` —
    strided temporal crop + shared hflip for the pair (reference
    __getitem__, datasets/video.py:44-66); 2D flavor when the kwargs
    carry no temporal stride.  Composable: the chunk loader vmaps it, and
    the fused scan steps (train/steps.py) embed it INSIDE the training
    dispatch so a whole chunk is one device program."""
    if "td" in gather_kw:
        td, every = gather_kw["td"], gather_kw["every"]
        td0, every0 = gather_kw["td0"], gather_kw["every0"]
        t_off = jnp.arange(td, dtype=jnp.int32) * every
        t_off0 = jnp.arange(td0, dtype=jnp.int32) * every0

        def one(frames, zero_frames, idx, flip):
            clip = jnp.take(frames, idx + t_off, axis=0)
            zero = jnp.take(zero_frames, idx + t_off0, axis=0)
            if hflip:
                clip = jnp.where(flip, clip[:, :, ::-1], clip)
                zero = jnp.where(flip, zero[:, :, ::-1], zero)
            return clip, zero
    else:
        def one(images, zero_images, idx, flip):
            cur = jnp.take(images, idx, axis=0)
            zero = jnp.take(zero_images, idx, axis=0)
            if hflip:
                cur = jnp.where(flip, cur[:, ::-1], cur)
                zero = jnp.where(flip, zero[:, ::-1], zero)
            return cur, zero

    return one


@functools.partial(jax.jit, static_argnames=("td", "every", "td0", "every0",
                                             "hflip"))
def _gather_chunk(frames, zero_frames, idxs, flips, td: int, every: int,
                  td0: int, every0: int, hflip: bool):
    """(k, B) indices -> ((k, B, td, H, W, C), (k, B, td0, h0, w0, C))."""
    one = make_sample_gather(dict(td=td, every=every, td0=td0,
                                  every0=every0), hflip)
    return jax.vmap(jax.vmap(one, in_axes=(None, None, 0, 0)),
                    in_axes=(None, None, 0, 0))(frames, zero_frames, idxs,
                                                flips)


@functools.partial(jax.jit, static_argnames=("hflip",))
def _gather_chunk_2d(images, zero_images, idxs, flips, hflip: bool):
    """2D flavor: per-sample image pick (MultipleImageDataset) + hflip."""
    one = make_sample_gather({}, hflip)
    return jax.vmap(jax.vmap(one, in_axes=(None, None, 0, 0)),
                    in_axes=(None, None, 0, 0))(images, zero_images, idxs,
                                                flips)


class DeviceCacheLoader:
    """Drop-in for BatchLoader when the whole per-scale dataset fits HBM
    (it always does for this model family: <= a few 10s of MB).

    ``next_chunk(k)`` returns a pre-stacked (k, B, ...) pair in ONE
    dispatch — the scan-mode fast path.  ``__next__`` returns a single
    (B, ...) batch (squeezed k=1 chunk) for the non-scan path.
    """

    def __init__(self, dataset, batch_size: int, seed: int, scale_idx: int,
                 sharding=None, start_iteration: int = 0):
        """``sharding``: optional placement for the frame stores — under
        --spmd pass a replicated NamedSharding(mesh, P()) so the in-step
        gather output feeds the step's (data, spatial) sharding
        constraints from every device.

        ``start_iteration``: first iteration index of the draw stream —
        mid-scale resume (--save-interval / --netG .../netG_mid) passes
        the restored iteration so the resumed run consumes exactly the
        batches the uninterrupted run would have (draws are a pure
        function of (seed, iteration), see _row)."""
        from ..parallel.multihost import global_put
        views = dataset.device_cache_views(scale_idx)
        (cur_store, zero_store, self._n_start, self._gather_kw) = views
        # multi-host safe: every process decodes the identical store (same
        # clip, same pyramid), so global_put can assemble the replicated
        # global array from local shards
        self._cur = global_put(jnp.asarray(cur_store), sharding)
        self._zero = global_put(jnp.asarray(zero_store), sharding)
        self._is_video = "td" in self._gather_kw
        self.batch_size = batch_size
        self._seed = int(seed)
        self.hflip = bool(self._gather_kw.pop("hflip"))
        self._data_rep_len = self._gather_kw.pop("virtual_len")
        self._it = int(start_iteration)
        self._epoch_cache: Optional[Tuple[int, np.ndarray]] = None

    # -- index stream: BatchLoader-equivalent SEMANTICS (shuffled epochs,
    # drop_last, with-replacement fallback for tiny datasets,
    # loader.py:39-55) re-keyed as a PURE FUNCTION of the iteration index,
    # so a mid-scale resume at iteration i replays the identical stream the
    # uninterrupted run consumed from i on (data ORDER vs the stateful host
    # loader differs, as documented in the module docstring; VALUES are the
    # same distribution/contract either way) --
    def _epoch_perm(self, epoch: int) -> np.ndarray:
        if self._epoch_cache is not None and self._epoch_cache[0] == epoch:
            return self._epoch_cache[1]
        rng = np.random.default_rng(
            np.random.SeedSequence(entropy=self._seed,
                                   spawn_key=(0xE90C, epoch)))
        perm = rng.permutation(self._data_rep_len)
        self._epoch_cache = (epoch, perm)
        return perm

    def _row(self, it: int) -> Tuple[np.ndarray, np.ndarray]:
        """((B,) int32 start indices, (B,) bool flips) for iteration
        ``it`` — deterministic in (seed, it)."""
        n = self._data_rep_len
        if n <= 0:
            raise ValueError("dataset is empty")
        rng = np.random.default_rng(
            np.random.SeedSequence(entropy=self._seed, spawn_key=(it,)))
        if n < self.batch_size:
            flat = rng.integers(0, n, self.batch_size)
        else:
            per_epoch = n // self.batch_size  # drop_last: full batches only
            perm = self._epoch_perm(it // per_epoch)
            slot = (it % per_epoch) * self.batch_size
            flat = perm[slot:slot + self.batch_size]
        idxs = (flat % self._n_start).astype(np.int32)
        flips = rng.random(self.batch_size) < 0.5 if self.hflip \
            else np.zeros(self.batch_size, bool)
        return idxs, flips

    # -- fused-path accessors (train/steps.py scan-cache steps) --
    @property
    def stores(self) -> Tuple[jax.Array, jax.Array]:
        """The HBM-resident (current-scale, zero-scale) frame stores."""
        return self._cur, self._zero

    def sample_gather(self):
        """Per-sample pure gather for embedding inside a jitted step."""
        return make_sample_gather(self._gather_kw, self.hflip)

    def draw(self, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side randomness only: ((k, B) int32 start indices,
        (k, B, 1...) bool flips) for the chunk covering iterations
        [self._it, self._it + k) — advances the iteration counter."""
        rows = [self._row(self._it + j) for j in range(k)]
        self._it += k
        idxs = np.stack([r[0] for r in rows])
        trail = (1,) * (4 if self._is_video else 3)
        flips = np.stack([r[1] for r in rows]).reshape(
            (k, self.batch_size) + trail)
        return idxs, flips

    def gather_rows(self, idxs, flips) -> Tuple[jax.Array, jax.Array]:
        """One jitted gather of explicit (k, B) index/flip rows — used by
        next_chunk and by the trainer's TB-refresh of a chunk's last
        batch (the same compiled program either way)."""
        idxs, flips = jnp.asarray(idxs), jnp.asarray(flips)
        if self._is_video:
            return _gather_chunk(self._cur, self._zero, idxs, flips,
                                 hflip=self.hflip, **self._gather_kw)
        return _gather_chunk_2d(self._cur, self._zero, idxs, flips,
                                hflip=self.hflip)

    def next_chunk(self, k: int) -> Tuple[jax.Array, jax.Array]:
        return self.gather_rows(*self.draw(k))

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[jax.Array, jax.Array]:
        reals, rzs = self.next_chunk(1)
        return reals[0], rzs[0]

    def close(self) -> None:  # symmetry with BatchLoader
        pass
