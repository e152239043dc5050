"""Experiment tree + checkpointing (reference: utils/saver.py).

Directory layout matches the reference: ``run/<clip>/<checkname>/
experiment_<N>/`` with an ``eval/`` subdir and auto-incremented run ids
(utils/saver.py:25-37).  Checkpoints are msgpack-serialized pytrees (flax
serialization) written atomically; the reference's file semantics are kept:

  netG           full growing generator vars + scale + noise_amps
                 (train_video.py:247-252)
  netD_<s>       per-scale critic vars — ALSO the warm start for the next
                 scale's critic (train_video.py:50-52, 253-258)
  Noise_Amps     the per-scale noise amplitude list (train_video.py:246)
  Z_init         baselines fixed reconstruction noise
                 (train_video_baselines.py:43)

Restore-with-growth-replay: like the reference (train_video.py:399-416), the
caller rebuilds the module structure by replaying ``init_next_stage`` before
``load_into`` deserializes the payload into the matching pytree.
Saves run on a background thread (async checkpointing) so the device never
waits on the filesystem.
"""
from __future__ import annotations

import glob
import json
import os
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np

__all__ = ["Saver", "VideoSaver", "ImageSaver", "write_video",
           "restore_file", "apply_resume"]


def restore_file(path: str, target: Any = None) -> Any:
    """Deserialize a checkpoint file; with a ``target`` pytree the payload is
    loaded into the matching structure (resume-with-growth-replay,
    train_video.py:399-416)."""
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return flax.serialization.msgpack_restore(data)
    return flax.serialization.from_bytes(target, data)


def apply_resume(cfg, G, gvars: Any, root_key=None) -> Any:
    """--netG resume shared by the three trainer CLIs: growth replay
    (init_next_stage × checkpointed scale) then payload restore into the
    rebuilt structure.

    Handles both checkpoint kinds:
    - end-of-scale ``netG`` (reference semantics, train_video.py:399-416:
      the checkpointed scale is re-trained from iteration 0; noise amps
      come from the sibling ``Noise_Amps`` file, falling back to the
      payload's own copy);
    - intra-scale ``netG_mid`` (--save-interval) whose payload additionally
      carries ``iteration`` + both optimizer states + the critic — those
      are stashed on cfg for train_scale to restore, so the scale resumes
      mid-flight with optimizer state and the data/RNG streams intact.
    """
    import jax

    if not os.path.isfile(cfg.netG):
        raise RuntimeError(f"=> no <G> checkpoint found at '{cfg.netG}'")
    raw = restore_file(cfg.netG)
    cfg.scale_idx = int(raw["scale"])
    cfg.resumed_idx = int(raw["scale"])
    cfg.resume_dir = os.path.dirname(cfg.netG)
    for i in range(cfg.scale_idx):
        if root_key is not None:
            gvars = G.init_next_stage(gvars,
                                      jax.random.fold_in(root_key, 100 + i))
        else:  # baselines generators grow without an RNG arg
            gvars = G.init_next_stage(gvars)
    gvars = flax.serialization.from_state_dict(gvars, raw["gvars"])
    if "iteration" in raw:  # netG_mid: resume mid-scale
        cfg.resume_iteration = int(raw["iteration"])
        cfg._mid_raw = raw
        cfg.Noise_Amps = [float(a) for a in raw["noise_amps"]]
    else:
        amps_path = os.path.join(cfg.resume_dir, "Noise_Amps")
        amps = (restore_file(amps_path)["data"]
                if os.path.exists(amps_path) else raw["noise_amps"])
        cfg.Noise_Amps = [float(a) for a in amps]
    return gvars


def _to_host(tree: Any) -> Any:
    """Device -> host with retry: remote TPU transports can throw transient
    errors on fetch (observed once through the axon relay).  Multi-host:
    ``multihost.fetch`` first replicates any leaf whose shards span
    non-addressable devices (e.g. the baselines' data-sharded Z_init)."""
    import time

    from ..parallel import multihost

    def fetch(x):
        for attempt in range(3):
            try:
                return multihost.fetch(x)
            except Exception:
                if attempt == 2:
                    raise
                time.sleep(1.0 + attempt)

    return jax.tree_util.tree_map(fetch, tree)


class Saver:
    """Base saver: experiment dir management + pytree checkpoints."""

    def __init__(self, cfg, clip_name: str, run_id: Optional[int] = None):
        from ..parallel import multihost
        self.cfg = cfg
        # multi-host rule (SURVEY §5.8): only process 0 touches the
        # experiment tree — non-primary processes keep the (agreed) paths
        # for logging but every write below is a no-op, so a pod run can't
        # race duplicate experiment_N dirs or corrupt checkpoints
        self._primary = multihost.is_primary()
        self.directory = os.path.join(cfg.run_dir, clip_name, cfg.checkname)
        if run_id is None:
            runs = sorted(glob.glob(os.path.join(self.directory,
                                                 "experiment_*")))
            run_id = int(runs[-1].split("_")[-1]) + 1 if runs else 0
            # process 0's auto-incremented id wins (its glob is the one
            # that sees the authoritative tree)
            run_id = multihost.agree(run_id)
        self.experiment_dir = os.path.join(self.directory,
                                           f"experiment_{run_id}")
        self.eval_dir = os.path.join(self.experiment_dir, "eval")
        if self._primary:
            os.makedirs(self.experiment_dir, exist_ok=True)
            os.makedirs(self.eval_dir, exist_ok=True)
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending: Optional[Future] = None

    # -- checkpoints -------------------------------------------------------
    def _write(self, payload: bytes, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)

    def save_checkpoint(self, state: Any, filename: str,
                        blocking: bool = False) -> None:
        """Serialize a pytree; by default the disk write is async.
        Multi-host: the device->host fetch runs on EVERY process (a leaf
        sharded across processes is replicated by a collective inside
        ``multihost.fetch`` — all processes must join it), but only
        process 0 serializes and writes."""
        host_state = _to_host(state)
        if not self._primary:
            return
        path = os.path.join(self.experiment_dir, filename)
        payload = flax.serialization.to_bytes(host_state)
        self.wait()
        self._pending = self._pool.submit(self._write, payload, path)
        if blocking:
            self.wait()

    def wait(self) -> None:
        if self._pending is not None:
            self._pending.result()
            self._pending = None

    def load_checkpoint(self, filename: str, target: Any = None,
                        directory: Optional[str] = None) -> Any:
        path = os.path.join(directory or self.experiment_dir, filename)
        with open(path, "rb") as f:
            data = f.read()
        if target is None:
            return flax.serialization.msgpack_restore(data)
        return flax.serialization.from_bytes(target, data)

    def save_json(self, obj: Any, filename: str) -> None:
        if not self._primary:
            return
        with open(os.path.join(self.experiment_dir, filename), "w") as f:
            json.dump(obj, f)


def write_video(array: np.ndarray, filename: str, fps: float) -> None:
    """MJPG writer; de-normalizes [-1,1] -> uint8 (utils/saver.py:8-19).

    ``array`` is (T, H, W, C) float in [-1, 1] (channels-last, our layout).
    """
    num_frames, height, width = array.shape[0], array.shape[1], array.shape[2]
    video = cv2_writer(filename, fps, width, height)
    for i in range(num_frames):
        frame = (np.asarray(array[i]) + 1.0) * 127.5
        video.write(np.uint8(frame[:, :, ::-1]))  # RGB -> BGR for OpenCV
    video.release()


def cv2_writer(filename: str, fps: float, width: int, height: int):
    import cv2
    return cv2.VideoWriter(filename,
                           cv2.VideoWriter_fourcc("M", "J", "P", "G"),
                           float(fps), (width, height))


class VideoSaver(Saver):
    def __init__(self, cfg, run_id: Optional[int] = None):
        clip_name = ".".join(os.path.basename(cfg.video_path).split(".")[:-1])
        super().__init__(cfg, clip_name, run_id)

    def save_video(self, array: np.ndarray, filename: str,
                   fps: Optional[float] = None) -> None:
        if not self._primary:
            return
        write_video(array, os.path.join(self.eval_dir, filename),
                    fps if fps is not None else self.cfg.fps)


class ImageSaver(Saver):
    def __init__(self, cfg, run_id: Optional[int] = None):
        clip_name = ".".join(os.path.basename(cfg.image_path).split(".")[:-1])
        super().__init__(cfg, clip_name, run_id)

    def save_image(self, array: np.ndarray, filename: str) -> None:
        if not self._primary:
            return
        import cv2
        img = (np.asarray(array) + 1.0) * 127.5
        cv2.imwrite(os.path.join(self.eval_dir, filename),
                    np.uint8(img[:, :, ::-1]))
