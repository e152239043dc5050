"""TensorBoard summaries (reference: utils/summaries.py).

Scalar tags and image/video grid semantics match the reference
(``Video/Scale {s}/{KLD, rec loss, errG, ...}``, train_video.py:210-241;
grid construction utils/summaries.py:32-52).  Inputs are channels-last
(our layout); conversion to TB's expected formats happens here.
"""
from __future__ import annotations

import numpy as np

__all__ = ["TensorboardSummary"]


def _make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2
               ) -> np.ndarray:
    """(N, H, W, C) float [-1,1] -> (H', W', C) float [0,1] grid."""
    images = (np.clip(images, -1, 1) + 1.0) / 2.0
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * (h + padding) + padding,
                     ncol * (w + padding) + padding, c), dtype=np.float32)
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[idx]
    return grid


class TensorboardSummary:
    """TB writer with an optional neptune experiment route.

    When a neptune experiment is passed, scalars and image grids go to
    neptune INSTEAD of TensorBoard, mirroring the reference's either/or
    routing (utils/summaries.py:26-30, 46-52).
    """

    def __init__(self, directory: str, neptune_exp=None):
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(logdir=directory)
        self.neptune_exp = neptune_exp

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self.neptune_exp is not None:
            self.neptune_exp.log_metric(tag, step, float(value))
        else:
            self.writer.add_scalar(tag, float(value), step)

    def visualize_video(self, cfg, iteration: int, videos, name: str) -> None:
        """(B, T, H, W, C) in [-1,1]: unfolded frame grid + first-3 clips,
        tagged ``Video/Scale {s}/{name}[_unfold]`` (utils/summaries.py:32-44)."""
        vids = np.asarray(videos)
        b, t, h, w, c = vids.shape
        scale = getattr(cfg, "scale_idx", 0)
        frames = vids.reshape(b * t, h, w, c)
        grid = _make_grid(frames, nrow=t)
        self.writer.add_image(f"Video/Scale {scale}/{name}_unfold", grid,
                              iteration, dataformats="HWC")
        clips = np.clip((vids[:3] + 1.0) / 2.0, 0, 1)
        # add_video expects (N, T, C, H, W)
        self.writer.add_video(f"Video/Scale {scale}/{name}",
                              clips.transpose(0, 1, 4, 2, 3), iteration,
                              fps=int(max(1, getattr(cfg, "fps", 4))))

    def visualize_image(self, cfg, iteration: int, images, name: str) -> None:
        """3-image grid tagged ``Image/Scale {s}/{name}``
        (utils/summaries.py:46-52)."""
        imgs = np.asarray(images)[:3]
        grid = _make_grid(imgs, nrow=3)
        tag = f"Image/Scale {getattr(cfg, 'scale_idx', 0)}/{name}"
        if self.neptune_exp is not None:
            self.neptune_exp.log_image(tag, iteration,
                                       y=(grid * 255).astype(np.uint8))
        else:
            self.writer.add_image(tag, grid, iteration, dataformats="HWC")

    def close(self) -> None:
        self.writer.close()
