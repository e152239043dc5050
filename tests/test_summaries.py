"""TensorboardSummary: reference tag scheme + optional neptune routing
(reference utils/summaries.py:19-52, train_image.py:31-36,346-348)."""
import os
import types

import numpy as np

from hpvaegan_tpu.utils.summaries import TensorboardSummary


def _cfg(scale_idx=2):
    return types.SimpleNamespace(scale_idx=scale_idx, fps=4)


class _FakeNeptune:
    def __init__(self):
        self.metrics = []
        self.images = []

    def log_metric(self, tag, step, value):
        self.metrics.append((tag, step, value))

    def log_image(self, tag, step, y=None):
        self.images.append((tag, step, y.shape, y.dtype))


def test_tag_scheme_and_event_file(tmp_path):
    s = TensorboardSummary(str(tmp_path))
    s.add_scalar("Video/Scale 2/rec loss", 0.5, 10)
    vids = np.random.uniform(-1, 1, (2, 3, 8, 8, 3)).astype(np.float32)
    s.visualize_video(_cfg(), 10, vids, "Real")
    imgs = np.random.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    s.visualize_image(_cfg(), 10, imgs, "Generated")
    s.close()
    events = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert events, "no TB event file written"
    # the reference writes Video/Scale {s}/{name}_unfold, Video/Scale
    # {s}/{name}, Image/Scale {s}/{name} — grep the (uncompressed) event
    # file for the tag bytes
    # (tensorboardX sanitizes spaces to underscores inside event files)
    raw = b"".join(open(tmp_path / e, "rb").read() for e in events)
    assert b"Video/Scale_2/Real_unfold" in raw
    assert b"Video/Scale_2/Real" in raw
    assert b"Image/Scale_2/Generated" in raw


def test_neptune_routing(tmp_path):
    fake = _FakeNeptune()
    s = TensorboardSummary(str(tmp_path), neptune_exp=fake)
    s.add_scalar("Video/Scale 0/KLD", 1.25, 3)
    imgs = np.random.uniform(-1, 1, (3, 8, 8, 3)).astype(np.float32)
    s.visualize_image(_cfg(0), 3, imgs, "Fake var")
    s.close()
    assert fake.metrics == [("Video/Scale 0/KLD", 3, 1.25)]
    (tag, step, shape, dtype), = fake.images
    assert tag == "Image/Scale 0/Fake var" and step == 3
    assert dtype == np.uint8 and shape[-1] == 3
    # scalars/images must NOT also hit TB when neptune routes them
    # (either/or semantics, utils/summaries.py:26-30)
    raw = b"".join(open(tmp_path / e, "rb").read()
                   for e in os.listdir(tmp_path) if "tfevents" in e)
    assert b"KLD" not in raw and b"Fake var" not in raw
