"""Saver/checkpoint round-trips: experiment tree layout, msgpack pytree
serialization, target-based restore, async writes."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.utils.saver import ImageSaver, Saver, restore_file


@pytest.fixture
def saver(tmp_path):
    cfg = Config(image_path="/x/clip_name.png", checkname="CHK",
                 run_dir=str(tmp_path))
    return ImageSaver(cfg)


def test_experiment_tree_layout(tmp_path, saver):
    assert saver.experiment_dir == os.path.join(
        str(tmp_path), "clip_name", "CHK", "experiment_0")
    assert os.path.isdir(saver.eval_dir)
    # auto-increment
    cfg2 = Config(image_path="/x/clip_name.png", checkname="CHK",
                  run_dir=str(tmp_path))
    s2 = ImageSaver(cfg2)
    assert s2.experiment_dir.endswith("experiment_1")


def test_checkpoint_roundtrip_raw(saver):
    state = {"scale": 3,
             "gvars": {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                       "body": [{"k": jnp.ones(4)}, {"k": jnp.zeros(4)}]}}
    saver.save_checkpoint(state, "ckpt", blocking=True)
    raw = saver.load_checkpoint("ckpt")
    assert int(raw["scale"]) == 3
    np.testing.assert_array_equal(np.asarray(raw["gvars"]["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))


def test_checkpoint_restore_into_target(saver):
    state = {"a": jnp.full((2, 2), 7.0), "b": [jnp.ones(3), jnp.zeros(3)]}
    saver.save_checkpoint(state, "t", blocking=True)
    target = {"a": jnp.zeros((2, 2)), "b": [jnp.zeros(3), jnp.ones(3)]}
    out = saver.load_checkpoint("t", target=target)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.full((2, 2), 7.0))
    np.testing.assert_array_equal(np.asarray(out["b"][1]), np.zeros(3))


def test_restore_file_standalone(saver):
    saver.save_checkpoint({"data": jnp.arange(5.0)}, "amps", blocking=True)
    path = os.path.join(saver.experiment_dir, "amps")
    raw = restore_file(path)
    np.testing.assert_array_equal(np.asarray(raw["data"]), np.arange(5.0))


def test_async_write_then_wait(saver):
    for i in range(3):
        saver.save_checkpoint({"i": jnp.asarray(i)}, f"async_{i}")
    saver.wait()
    for i in range(3):
        assert int(saver.load_checkpoint(f"async_{i}")["i"]) == i
