"""LR group plan tests vs the reference's param-group construction
(train_video.py:57-88, train_video_baselines.py:55-70)."""
import numpy as np
import pytest

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.train.optim import baselines_group_plan, hpvaegan_group_plan


def cfg(**kw):
    base = dict(lr_g=5e-4, lr_scale=0.2, train_depth=1, vae_levels=3)
    base.update(kw)
    return Config(**base)


def test_vae_phase_groups():
    # scale 1 (< vae_levels): encoder+decoder at lr_g*ls^1, last stage at lr_g
    c = cfg()
    modules, body, lrs = hpvaegan_group_plan(c, scale_idx=1, n_body=1)
    assert modules == {"encode": "enc", "decoder": "enc"}
    assert body == ["b0"]
    assert np.isclose(lrs["enc"], 5e-4 * 0.2)
    assert np.isclose(lrs["b0"], 5e-4)


def test_vae_phase_scale0_no_body():
    c = cfg()
    modules, body, lrs = hpvaegan_group_plan(c, scale_idx=0, n_body=0)
    assert modules["encode"] == "enc"
    assert body == []
    assert np.isclose(lrs["enc"], 5e-4)


def test_gan_phase_only_tail_stages():
    # scale 5, vae_levels 3, train_depth 1: td' = min(1, 6-3+1)=1
    c = cfg()
    modules, body, lrs = hpvaegan_group_plan(c, scale_idx=5, n_body=6)
    assert modules == {"encode": "frozen", "decoder": "frozen"}
    assert body == ["frozen"] * 5 + ["b0"]
    assert np.isclose(lrs["b0"], 5e-4)


def test_gan_phase_depth_capped_by_vae_boundary():
    # train_depth 10 but only n_body - vae_levels + 1 stages trainable
    c = cfg(train_depth=10)
    modules, body, lrs = hpvaegan_group_plan(c, scale_idx=5, n_body=6)
    depth = min(10, 6 - 3 + 1)  # = 4
    assert body == ["frozen"] * 2 + ["b0", "b1", "b2", "b3"]
    # depth-decayed LRs: earliest trained stage gets lr_g * ls^(depth-1)
    assert np.isclose(lrs["b0"], 5e-4 * 0.2 ** (depth - 1))
    assert np.isclose(lrs["b3"], 5e-4)


def test_train_all_small_body():
    c = cfg(train_all=True, train_depth=5)
    modules, body, lrs = hpvaegan_group_plan(c, scale_idx=2, n_body=2)
    assert modules["encode"] == "enc"
    assert body == ["b0", "b1"]
    assert np.isclose(lrs["enc"], 5e-4 * 0.2 ** 2)
    assert np.isclose(lrs["b0"], 5e-4 * 0.2)


def test_train_all_large_body():
    c = cfg(train_all=True, train_depth=2)
    modules, body, lrs = hpvaegan_group_plan(c, scale_idx=5, n_body=5)
    assert modules["encode"] == "frozen"
    assert body == ["frozen", "frozen", "frozen", "b0", "b1"]


def test_baselines_plan_head_tail():
    c = cfg(train_depth=1)
    # scale 0: head trained (0-1 < 0), tail always
    modules, body, lrs = baselines_group_plan(c, 0, 1, has_head=True)
    assert modules == {"head": "head", "tail": "tail"}
    assert np.isclose(lrs["head"], 5e-4)
    assert np.isclose(lrs["tail"], 5e-4)
    # scale 3: head frozen
    modules, body, lrs = baselines_group_plan(c, 3, 4, has_head=True)
    assert modules["head"] == "frozen"
    assert body == ["frozen"] * 3 + ["b0"]


def test_baselines_plan_sg_no_head():
    c = cfg(train_depth=2)
    modules, body, lrs = baselines_group_plan(c, 2, 3, has_head=False)
    assert modules == {}
    assert body == ["frozen", "b0", "b1"]
    assert np.isclose(lrs["b0"], 5e-4 * 0.2)
