"""Unit tests for the HBM-OOM fallback ladder (train/fallback.py):
plain -> --remat -> --gp-chunked -> --remat-blocks, rebuilt per rung;
non-OOM errors propagate untouched."""
import pytest

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.train.fallback import is_hbm_oom, oom_dispatch


class FakeOOM(Exception):
    def __str__(self):
        return ("INTERNAL: remote_compile: RESOURCE_EXHAUSTED: "
                "Ran out of memory in memory space hbm.")


def make_rebuild(fail_until):
    """steps whose 'step' raises OOM until `fail_until` rungs are on."""
    calls = {"rebuilds": 0}

    def rungs_on(cfg):
        return sum([cfg.remat, cfg.remat_blocks, cfg.gp_chunked])

    def rebuild_for(cfg):
        def rebuild():
            calls["rebuilds"] += 1

            def step(x):
                if rungs_on(cfg) < fail_until:
                    raise FakeOOM()
                return x + 1

            return {"step": step}
        return rebuild
    return rebuild_for, calls


@pytest.mark.parametrize("rungs_needed,expected", [
    # expected = (remat, gp_chunked, remat_blocks) — measured rung order
    (0, (False, False, False)),
    (1, (True, False, False)),
    (2, (True, True, False)),
    (3, (True, True, True)),
])
def test_ladder_escalates_exactly_as_needed(rungs_needed, expected):
    cfg = Config()
    rebuild_for, calls = make_rebuild(rungs_needed)
    dispatch = oom_dispatch(cfg, scale_idx=9, rebuild=rebuild_for(cfg))
    assert dispatch("step", 41) == 42
    assert (cfg.remat, cfg.gp_chunked, cfg.remat_blocks) == expected
    assert calls["rebuilds"] == 1 + rungs_needed


def test_oom_with_all_rungs_on_reraises():
    cfg = Config()
    cfg.remat = cfg.remat_blocks = cfg.gp_chunked = True
    rebuild_for, _ = make_rebuild(fail_until=99)
    dispatch = oom_dispatch(cfg, 9, rebuild_for(cfg))
    with pytest.raises(FakeOOM):
        dispatch("step", 0)


def test_non_oom_errors_propagate():
    cfg = Config()

    def rebuild():
        def step(x):
            raise ValueError("shape mismatch")
        return {"step": step}

    dispatch = oom_dispatch(cfg, 0, rebuild)
    with pytest.raises(ValueError, match="shape mismatch"):
        dispatch("step", 0)
    assert not cfg.remat  # untouched


def test_is_hbm_oom_detection():
    assert is_hbm_oom(FakeOOM())
    assert is_hbm_oom(RuntimeError("xyz Ran out of memory in hbm"))
    assert not is_hbm_oom(RuntimeError("INVALID_ARGUMENT: relay hiccup"))
    # the axon relay reports compile-time OOM as an opaque INTERNAL error —
    # the "Ran out of memory" detail is printed by the relay, not carried
    # in the exception message (CLAUDE.md environment note)
    assert is_hbm_oom(RuntimeError(
        "INTERNAL: remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1"))
    assert not is_hbm_oom(RuntimeError(
        "INTERNAL: remote_compile: HTTP 503: relay unavailable"))


def test_kwargs_pass_through():
    cfg = Config()

    def rebuild():
        return {"sample": lambda x, mode="rand": (x, mode)}

    dispatch = oom_dispatch(cfg, 0, rebuild)
    assert dispatch("sample", 1, mode="rec") == (1, "rec")
