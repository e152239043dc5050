"""End-to-end tiny 3D video training + baselines on the CPU backend."""
import json
import os
import sys

import numpy as np
import pytest

ASSET = os.path.join(os.path.dirname(__file__), "assets", "test_video.avi")

COMMON = [
    "--video-path", ASSET, "--img-size", "16", "--min-size", "8",
    "--max-size", "16", "--niter", "2", "--nfc", "8", "--num-layer", "2",
    "--batch-size", "2", "--manualSeed", "5",
]


def _run(module_name, extra, run_dir):
    import importlib
    mod = importlib.import_module(module_name)
    argv = [module_name + ".py"] + COMMON + ["--run-dir", str(run_dir)] + extra
    old = sys.argv
    sys.argv = argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_video_trainer_e2e(tmp_path):
    _run("train_video",
         ["--vae-levels", "2", "--latent-dim", "8", "--enc-blocks", "1"],
         tmp_path)
    exp = os.path.join(tmp_path, "test_video", "DEBUG", "experiment_0")
    with open(os.path.join(exp, "Noise_Amps.json")) as f:
        amps = json.load(f)["noise_amps"]
    assert len(amps) == 5 and amps[0] == 1.0
    assert all(np.isfinite(a) for a in amps)
    for name in ("netG", "netD_2", "netD_4"):
        assert os.path.exists(os.path.join(exp, name)), name

    from hpvaegan_tpu.utils.saver import restore_file
    raw = restore_file(os.path.join(exp, "netG"))
    assert len(raw["gvars"]["body"]) == 4


def test_baselines_trainer_e2e(tmp_path):
    _run("train_video_baselines", ["--Dsteps", "2", "--Gsteps", "2"],
         tmp_path)
    exp = os.path.join(tmp_path, "test_video", "DEBUG", "experiment_0")
    # critic exists at EVERY scale for baselines
    for s in range(5):
        assert os.path.exists(os.path.join(exp, f"netD_{s}")), s
    assert os.path.exists(os.path.join(exp, "Z_init"))


def test_baselines_netg_resume(tmp_path):
    """Baselines --netG resume (VERDICT r1 item 10; reference
    train_video_baselines.py:38-48): Z_init must be RELOADED, not
    regenerated (the fixed-reconstruction-noise contract — a conscious fix
    of the reference bug), and the amps list must keep its length."""
    from hpvaegan_tpu.utils.saver import restore_file

    _run("train_video_baselines", [], tmp_path / "first")
    exp = os.path.join(tmp_path, "first", "test_video", "DEBUG",
                       "experiment_0")
    z_first = np.asarray(restore_file(os.path.join(exp, "Z_init"))["data"])

    _run("train_video_baselines", ["--netG", os.path.join(exp, "netG")],
         tmp_path / "second")
    exp2 = os.path.join(tmp_path, "second", "test_video", "DEBUG",
                        "experiment_0")
    # Z_init identity across the resume
    z_second = np.asarray(restore_file(os.path.join(exp2, "Z_init"))["data"])
    np.testing.assert_array_equal(z_first, z_second)
    # amps list length unchanged (re-appending = reference resume bug)
    raw = restore_file(os.path.join(exp2, "netG"))
    assert int(raw["scale"]) == 4
    assert len(np.asarray(raw["noise_amps"])) == 5
    assert len(raw["gvars"]["body"]) == 5  # CSG: stage 0 + 4 growths
