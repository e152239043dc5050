"""generate.py --svfid end-to-end on a tiny 3D checkpoint (the paper's
metric, absent from the reference — SURVEY.md §6)."""
import logging
import os
import sys

import pytest

ASSET = os.path.join(os.path.dirname(__file__), "assets", "test_video.avi")

MODEL_ARGS = [
    "--video-path", ASSET, "--img-size", "16", "--min-size", "8",
    "--max-size", "16", "--nfc", "8", "--num-layer", "2",
    "--vae-levels", "2", "--latent-dim", "8", "--enc-blocks", "1",
]


def _main(mod_name, argv):
    import importlib
    mod = importlib.import_module(mod_name)
    old = sys.argv
    sys.argv = [mod_name + ".py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def netg(tmp_path_factory):
    run_dir = tmp_path_factory.mktemp("svfidrun")
    _main("train_video", MODEL_ARGS + ["--niter", "2", "--batch-size", "2",
                                       "--manualSeed", "7",
                                       "--run-dir", str(run_dir)])
    return os.path.join(run_dir, "test_video", "DEBUG", "experiment_0",
                        "netG")


def test_generate_svfid(netg, tmp_path, caplog):
    with caplog.at_level(logging.INFO):
        _main("generate", ["--netG", netg, "--output-dir", str(tmp_path),
                           "--num-samples", "2", "--batch-size", "2",
                           "--svfid", "--svfid-layer", "conv2", "--metrics"]
              + MODEL_ARGS)
    assert os.path.exists(tmp_path / "sample_0.avi")
    svfid_lines = [r.message for r in caplog.records
                   if "SVFID[conv2]" in r.message]
    assert len(svfid_lines) == 1
    # no pretrained weights on this machine -> random-feature mode flagged
    assert "RANDOM C3D" in svfid_lines[0]
    # finite positive scores for 2 samples
    import re
    mean = float(re.search(r"mean ([0-9.]+)", svfid_lines[0]).group(1))
    assert mean > 0


def test_temporal_extrapolation(netg, tmp_path):
    """--t-factor 2 doubles the generated clip length (fully-convolutional
    pyramid; the 3D counterpart of the 2D h/w-factor test)."""
    import cv2
    _main("generate", ["--netG", netg, "--output-dir", str(tmp_path),
                       "--num-samples", "1", "--batch-size", "1",
                       "--t-factor", "2.0"] + MODEL_ARGS)
    cap = cv2.VideoCapture(str(tmp_path / "sample_0.avi"))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    # base pyramid: td=13 at the stop scale; t-factor 2 -> 26 frames
    assert n == 26


def _write_synthetic_c3d(path, full=False):
    """A correctly-shaped Sports-1M-topology state dict (random values)."""
    import numpy as np
    import torch

    from hpvaegan_tpu.eval.c3d import C3D_LAYERS
    rng = np.random.default_rng(0)
    state, in_ch = {}, 3
    for name, feat in C3D_LAYERS:
        state[f"{name}.weight"] = torch.from_numpy(
            rng.standard_normal((feat, in_ch, 3, 3, 3)).astype("float32")
            * 0.05)
        state[f"{name}.bias"] = torch.zeros(feat)
        in_ch = feat
    torch.save(state, path)


def test_c3d_weights_env_flips_pretrained(netg, tmp_path, caplog,
                                          monkeypatch):
    """$C3D_WEIGHTS pointing at a correctly-shaped checkpoint flips the CLI
    into pretrained mode end-to-end (VERDICT r1 item 6): the RANDOM-C3D
    tag disappears and the file's sha256 is logged."""
    ckpt = tmp_path / "c3d_synth.pth"
    _write_synthetic_c3d(str(ckpt))
    monkeypatch.setenv("C3D_WEIGHTS", str(ckpt))
    with caplog.at_level(logging.INFO):
        _main("generate", ["--netG", netg, "--output-dir", str(tmp_path),
                           "--num-samples", "2", "--batch-size", "2",
                           "--svfid", "--svfid-layer", "conv2"] + MODEL_ARGS)
    svfid_lines = [r.message for r in caplog.records
                   if "SVFID[conv2]" in r.message]
    assert len(svfid_lines) == 1
    assert "RANDOM C3D" not in svfid_lines[0]  # pretrained: true e2e
    assert any("sha256" in r.message for r in caplog.records)


def test_c3d_weights_sha256_pin(tmp_path, monkeypatch):
    """$C3D_WEIGHTS_SHA256 mismatch aborts the load; the correct digest
    passes (verify-on-load, VERDICT r1 item 6)."""
    import pytest as _pytest

    from hpvaegan_tpu.eval.c3d import _file_sha256, load_c3d_torch
    ckpt = tmp_path / "c3d_synth.pth"
    _write_synthetic_c3d(str(ckpt))
    monkeypatch.setenv("C3D_WEIGHTS_SHA256", "0" * 64)
    with _pytest.raises(ValueError, match="sha256 mismatch"):
        load_c3d_torch(str(ckpt), "conv2")
    monkeypatch.setenv("C3D_WEIGHTS_SHA256", _file_sha256(str(ckpt)))
    params = load_c3d_torch(str(ckpt), "conv2")
    assert set(params["params"]) == {"conv1", "conv2"}


def test_c3d_wrong_shape_rejected(tmp_path):
    """A state dict with the right keys but wrong shapes is rejected by the
    structural verify-on-load."""
    import pytest as _pytest
    import torch

    from hpvaegan_tpu.eval.c3d import load_c3d_torch
    state = {"conv1.weight": torch.zeros(8, 3, 3, 3, 3),
             "conv1.bias": torch.zeros(8)}
    path = tmp_path / "bad.pth"
    torch.save(state, path)
    with _pytest.raises(ValueError, match="not a Sports-1M C3D"):
        load_c3d_torch(str(path), "conv1")


def test_svfid_requires_video(tmp_path):
    with pytest.raises(ValueError, match="video metric"):
        _main("generate", ["--netG", "/nonexistent", "--image-path",
                           os.path.join(os.path.dirname(__file__), "assets",
                                        "test_image.png"),
                           "--output-dir", str(tmp_path), "--svfid"])
