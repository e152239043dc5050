"""generate.py --sifid end-to-end on a tiny 2D checkpoint (SinGAN's 2D
metric, absent from the reference — SURVEY.md §6; the 2D counterpart of
tests/test_svfid_cli.py)."""
import logging
import os
import re
import sys

import pytest

ASSET = os.path.join(os.path.dirname(__file__), "assets", "test_image.png")

MODEL_ARGS = [
    "--image-path", ASSET, "--img-size", "16", "--min-size", "8",
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
    run_dir = tmp_path_factory.mktemp("sifidrun")
    _main("train_image", MODEL_ARGS + ["--niter", "2", "--batch-size", "2",
                                       "--manualSeed", "7",
                                       "--run-dir", str(run_dir)])
    return os.path.join(run_dir, "test_image", "DEBUG", "experiment_0",
                        "netG")


def test_generate_sifid(netg, tmp_path, caplog):
    with caplog.at_level(logging.INFO):
        _main("generate", ["--netG", netg, "--output-dir", str(tmp_path),
                           "--num-samples", "2", "--batch-size", "2",
                           "--sifid", "--sifid-layer", "Conv2d_2b_3x3",
                           "--metrics"] + MODEL_ARGS)
    assert os.path.exists(tmp_path / "sample_0.png")
    lines = [r.message for r in caplog.records
             if "SIFID[Conv2d_2b_3x3]" in r.message]
    assert len(lines) == 1
    # no pretrained weights on this machine -> random-stem mode flagged
    assert "RANDOM stem" in lines[0]
    mean = float(re.search(r"mean ([0-9.]+)", lines[0]).group(1))
    assert mean > 0


def _write_synthetic_inception(path):
    """A correctly-shaped torchvision-inception-stem state dict (random
    conv weights, non-trivial BN stats so folding is exercised)."""
    import numpy as np
    import torch

    from hpvaegan_tpu.eval._sifid import STEM_LAYERS
    rng = np.random.default_rng(0)
    state, in_ch = {}, 3
    for name, feat, _, _ in STEM_LAYERS:
        state[f"{name}.conv.weight"] = torch.from_numpy(
            rng.standard_normal((feat, in_ch, 3, 3)).astype("float32")
            * 0.05)
        state[f"{name}.bn.weight"] = torch.from_numpy(
            (0.5 + rng.random(feat)).astype("float32"))
        state[f"{name}.bn.bias"] = torch.zeros(feat)
        state[f"{name}.bn.running_mean"] = torch.from_numpy(
            rng.standard_normal(feat).astype("float32") * 0.1)
        state[f"{name}.bn.running_var"] = torch.from_numpy(
            (0.5 + rng.random(feat)).astype("float32"))
        in_ch = feat
    torch.save(state, path)


def test_inception_weights_env_flips_pretrained(netg, tmp_path, caplog,
                                                monkeypatch):
    """$INCEPTION_WEIGHTS pointing at a correctly-shaped checkpoint flips
    the CLI into pretrained mode end-to-end: the RANDOM-stem tag disappears
    and the file's sha256 is logged (same contract as $C3D_WEIGHTS)."""
    ckpt = tmp_path / "inception_synth.pth"
    _write_synthetic_inception(str(ckpt))
    monkeypatch.setenv("INCEPTION_WEIGHTS", str(ckpt))
    with caplog.at_level(logging.INFO):
        _main("generate", ["--netG", netg, "--output-dir", str(tmp_path),
                           "--num-samples", "2", "--batch-size", "2",
                           "--sifid", "--sifid-layer", "Conv2d_2b_3x3"]
              + MODEL_ARGS)
    lines = [r.message for r in caplog.records
             if "SIFID[Conv2d_2b_3x3]" in r.message]
    assert len(lines) == 1
    assert "RANDOM stem" not in lines[0]  # pretrained: true e2e
    assert any("sha256" in r.message for r in caplog.records)


def test_inception_sha256_pin(tmp_path, monkeypatch):
    """$INCEPTION_WEIGHTS_SHA256 mismatch aborts; the correct digest
    passes (verify-on-load, mirroring the C3D pin)."""
    from hpvaegan_tpu.eval._sifid import load_inception_torch
    from hpvaegan_tpu.eval.c3d import _file_sha256
    ckpt = tmp_path / "inception_synth.pth"
    _write_synthetic_inception(str(ckpt))
    monkeypatch.setenv("INCEPTION_WEIGHTS_SHA256", "0" * 64)
    with pytest.raises(ValueError, match="sha256 mismatch"):
        load_inception_torch(str(ckpt), "pool1")
    monkeypatch.setenv("INCEPTION_WEIGHTS_SHA256", _file_sha256(str(ckpt)))
    params = load_inception_torch(str(ckpt), "pool1")
    assert set(params["params"]) == {"Conv2d_1a_3x3", "Conv2d_2a_3x3",
                                     "Conv2d_2b_3x3"}


def test_sifid_requires_image(tmp_path):
    with pytest.raises(ValueError, match="image metric"):
        _main("generate", ["--netG", "/nonexistent", "--video-path",
                           os.path.join(os.path.dirname(__file__), "assets",
                                        "test_video.avi"),
                           "--output-dir", str(tmp_path), "--sifid"])
