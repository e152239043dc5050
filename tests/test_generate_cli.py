"""End-to-end tests for the standalone generate.py CLI (the sampling entry
point the reference lacks — SURVEY.md §5.8 gap, BASELINE config 5): rand
sampling, reconstruction, pyramid injection, and spatial extrapolation on a
tiny 2D checkpoint."""
import os
import sys

import cv2
import numpy as np
import pytest

ASSET = os.path.join(os.path.dirname(__file__), "assets", "test_image.png")

MODEL_ARGS = [
    "--img-size", "16", "--min-size", "8", "--max-size", "16",
    "--vae-levels", "2", "--nfc", "8", "--latent-dim", "8",
    "--num-layer", "2", "--enc-blocks", "1",
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
    run_dir = tmp_path_factory.mktemp("grun")
    _main("train_image", ["--image-path", ASSET, "--niter", "2",
                          "--batch-size", "2", "--manualSeed", "3",
                          "--run-dir", str(run_dir)] + MODEL_ARGS)
    return os.path.join(run_dir, "test_image", "DEBUG", "experiment_0",
                        "netG")


def _gen(netg, out, extra):
    _main("generate", ["--netG", netg, "--image-path", ASSET,
                       "--output-dir", str(out), "--batch-size", "2"]
          + MODEL_ARGS + extra)


def test_rand_samples(netg, tmp_path):
    _gen(netg, tmp_path, ["--num-samples", "3", "--metrics"])
    for i in range(3):
        img = cv2.imread(str(tmp_path / f"sample_{i}.png"))
        assert img is not None and img.shape == (16, 16, 3)
    # independent noise -> distinct samples
    a = cv2.imread(str(tmp_path / "sample_0.png")).astype(np.int32)
    b = cv2.imread(str(tmp_path / "sample_2.png")).astype(np.int32)
    assert np.abs(a - b).mean() > 0


def test_rec_mode(netg, tmp_path):
    _gen(netg, tmp_path, ["--mode", "rec", "--num-samples", "2",
                          "--metrics"])
    # rec mode is stochastic (train-mode reparameterize samples eps per
    # element, networks_2d.py:36-42) — assert valid outputs only
    for i in range(2):
        img = cv2.imread(str(tmp_path / f"sample_{i}.png"))
        assert img is not None and img.shape == (16, 16, 3)


def test_inject_scale(netg, tmp_path):
    """sample_init pyramid-injection hook (networks_2d.py:233-236)."""
    _gen(netg, tmp_path, ["--inject-scale", "1", "--num-samples", "2"])
    for i in range(2):
        img = cv2.imread(str(tmp_path / f"inject_{i}.png"))
        assert img is not None and img.shape == (16, 16, 3)


def test_spatial_extrapolation(netg, tmp_path):
    """--h-factor/--w-factor resample the pyramid geometry: the trained
    stages run at scaled spatial sizes (fully-convolutional)."""
    _gen(netg, tmp_path, ["--num-samples", "1", "--h-factor", "2.0",
                          "--w-factor", "1.5"])
    img = cv2.imread(str(tmp_path / "sample_0.png"))
    assert img is not None and img.shape == (32, 24, 3)


def test_mesh_sharded_generation(netg, tmp_path):
    """--mesh-shape 2x4 on the 8-virtual-device CPU mesh: multi-seed
    sampling sharded batch-over-data, H-over-spatial."""
    _gen(netg, tmp_path, ["--num-samples", "4", "--mesh-shape", "2x4"])
    imgs = [cv2.imread(str(tmp_path / f"sample_{i}.png")) for i in range(4)]
    assert all(im is not None and im.shape == (16, 16, 3) for im in imgs)
    # seeds differ across the sharded batch
    assert np.abs(imgs[0].astype(np.int32) - imgs[3].astype(np.int32)).mean() > 0


def test_config_snapshot_alone_suffices(netg, tmp_path):
    """`generate.py --netG <ckpt>` with NO model/pyramid/source flags must
    rebuild the training module tree from the experiment's config.json
    snapshot (VERDICT r1 item 4)."""
    _main("generate", ["--netG", netg, "--output-dir", str(tmp_path),
                       "--num-samples", "2"])
    for i in range(2):
        img = cv2.imread(str(tmp_path / f"sample_{i}.png"))
        assert img is not None and img.shape == (16, 16, 3)


def test_config_snapshot_cli_override(netg, tmp_path):
    """Explicit CLI flags win over the snapshot (extrapolated img-size
    here would fail at restore if the snapshot were ignored)."""
    _main("generate", ["--netG", netg, "--output-dir", str(tmp_path),
                       "--num-samples", "1", "--h-factor", "2.0"])
    img = cv2.imread(str(tmp_path / "sample_0.png"))
    assert img is not None and img.shape == (32, 16, 3)


def test_missing_checkpoint_fails(tmp_path):
    with pytest.raises(RuntimeError, match="no <G> checkpoint"):
        _gen("/does/not/exist", tmp_path, [])
