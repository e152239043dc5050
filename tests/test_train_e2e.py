"""End-to-end integration: tiny 2D training run on the CPU backend
(SURVEY.md §4 "integration tests" — asserts checkpoint files, Noise_Amps
length == scales, loss finiteness, and resume-with-growth-replay)."""
import json
import os
import sys

import numpy as np
import pytest

ASSET = os.path.join(os.path.dirname(__file__), "assets", "test_image.png")

TINY_ARGS = [
    "--image-path", ASSET, "--img-size", "16", "--min-size", "8",
    "--max-size", "16", "--niter", "2", "--vae-levels", "2",
    "--nfc", "8", "--latent-dim", "8", "--num-layer", "2",
    "--enc-blocks", "1", "--batch-size", "2", "--manualSeed", "7",
]


def _run_train_image(extra, run_dir):
    import train_image
    argv = ["train_image.py"] + TINY_ARGS + ["--run-dir", str(run_dir)] + extra
    old = sys.argv
    sys.argv = argv
    try:
        train_image.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    run_dir = tmp_path_factory.mktemp("run")
    _run_train_image([], run_dir)
    return os.path.join(run_dir, "test_image", "DEBUG", "experiment_0")


def test_checkpoints_written(trained_dir):
    # 5 scales (8,10,12,14,16); vae_levels=2 -> GAN at scales 2,3,4
    for name in ["netG", "Noise_Amps", "Noise_Amps.json", "logbook.txt",
                 "netD_2", "netD_3", "netD_4"]:
        assert os.path.exists(os.path.join(trained_dir, name)), name
    assert not os.path.exists(os.path.join(trained_dir, "netD_0"))


def test_noise_amps_length_and_finiteness(trained_dir):
    with open(os.path.join(trained_dir, "Noise_Amps.json")) as f:
        data = json.load(f)
    amps = data["noise_amps"]
    assert len(amps) == 5
    assert amps[0] == 1.0
    assert all(np.isfinite(a) and a > 0 for a in amps)


def test_netg_checkpoint_contents(trained_dir):
    from hpvaegan_tpu.utils.saver import restore_file
    raw = restore_file(os.path.join(trained_dir, "netG"))
    assert int(raw["scale"]) == 4
    assert len(raw["gvars"]["body"]) == 4
    for leaf in raw["gvars"]["encode"]["params"].values():
        pass  # structure exists
    leaves = []
    import jax
    jax.tree_util.tree_map(lambda x: leaves.append(np.asarray(x)),
                           raw["gvars"])
    assert all(np.all(np.isfinite(l)) for l in leaves)


def test_scan_steps_e2e(tmp_path):
    """--scan-steps K: chunked lax.scan dispatch with a non-dividing niter
    (7 % 3 != 0) and --visualize print-interval boundary clamping."""
    import json as _json
    _run_train_image(["--scan-steps", "3", "--niter", "7", "--visualize",
                      "--print-interval", "5"], tmp_path / "scanrun")
    exp = os.path.join(tmp_path, "scanrun", "test_image", "DEBUG",
                       "experiment_0")
    with open(os.path.join(exp, "Noise_Amps.json")) as f:
        amps = _json.load(f)["noise_amps"]
    assert len(amps) == 5 and all(np.isfinite(a) for a in amps)
    assert os.path.exists(os.path.join(exp, "netG"))


def test_host_loader_e2e(tmp_path):
    """--host-loader: the prefetching host pipeline (BatchLoader) + the
    unfused scan path — no longer the default since the device-resident
    cache landed, so it needs its own CI drive."""
    import json as _json
    _run_train_image(["--host-loader", "--scan-steps", "3", "--niter", "6"],
                     tmp_path / "hostrun")
    exp = os.path.join(tmp_path, "hostrun", "test_image", "DEBUG",
                       "experiment_0")
    with open(os.path.join(exp, "Noise_Amps.json")) as f:
        amps = _json.load(f)["noise_amps"]
    assert len(amps) == 5 and all(np.isfinite(a) for a in amps)
    assert os.path.exists(os.path.join(exp, "netG"))


def test_scan_metrics_density_independent_of_k(tmp_path, monkeypatch):
    """TB scalar count per scale must be independent of --scan-steps: scan
    steps return the FULL (K,) metric stack and the trainer logs each
    iteration at its true index (VERDICT r1 item 9; reference logs per-iter,
    train_video.py:210-223)."""
    from collections import Counter

    from hpvaegan_tpu.utils import summaries

    counts = {}
    orig = summaries.TensorboardSummary.add_scalar

    def make_counter(label):
        c = Counter()
        counts[label] = c

        def patched(self, tag, value, step):
            c[tag] += 1
            return orig(self, tag, value, step)
        return patched

    # large print-interval avoids chunk clamping and visualization grids
    monkeypatch.setattr(summaries.TensorboardSummary, "add_scalar",
                        make_counter("k1"))
    _run_train_image(["--visualize", "--niter", "6", "--print-interval",
                      "100"], tmp_path / "k1")
    monkeypatch.setattr(summaries.TensorboardSummary, "add_scalar",
                        make_counter("k3"))
    _run_train_image(["--visualize", "--niter", "6", "--print-interval",
                      "100", "--scan-steps", "3"], tmp_path / "k3")
    assert counts["k1"] == counts["k3"], (counts["k1"], counts["k3"])
    # and the density is truly per-iteration: 6 iters x 5 scales
    assert counts["k1"]["Video/Scale 0/noise_amp"] == 6


def test_generator_vae_nb_e2e(tmp_path):
    """GeneratorVAE_nb trains end-to-end (EXTENSION: the reference trainers
    crash unpacking its 3-tuple stats, train_image.py:167 vs
    networks_2d.py:330; we wire kl_bern_criterion and prior sampling)."""
    import json as _json
    _run_train_image(["--generator", "GeneratorVAE_nb"], tmp_path / "nbrun")
    exp = os.path.join(tmp_path, "nbrun", "test_image", "DEBUG",
                       "experiment_0")
    with open(os.path.join(exp, "Noise_Amps.json")) as f:
        amps = _json.load(f)["noise_amps"]
    assert len(amps) == 5 and all(np.isfinite(a) for a in amps)
    # rand-mode generation from the prior
    import generate
    out = tmp_path / "nbgen"
    argv = ["generate.py", "--netG", os.path.join(exp, "netG"),
            "--image-path", ASSET, "--output-dir", str(out),
            "--generator", "GeneratorVAE_nb", "--num-samples", "2",
            "--img-size", "16", "--min-size", "8", "--max-size", "16",
            "--vae-levels", "2", "--nfc", "8", "--latent-dim", "8",
            "--num-layer", "2", "--enc-blocks", "1"]
    old = sys.argv
    sys.argv = argv
    try:
        generate.main()
    finally:
        sys.argv = old
    import cv2
    for i in range(2):
        img = cv2.imread(str(out / f"sample_{i}.png"))
        assert img is not None and img.shape == (16, 16, 3)


def test_resume_with_growth_replay(trained_dir, tmp_path):
    """--netG resume: replays init_next_stage scale times then restores
    (reference semantics train_image.py:421-434)."""
    netg = os.path.join(trained_dir, "netG")
    _run_train_image(["--netG", netg], tmp_path / "resume_run")
    resumed = os.path.join(tmp_path, "resume_run", "test_image", "DEBUG",
                           "experiment_0")
    assert os.path.exists(os.path.join(resumed, "netG"))
    from hpvaegan_tpu.utils.saver import restore_file
    raw = restore_file(os.path.join(resumed, "netG"))
    assert int(raw["scale"]) == 4
    # resumed run retrains only the last scale -> amps list keeps length 5
    assert len(np.asarray(raw["noise_amps"])) == 5
