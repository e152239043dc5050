"""Intra-scale checkpoint + resume (--save-interval / netG_mid).

The reference can only resume at scale boundaries (train_video.py:399-416),
so a failure near the end of a multi-hour scale replays the whole scale.
netG_mid carries params + BOTH optimizer states + the iteration counter in
one atomically-written file; together with the iteration-keyed device-cache
draw stream and the fold_in(key, iteration) step RNG, resuming from it is
BIT-EXACT: the test kills a real training subprocess with SIGKILL
mid-scale, resumes from whatever netG_mid survived, and requires the final
parameters to equal an uninterrupted run's exactly.
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from hpvaegan_tpu.utils.saver import restore_file

pytestmark = pytest.mark.slow

ASSET = os.path.join(os.path.dirname(__file__), "assets", "test_image.png")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "--image-path", ASSET, "--img-size", "16", "--min-size", "8",
    "--max-size", "16", "--niter", "6", "--vae-levels", "2",
    "--nfc", "8", "--latent-dim", "8", "--num-layer", "2",
    "--enc-blocks", "1", "--batch-size", "2", "--manualSeed", "7",
    "--scan-steps", "2",
]


def _env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1").strip()
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run(args, run_dir, wait=True):
    cmd = [sys.executable, os.path.join(REPO, "train_image.py")] + TINY + \
        ["--run-dir", str(run_dir)] + args
    proc = subprocess.Popen(cmd, env=_env(), cwd=REPO,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    if wait:
        assert proc.wait(timeout=900) == 0
    return proc


def _final_params(run_dir, experiment="experiment_0"):
    path = os.path.join(run_dir, "test_image", "DEBUG", experiment, "netG")
    raw = restore_file(path)
    leaves = []
    import jax
    jax.tree_util.tree_map(lambda x: leaves.append(np.asarray(x)),
                           raw["gvars"])
    return raw, leaves


def test_mid_scale_kill9_resume_bit_exact(tmp_path):
    # ---- uninterrupted reference run ----
    dir_a = tmp_path / "a"
    _run([], dir_a)
    raw_a, leaves_a = _final_params(dir_a)
    assert int(raw_a["scale"]) == 4

    # ---- interrupted run: SIGKILL once a GAN-phase netG_mid exists ----
    dir_b = tmp_path / "b"
    exp_b = os.path.join(dir_b, "test_image", "DEBUG", "experiment_0")
    mid_path = os.path.join(exp_b, "netG_mid")
    proc = _run(["--save-interval", "2"], dir_b, wait=False)
    deadline = time.monotonic() + 900
    killed = False
    try:
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                break  # finished before we could kill: handled below
            if os.path.exists(mid_path):
                try:
                    raw = restore_file(mid_path)
                except Exception:
                    time.sleep(0.05)
                    continue
                # wait for a GAN-phase mid checkpoint so the critic +
                # opt_d restore path is exercised (vae_levels=2 -> GAN
                # at scales 2..4)
                if int(raw["scale"]) >= 2:
                    proc.send_signal(signal.SIGKILL)
                    proc.wait(timeout=60)
                    killed = True
                    break
            time.sleep(0.05)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=60)
    assert killed, "run finished before a GAN-phase netG_mid appeared — " \
                   "raise --niter if this flakes"

    raw_mid = restore_file(mid_path)
    scale_mid = int(raw_mid["scale"])
    it_mid = int(raw_mid["iteration"])
    assert 0 < it_mid < 6
    assert raw_mid["dvars"], "GAN-phase mid checkpoint must carry the critic"

    # ---- resume from the surviving netG_mid ----
    _run(["--save-interval", "2", "--netG", mid_path], dir_b)
    raw_c, leaves_c = _final_params(dir_b, "experiment_1")
    assert int(raw_c["scale"]) == 4

    # bit-exact: the mid state is the uninterrupted run's state at
    # iteration it_mid, and every draw/key from there on is a pure
    # function of (seed, iteration)
    assert len(leaves_a) == len(leaves_c)
    for a, c in zip(leaves_a, leaves_c):
        np.testing.assert_array_equal(a, c)

    # the resumed run must NOT have re-appended noise amps
    with open(os.path.join(dir_b, "test_image", "DEBUG", "experiment_1",
                           "Noise_Amps.json")) as f:
        amps = json.load(f)["noise_amps"]
    assert len(amps) == 5
    # and earlier scales were not retrained (resume jumped to scale_mid)
    assert scale_mid >= 2
