"""Hang watchdog (utils/watchdog.py): a daemon thread that converts silent
TPU-relay wedges into clean resumable exits (SURVEY §5.3 — the reference
has no failure detection at all)."""
import threading
import time

from hpvaegan_tpu.utils.watchdog import Watchdog


def _fired_box():
    box = {"fired": None}
    event = threading.Event()

    def on_fire(age, context):
        box["fired"] = (age, context)
        event.set()

    return box, event, on_fire


def test_fires_on_stale_heartbeat():
    box, event, on_fire = _fired_box()
    wd = Watchdog(0.2, context="scale 9 iteration 1", on_fire=on_fire,
                  poll_s=0.05).start()
    try:
        assert event.wait(5)
        age, context = box["fired"]
        assert age > 0.2 and context == "scale 9 iteration 1"
    finally:
        wd.stop()


def test_beats_keep_it_quiet():
    box, event, on_fire = _fired_box()
    wd = Watchdog(0.3, on_fire=on_fire, poll_s=0.05).start()
    try:
        for i in range(8):
            time.sleep(0.1)
            wd.beat(f"iteration {i}")
        assert box["fired"] is None
    finally:
        wd.stop()
    # after stop() the thread is gone — no late fire
    time.sleep(0.5)
    assert box["fired"] is None


def test_disabled_by_default():
    wd = Watchdog(0.0).start()
    assert wd._thread is None  # timeout 0 = off (the --watchdog default)
    wd.stop()


def test_trainer_integration_beats(tmp_path):
    """A tiny training run with --watchdog well above its duration completes
    normally (the loop's beats keep the watchdog quiet)."""
    import os
    import sys
    ASSET = os.path.join(os.path.dirname(__file__), "assets",
                         "test_image.png")
    import train_image
    argv = ["train_image.py", "--image-path", ASSET, "--img-size", "8",
            "--min-size", "8", "--max-size", "8", "--niter", "2",
            "--vae-levels", "2", "--nfc", "8", "--latent-dim", "8",
            "--num-layer", "2", "--enc-blocks", "1", "--batch-size", "2",
            "--manualSeed", "7", "--watchdog", "600",
            "--run-dir", str(tmp_path)]
    old = sys.argv
    sys.argv = argv
    try:
        train_image.main()
    finally:
        sys.argv = old
    assert os.path.isfile(os.path.join(
        tmp_path, "test_image", "DEBUG", "experiment_0", "netG"))
