"""Scale-boundary overlap A/B: e2e wall time of train_video.py with and
without --compile-ahead --decode-ahead.

Per-scale recompilation (~30 s warm / ~260 s cold through the remote-compile
relay) and the per-scale full-video re-decode are dead device time at every
pyramid boundary; the two *-ahead flags move both off the critical path
(train/precompile.py, data/video.py prefetch_frames).  This script measures
what that buys end-to-end.

Usage: [PX=128] [NITER=300] [FRAMES=600] [SRC_W=480] [SRC_H=360]
       [PREP=1] [COLD=0] python benchmarks/boundary_overlap_ab.py

Protocol (CLAUDE.md): fresh subprocesses, serialized (never two TPU
processes at once), nothing else on the host.  A PREP run with the same
geometry first warms the persistent compilation cache so both arms measure
the warm-cache boundary (the honest steady-state).  COLD=1 instead gives
each arm its own EMPTY cache dir (HPVAEGAN_CACHE) — the first-run
experience, where every boundary pays the full remote compile and the
overlap win is much larger.  Numbers recorded in BENCHMARKS.md
"Scale-boundary overlap".
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PX = int(os.environ.get("PX", "128"))
NITER = int(os.environ.get("NITER", "300"))
FRAMES = int(os.environ.get("FRAMES", "600"))
SRC_W = int(os.environ.get("SRC_W", "480"))
SRC_H = int(os.environ.get("SRC_H", "360"))
CLIP = f"/tmp/bench_clip_{FRAMES}_{SRC_W}x{SRC_H}.avi"

BASE = [sys.executable, os.path.join(ROOT, "train_video.py"),
        "--video-path", CLIP, "--img-size", str(PX), "--niter", str(NITER),
        "--fast-grads", "--bf16", "--scan-steps", "10", "--manualSeed", "7"]


def make_clip() -> None:
    """Synthesize a moving-gradient clip (content is irrelevant to timing;
    MJPG matches the reference's own writer, utils/saver.py:8-19)."""
    if os.path.exists(CLIP):
        return
    import cv2
    import numpy as np
    wr = cv2.VideoWriter(CLIP, cv2.VideoWriter_fourcc(*"MJPG"), 24.0,
                         (SRC_W, SRC_H))
    yy, xx = np.mgrid[0:SRC_H, 0:SRC_W].astype(np.float32)
    for t in range(FRAMES):
        r = 127.5 + 127.5 * np.sin(0.02 * xx + 0.05 * t)
        g = 127.5 + 127.5 * np.sin(0.03 * yy - 0.04 * t)
        b = 127.5 + 127.5 * np.sin(0.015 * (xx + yy) + 0.03 * t)
        wr.write(np.stack([b, g, r], -1).astype(np.uint8))
    wr.release()


def run(tag: str, extra) -> dict:
    env = dict(os.environ)
    out = os.path.join("/tmp", f"overlap_{tag}")
    subprocess.run(["rm", "-rf", out], check=True)
    if os.environ.get("COLD", "0") == "1":  # per-arm empty compilation cache
        cache = os.path.join("/tmp", f"overlap_cache_{tag}")
        subprocess.run(["rm", "-rf", cache], check=True)
        env["HPVAEGAN_CACHE"] = cache
    t0 = time.monotonic()
    p = subprocess.run(BASE + ["--run-dir", out] + list(extra),
                       capture_output=True, text=True, env=env, cwd=ROOT)
    wall = time.monotonic() - t0
    log = p.stdout + p.stderr
    if p.returncode != 0:
        print(log[-4000:])
        raise SystemExit(f"{tag}: rc={p.returncode}")
    ready = [float(m) for m in
             re.findall(r"compile-ahead scale \d+: \d+ programs ready in "
                        r"([0-9.]+)s", log)]
    return {"tag": tag, "wall_s": round(wall, 1), "ahead_ready_s": ready}


def main() -> None:
    make_clip()
    results = []
    cold = os.environ.get("COLD", "0") == "1"
    if not cold and os.environ.get("PREP", "1") == "1":  # warm the cache
        results.append(run("prep", []))
    results.append(run("baseline", []))
    results.append(run("overlap", ["--compile-ahead", "--decode-ahead"]))
    base = next(r for r in results if r["tag"] == "baseline")
    over = next(r for r in results if r["tag"] == "overlap")
    print(json.dumps({
        "px": PX, "niter": NITER, "frames": FRAMES,
        "runs": results,
        "speedup_e2e": round(base["wall_s"] / over["wall_s"], 3),
    }))


if __name__ == "__main__":
    main()
