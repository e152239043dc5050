"""Multi-host trainer correctness (SURVEY §5.8, VERDICT r3 missing #1).

The production path itself — ``train_video.py --spmd --distributed`` — is
driven end-to-end by TWO real processes (2 virtual CPU devices each,
cross-process 2x2 mesh) and must:

* produce final parameters matching a single-process run on the SAME
  2x2 mesh (the distributed run is an implementation detail, not a
  different training trajectory);
* write the experiment tree (checkpoints, config.json, logbook, TB
  events) from process 0 ONLY — exactly one experiment dir, no duplicate
  or torn files from process 1.

Plus unit tests of the multihost helpers' single-process degradations.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET = os.path.join(os.path.dirname(__file__), "assets", "test_video.avi")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _cli_args(run_dir: str) -> list:
    # tiny 2-scale pyramid; scan chunks exercise the fused device-cache
    # path, print-interval 2 + visualize exercises the collective
    # visualization path on both processes
    return ["--video-path", ASSET, "--img-size", "12", "--min-size", "8",
            "--max-size", "12", "--niter", "4", "--scan-steps", "2",
            "--nfc", "8", "--num-layer", "2", "--batch-size", "2",
            "--vae-levels", "1", "--latent-dim", "8", "--enc-blocks", "1",
            "--manualSeed", "11", "--spmd", "--mesh-shape", "2x2",
            "--visualize", "--print-interval", "2",
            "--no-cuda", "--run-dir", run_dir]


def _run_cli(args, env, timeout=900):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_video.py")] + args,
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=timeout)
    return proc


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={local_devices}"])
    env.pop("JAX_PLATFORMS", None)
    return env


def _load_params(path):
    import flax.serialization
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def test_two_process_cli_matches_single_process(tmp_path):
    # ---- single-process reference: same 2x2 mesh, 4 local devices ----
    ref_dir = str(tmp_path / "single")
    proc = _run_cli(_cli_args(ref_dir), _env(4))
    assert proc.returncode == 0, proc.stdout

    # ---- two processes x 2 local devices, cross-process 2x2 mesh ----
    dist_dir = str(tmp_path / "dist")
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = _env(2)
        env.update(HPVAEGAN_COORDINATOR=coord,
                   HPVAEGAN_NUM_PROCESSES="2",
                   HPVAEGAN_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train_video.py")]
            + _cli_args(dist_dir) + ["--distributed"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"

    # ---- process-0-only writes: exactly one experiment dir, full tree ----
    base = os.path.join(dist_dir, "test_video", "DEBUG")
    exps = sorted(os.listdir(base))
    assert exps == ["experiment_0"], exps
    exp = os.path.join(base, "experiment_0")
    for fname in ("netG", "netD_1", "Noise_Amps", "Noise_Amps.json",
                  "config.json", "logbook.txt"):
        assert os.path.exists(os.path.join(exp, fname)), fname
    assert not any(f.endswith(".tmp") for f in os.listdir(exp))

    # ---- same training trajectory ----
    # Tolerance note: the two layouts reduce collectives through different
    # codepaths (intra-process vs cross-process all-reduce), so their f32
    # rounding differs at ~1e-7/op and 8 adversarial iterations amplify it
    # to the 1e-3 scale (measured max rel diff 1.2% on a batch-stats mean).
    # The property under test is SEMANTIC equality — same seed, same data
    # shards, same draw streams; a real multi-host bug (torn batches,
    # per-process seeds, missing broadcast) diverges at O(1).  Exact
    # value-identity of the data/placement helpers is covered by the unit
    # tests below and tests/test_distributed.py.
    ref = _load_params(os.path.join(ref_dir, "test_video", "DEBUG",
                                    "experiment_0", "netG"))
    dist = _load_params(os.path.join(exp, "netG"))
    assert ref["scale"] == dist["scale"]
    np.testing.assert_allclose(ref["noise_amps"], dist["noise_amps"],
                               rtol=1e-3)

    flat_ref = jax_flatten(ref["gvars"])
    flat_dist = jax_flatten(dist["gvars"])
    assert flat_ref.keys() == flat_dist.keys()
    for k in flat_ref:
        np.testing.assert_allclose(
            flat_ref[k], flat_dist[k], rtol=2e-2, atol=2e-3,
            err_msg=f"param {k} diverged between single- and two-process")


def jax_flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(jax_flatten(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(jax_flatten(v, f"{prefix}/{i}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


# ---- single-process degradations of the multihost helpers ----

def test_global_put_single_process_matches_device_put(key):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hpvaegan_tpu.parallel import make_mesh
    from hpvaegan_tpu.parallel.multihost import global_put

    mesh = make_mesh((2, 4))
    x = np.arange(32, dtype=np.float32).reshape(4, 8)
    sharding = NamedSharding(mesh, P("data"))
    a = global_put(x, sharding)
    b = jax.device_put(x, sharding)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sharding=None degrades to plain device_put
    c = global_put(x, None)
    np.testing.assert_array_equal(np.asarray(c), x)


def test_agree_and_broadcast_single_process():
    from hpvaegan_tpu.parallel.multihost import (agree, barrier,
                                                 broadcast_pytree)

    assert agree(7) == 7
    tree = {"a": np.ones(3), "b": [np.zeros(2)]}
    out = broadcast_pytree(tree)
    np.testing.assert_array_equal(out["a"], tree["a"])
    barrier("noop")  # must be a no-op single-process


def test_fetch_replicates_sharded_array(key):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hpvaegan_tpu.parallel import make_mesh
    from hpvaegan_tpu.parallel.multihost import fetch

    mesh = make_mesh((2, 4))
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    a = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    np.testing.assert_array_equal(fetch(a), x)
    np.testing.assert_array_equal(fetch(x), x)  # plain numpy passthrough


def test_nonprimary_saver_writes_nothing(tmp_path, monkeypatch):
    """A Saver constructed on a non-primary process must keep paths but
    never touch the filesystem."""
    from hpvaegan_tpu.core.config import Config
    from hpvaegan_tpu.parallel import multihost
    from hpvaegan_tpu.utils.saver import VideoSaver

    monkeypatch.setattr(multihost, "is_primary", lambda: False)
    cfg = Config(video_path="clip.avi", checkname="DEBUG",
                 run_dir=str(tmp_path))
    saver = VideoSaver(cfg)
    saver.save_json({"x": 1}, "config.json")
    saver.save_checkpoint({"data": np.ones(3)}, "netG")
    saver.wait()
    saver.save_video(np.zeros((2, 4, 4, 3), np.float32), "v.avi", fps=4.0)
    assert not os.path.exists(saver.experiment_dir)
    assert os.listdir(str(tmp_path)) == []
