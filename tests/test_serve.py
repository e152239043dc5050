"""hpvaegan-serve end-to-end on a tiny 2D checkpoint: stdio JSON-lines and
HTTP transports, seed determinism, rec mode, and bad-request survival (no
serving surface exists in the reference — SURVEY.md §1)."""
import io
import json
import os
import sys
import threading
import urllib.error
import urllib.request

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
    run_dir = tmp_path_factory.mktemp("srun")
    _main("train_image", ["--image-path", ASSET, "--niter", "2",
                          "--batch-size", "2", "--manualSeed", "3",
                          "--run-dir", str(run_dir)] + MODEL_ARGS)
    return os.path.join(run_dir, "test_image", "DEBUG", "experiment_0",
                        "netG")


@pytest.fixture(scope="module")
def server(netg, tmp_path_factory):
    from hpvaegan_tpu.cli.serve import Server
    from hpvaegan_tpu.core.config import Config
    from hpvaegan_tpu.serving import SamplerSession, apply_snapshot

    out = tmp_path_factory.mktemp("serve_out")
    cfg = Config()
    cfg.netG = netg
    applied = apply_snapshot(cfg, netg, set(), user_chose_source=False)
    assert "image_path" in applied  # the snapshot alone configures the model
    cfg.adjust_scales()
    sess = SamplerSession(cfg, batch_size=2, manual_seed=0)
    return Server(sess, str(out), default_num=2, seed0=0)


def _roundtrip(server, lines):
    from hpvaegan_tpu.cli.serve import serve_stdio
    out_stream = io.StringIO()
    serve_stdio(server, io.StringIO(lines), out_stream)
    return [json.loads(x) for x in out_stream.getvalue().splitlines()]


def test_stdio_roundtrip(server):
    ready, resp, bye = _roundtrip(
        server, '{"id": "a", "num_samples": 3, "seed": 5}\n'
                '{"shutdown": true}\n')
    assert ready["event"] == "ready" and ready["ndim"] == 2
    assert resp["ok"] and resp["id"] == "a" and len(resp["paths"]) == 3
    assert resp["latency_ms"] > 0
    for path in resp["paths"]:
        img = cv2.imread(path)
        assert img is not None and img.shape == (16, 16, 3)


def test_write_false_skips_files(server):
    """"write": false must skip the sample files (throughput/streaming
    mode) and still report device_ms + sample_shape; determinism with the
    written variant under the same seed is covered by the shared key
    derivation (seed -> base_key, independent of write)."""
    ready, resp, bye = _roundtrip(
        server, '{"id": "w0", "num_samples": 2, "seed": 5, "write": false}\n'
                '{"shutdown": true}\n')
    assert resp["ok"] and resp["paths"] == []
    assert resp["sample_shape"] == [16, 16, 3]
    assert resp["device_ms"] > 0
    assert resp["latency_ms"] >= resp["device_ms"]
    out_dir = server.out_dir
    assert not any(f.startswith("w0_") for f in os.listdir(out_dir))


def test_stdio_bad_requests_keep_serving(server):
    ready, bad_json, bad_mode, good = _roundtrip(
        server, 'not json\n'
                '{"mode": "nope"}\n'
                '{"num_samples": 1}\n')
    assert not bad_json["ok"] and "bad json" in bad_json["error"]
    assert not bad_mode["ok"] and "nope" in bad_mode["error"]
    assert good["ok"] and len(good["paths"]) == 1  # server survived


def test_stdio_non_object_json_survives(server):
    """Valid JSON that isn't an object (null, lists) must answer an error,
    not kill the persistent server (code-review finding)."""
    ready, a, b, good = _roundtrip(
        server, 'null\n[1]\n{"num_samples": 1}\n')
    assert not a["ok"] and a["client_error"]
    assert not b["ok"] and b["client_error"]
    assert good["ok"]


def test_server_fault_not_client_error(server):
    """Server-side faults (disk, XLA/relay) are flagged client_error=False
    so HTTP can answer 500, not 400 (code-review finding)."""
    orig = server.sess.sample_batch

    def boom(key):
        raise OSError("disk full")

    server.sess.sample_batch = boom
    try:
        resp = server.handle({"num_samples": 1, "prefix": "fault"})
    finally:
        server.sess.sample_batch = orig
    assert not resp["ok"] and resp["client_error"] is False
    assert "disk full" in resp["error"]


def test_warmup_unknown_mode_raises(server):
    with pytest.raises(ValueError, match="unknown warmup mode"):
        server.sess.warmup(("rnad",))


def test_seed_determinism(server):
    a = server.handle({"num_samples": 2, "seed": 11, "prefix": "da"})
    b = server.handle({"num_samples": 2, "seed": 11, "prefix": "db"})
    c = server.handle({"num_samples": 2, "seed": 12, "prefix": "dc"})
    assert a["ok"] and b["ok"] and c["ok"]
    ia = cv2.imread(a["paths"][0]).astype(np.int32)
    ib = cv2.imread(b["paths"][0]).astype(np.int32)
    ic = cv2.imread(c["paths"][0]).astype(np.int32)
    assert np.array_equal(ia, ib)          # same seed == same sample
    assert np.abs(ia - ic).mean() > 0      # different seed differs


def test_rec_mode(server):
    resp = server.handle({"mode": "rec", "num_samples": 1, "prefix": "rec"})
    assert resp["ok"]
    img = cv2.imread(resp["paths"][0])
    assert img is not None and img.shape == (16, 16, 3)


def test_prefix_validation(server):
    resp = server.handle({"num_samples": 1, "prefix": "../escape"})
    assert not resp["ok"] and "prefix" in resp["error"]


@pytest.fixture(scope="module")
def cserver(server, tmp_path_factory):
    """Coalescing variant sharing the module's SamplerSession (capacity =
    batch_size = 2); generous window so concurrently-submitted requests
    reliably share a dispatch on the 1-core CI host."""
    from hpvaegan_tpu.cli.serve import Server
    out = tmp_path_factory.mktemp("serve_out_coalesce")
    srv = Server(server.sess, str(out), default_num=2, seed0=0,
                 coalesce_ms=500.0)
    yield srv
    srv.coalescer.close()


def test_coalesce_concurrent_singles_share_a_dispatch(cserver):
    """Two concurrent unseeded 1-sample requests must pack into ONE
    device dispatch (the scheduler's whole point)."""
    before = cserver.coalescer.dispatches
    resps = [None, None]

    def go(i):
        resps[i] = cserver.handle({"num_samples": 1, "prefix": f"co{i}"})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None and r["ok"] for r in resps), resps
    assert all(len(r["paths"]) == 1 for r in resps)
    assert cserver.coalescer.dispatches == before + 1
    imgs = [cv2.imread(r["paths"][0]).astype(np.int32) for r in resps]
    assert np.abs(imgs[0] - imgs[1]).mean() > 0  # distinct slots


def test_coalesce_large_request_spans_dispatches(cserver):
    """num_samples > capacity (with a remainder) rides several dispatches
    of the fixed-batch program and still returns exactly num samples."""
    before = cserver.coalescer.dispatches
    resp = cserver.handle({"num_samples": 5, "prefix": "big"})
    assert resp["ok"] and len(resp["paths"]) == 5
    assert cserver.coalescer.dispatches == before + 3  # ceil(5/2)


def test_coalesce_exact_multiple_bypasses_queue(cserver):
    """num_samples that exactly fills whole dispatches (num %% capacity
    == 0) has no waste slots to reclaim — it must take the solo path so
    FIFO packing can't split it across interleaved dispatches (measured
    1.5x slower at the batch-8 full-batch cell, BENCHMARKS.md r5)."""
    before = cserver.coalescer.dispatches
    resp = cserver.handle({"num_samples": 4, "prefix": "full"})
    assert resp["ok"] and len(resp["paths"]) == 4
    assert cserver.coalescer.dispatches == before  # queue untouched


def test_coalesce_seeded_request_bypasses_queue(cserver, server):
    """An explicit seed must keep the solo bit-reproducible path: same
    sample bytes whether the server coalesces or not."""
    before = cserver.coalescer.dispatches
    a = cserver.handle({"num_samples": 1, "seed": 11, "prefix": "cs"})
    b = server.handle({"num_samples": 1, "seed": 11, "prefix": "ns"})
    assert a["ok"] and b["ok"]
    assert cserver.coalescer.dispatches == before  # queue untouched
    ia = cv2.imread(a["paths"][0]).astype(np.int32)
    ib = cv2.imread(b["paths"][0]).astype(np.int32)
    assert np.array_equal(ia, ib)


def test_coalesce_fault_fails_request_not_worker(cserver):
    """A dispatch fault answers the packed requests as server faults and
    the worker keeps serving later requests."""
    orig = cserver.sess.sample_batch

    def boom(key):
        raise OSError("hbm gone")

    cserver.sess.sample_batch = boom
    try:
        resp = cserver.handle({"num_samples": 1, "prefix": "cf"})
    finally:
        cserver.sess.sample_batch = orig
    assert not resp["ok"] and resp["client_error"] is False
    assert "hbm gone" in resp["error"]
    again = cserver.handle({"num_samples": 1, "prefix": "cf2"})
    assert again["ok"] and len(again["paths"]) == 1


def test_http_roundtrip(server):
    from hpvaegan_tpu.cli.serve import serve_http

    box = {}
    started = threading.Event()

    def ready_cb(httpd):
        box["httpd"] = httpd
        started.set()

    t = threading.Thread(target=serve_http,
                         args=(server, "127.0.0.1", 0, ready_cb),
                         daemon=True)
    t.start()
    assert started.wait(30)
    port = box["httpd"].server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["event"] == "ready"

        body = json.dumps({"id": "h1", "num_samples": 2,
                           "seed": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            resp = json.loads(r.read())
        assert resp["ok"] and len(resp["paths"]) == 2
        assert all(cv2.imread(p) is not None for p in resp["paths"])

        # bad request -> 400 + error payload, server stays up
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b'{"mode": "x"}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400
    finally:
        box["httpd"].shutdown()
        t.join(timeout=30)
