#!/usr/bin/env python
"""Persistent sampling server (``hpvaegan-serve``).

The one-shot ``generate.py`` CLI pays model build + XLA compile
(~30-260 s on the TPU relay) per invocation; this server pays it ONCE at
startup — checkpoint restore, module-tree rebuild from the experiment's
``config.json`` snapshot, jit + warmup — then serves sampling requests at
device latency (70-250 ms/batch at the full 256 px geometry, BENCHMARKS.md
"Full-resolution generation throughput").  No serving surface exists in
the reference (SURVEY.md §1: "no serving layer").

Two transports share one request handler:

* **stdio** (default): one JSON object per stdin line, one JSON response
  per stdout line.  Composable and test-friendly::

      echo '{"num_samples": 4, "seed": 7}' | \
          hpvaegan-serve --netG run/clip/DEBUG/experiment_0/netG

* **HTTP** (``--port N``): ``POST /generate`` with the same JSON body;
  ``GET /healthz`` for liveness.  Stdlib ``ThreadingHTTPServer``; device
  work is serialized by a lock (one sampler program, deterministic HBM).

Request fields (all optional): ``mode`` ("rand"|"rec", default rand),
``num_samples`` (default --num-samples), ``seed`` (int; default = a
per-request counter folded into --manualSeed), ``prefix`` (output file
name prefix, default the request id), ``write`` (false = skip the sample
files — streaming/throughput mode; the response carries shapes and
timings only).  Responses carry the written file paths, the device
latency (``device_ms``, the lock-held section) and the end-to-end
``latency_ms`` including encode+write, which runs OUTSIDE the device
lock so concurrent clients overlap encode with the next device batch.

``--coalesce-ms W`` adds a batched request scheduler: the jitted sampler
runs a FIXED batch per dispatch, so a 1-sample request wastes the other
slots and k concurrent 1-sample requests cost k serialized dispatches.
With coalescing, UNSEEDED rand-mode requests queue into shared
dispatches — a device worker packs up to ``--batch-size`` samples per
dispatch (waiting at most W ms for co-travellers) and hands each request
its slice.  All slots of one dispatch share one PRNG key, which is
exactly the iid-draw semantics of a normal batch, and the server invents
keys for unseeded requests anyway — no request-visible semantics change.
Requests that pass an explicit ``seed`` (and all rec-mode requests)
bypass the queue and keep their solo, bit-reproducible dispatch path.
"""
import argparse
import json
import logging
import os
import sys
import threading
import time

import jax

if "--no-cuda" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from hpvaegan_tpu.serving import SamplerSession, apply_snapshot


def build_parser() -> argparse.ArgumentParser:
    # same model/pyramid/override surface as generate.py (the snapshot
    # restores training flags; explicit flags win), plus the server knobs
    from hpvaegan_tpu.cli.generate import build_parser as gen_parser
    p = gen_parser()
    p.description = "persistent sampling server (stdio JSON-lines or HTTP)"
    p.add_argument("--port", type=int, default=0,
                   help="serve HTTP on this port (default: stdio JSON lines)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--warm", type=str, default="rand",
                   help="comma-separated modes to pre-compile at startup "
                        "(rand,rec); empty to skip warmup")
    p.add_argument("--coalesce-ms", type=float, default=0.0,
                   help="batched request scheduler: pack unseeded rand "
                        "requests into shared device dispatches, waiting "
                        "up to this many ms to fill a batch (0 = off; "
                        "seeded/rec requests always dispatch solo)")
    return p


class CoalescingDispatcher:
    """Cross-request micro-batching onto the fixed-batch device program.

    One daemon worker owns the coalesced dispatches: transport threads
    ``submit()`` an entry (``num`` samples wanted) and block; the worker
    drains the queue in arrival order, packs up to ``capacity`` sample
    slots per dispatch — waiting at most ``window_s`` for co-travellers
    when a batch isn't full — runs ONE ``sample_batch`` under the
    server's device lock, and distributes row slices back.  A request
    larger than the capacity simply spans several dispatches.  Faults in
    a dispatch fail only the requests packed into it; the worker
    survives.
    """

    def __init__(self, sess, device_lock: threading.Lock,
                 window_s: float, seed0: int):
        self.sess = sess
        self.device_lock = device_lock
        self.window_s = window_s
        self.capacity = sess.batch_size
        self.cond = threading.Condition()
        self.queue: list = []          # entries in arrival order
        self.running = True
        self.dispatches = 0            # observability + tests
        self._key = jax.random.fold_in(jax.random.PRNGKey(seed0),
                                       0x7fffffff)
        self.worker = threading.Thread(target=self._run, daemon=True)
        self.worker.start()

    def submit(self, num: int) -> list:
        """Block until ``num`` sample rows are produced; returns a list of
        row arrays (chunks).  Raises the dispatch's exception on fault."""
        entry = {"remaining": num, "chunks": [], "done": threading.Event(),
                 "error": None}
        with self.cond:
            if not self.running:
                raise RuntimeError("dispatcher closed")
            self.queue.append(entry)
            self.cond.notify_all()
        entry["done"].wait()
        if entry["error"] is not None:
            raise entry["error"]
        return entry["chunks"]

    def close(self) -> None:
        with self.cond:
            self.running = False
            self.cond.notify_all()
        self.worker.join(timeout=10)

    def _pack(self) -> list:
        """Under self.cond: take (entry, take) pairs filling <= capacity
        slots from the queue front."""
        plan, fill = [], 0
        for entry in self.queue:
            take = min(entry["remaining"], self.capacity - fill)
            if take > 0:
                plan.append((entry, take))
                fill += take
            if fill == self.capacity:
                break
        return plan

    def _run(self) -> None:
        while True:
            with self.cond:
                while self.running and not self.queue:
                    self.cond.wait()
                if not self.running:
                    for entry in self.queue:
                        entry["error"] = RuntimeError("dispatcher closed")
                        entry["done"].set()
                    self.queue.clear()
                    return
                # under-full batch: linger up to the window for
                # co-travellers (new arrivals notify the condition)
                deadline = time.monotonic() + self.window_s
                while (self.running
                       and sum(e["remaining"] for e in self.queue)
                       < self.capacity):
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self.cond.wait(timeout=left)
                plan = self._pack()
                key = self._key = jax.random.fold_in(self._key, 1)
            try:
                with self.device_lock:
                    out = self.sess.sample_batch(key)
            except Exception as e:  # fail only this dispatch's requests
                with self.cond:
                    self.dispatches += 1
                    for entry, _ in plan:
                        if entry in self.queue:
                            self.queue.remove(entry)
                        entry["error"] = e
                        entry["done"].set()
                continue
            with self.cond:
                self.dispatches += 1
                offset = 0
                for entry, take in plan:
                    entry["chunks"].append(out[offset:offset + take])
                    offset += take
                    entry["remaining"] -= take
                    if entry["remaining"] == 0:
                        self.queue.remove(entry)
                        entry["done"].set()


class Server:
    """Transport-agnostic request handler around a SamplerSession."""

    def __init__(self, sess: SamplerSession, out_dir: str,
                 default_num: int, seed0: int, coalesce_ms: float = 0.0):
        self.sess = sess
        self.out_dir = out_dir
        self.default_num = default_num
        self.seed0 = seed0
        self.counter = 0
        self.lock = threading.Lock()  # serialize device work across threads
        self.coalescer = (CoalescingDispatcher(sess, self.lock,
                                               coalesce_ms / 1e3, seed0)
                          if coalesce_ms > 0 else None)
        os.makedirs(out_dir, exist_ok=True)

    def info(self) -> dict:
        return {"ok": True, "event": "ready", "ndim": self.sess.ndim,
                "scale": self.sess.scale,
                "batch_size": self.sess.batch_size,
                "generator": self.sess.cfg.generator,
                "coalesce": self.coalescer is not None,
                "output_dir": self.out_dir}

    def handle(self, req) -> dict:
        """Serve one request dict.  Never raises: bad requests come back
        ``{"ok": False, "client_error": True}``, server-side faults (disk,
        XLA/relay) ``{"ok": False, "client_error": False}`` — transports
        map the flag to their status signalling (HTTP 400 vs 500).

        Only the DEVICE work holds the lock: encoding/writing the sample
        files happens in the calling transport thread afterwards, so under
        concurrent clients the next request's device batch overlaps this
        one's MJPG/PNG encode (measured: the encode is comparable to the
        device latency at 256 px on this 1-core host —
        benchmarks/serving_throughput.py)."""
        rid = req.get("id", None) if isinstance(req, dict) else None
        try:
            if not isinstance(req, dict):
                raise ValueError(f"request must be a JSON object, "
                                 f"got {type(req).__name__}")
            plan = self._parse(req, rid)
            t0 = time.perf_counter()
            if self.coalescer is not None and plan["coalesce"]:
                # device_ms for a coalesced request spans queue wait +
                # its shared dispatches (the per-request device cost is
                # not separable once slots are shared)
                outs = self.coalescer.submit(plan["num"])
            else:
                with self.lock:
                    outs = self._device_batches(plan)
            device_ms = (time.perf_counter() - t0) * 1e3
            resp = self._finish(plan, outs, rid)
            resp["device_ms"] = round(device_ms, 2)
            resp["latency_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
            return resp
        except (ValueError, TypeError, KeyError) as e:
            return {"id": rid, "ok": False, "client_error": True,
                    "error": f"{type(e).__name__}: {e}"}
        except Exception as e:  # server fault must not kill the server
            logging.exception("request failed server-side")
            return {"id": rid, "ok": False, "client_error": False,
                    "error": f"{type(e).__name__}: {e}"}

    def _parse(self, req: dict, rid) -> dict:
        mode = req.get("mode", "rand")
        if mode not in ("rand", "rec"):
            raise ValueError(f"unknown mode {mode!r} (rand|rec)")
        num = int(req.get("num_samples", self.default_num))
        if not 1 <= num <= 4096:
            raise ValueError(f"num_samples {num} out of range [1, 4096]")
        write = bool(req.get("write", True))
        with self.lock:
            self.counter += 1
            seq = self.counter
        seed = req.get("seed", None)
        base_key = (jax.random.PRNGKey(int(seed)) if seed is not None
                    else jax.random.fold_in(
                        jax.random.PRNGKey(self.seed0), seq))
        prefix = str(req.get("prefix", rid if rid is not None else
                             f"req{seq}"))
        if os.path.sep in prefix or prefix in ("", ".", ".."):
            raise ValueError(f"bad prefix {prefix!r}")
        # coalescible = the server was free to choose the key anyway.
        # Exact-multiple-of-capacity requests bypass the queue: they have
        # no waste slots to reclaim, and FIFO slot-packing would SPLIT
        # them across dispatches whenever arrivals interleave — measured
        # 1.5x slower at the batch-8 full-batch 8-client cell
        # (2.45 -> 1.66 req/s, BENCHMARKS.md r5 serving table) with zero
        # packing upside.  Partial-batch requests (incl. num > capacity
        # with a remainder) keep the queue path, where packing wins 3.1x.
        cap = self.coalescer.capacity if self.coalescer is not None else 0
        return {"mode": mode, "num": num, "write": write,
                "base_key": base_key, "prefix": prefix,
                "coalesce": (mode == "rand" and seed is None
                             and not (cap and num % cap == 0))}

    def _device_batches(self, plan: dict) -> list:
        """The device-lock section: dispatch + fetch, no disk IO."""
        outs = []
        produced = 0
        batch_idx = 0
        while produced < plan["num"]:
            key = jax.random.fold_in(plan["base_key"], 1000 + batch_idx)
            if plan["mode"] == "rec":
                out = self.sess.reconstruct_batch(key)
            else:
                out = self.sess.sample_batch(key)
            outs.append(out)
            produced += out.shape[0]
            batch_idx += 1
        return outs

    def _finish(self, plan: dict, outs: list, rid) -> dict:
        """Post-lock: encode + write sample files (skipped for
        ``"write": false`` throughput/streaming requests)."""
        resp = {"id": rid, "ok": True, "mode": plan["mode"],
                "num_samples": plan["num"]}
        if not plan["write"]:
            resp["paths"] = []
            resp["sample_shape"] = list(outs[0].shape[1:])
            return resp
        paths = []
        produced = 0
        for out in outs:
            for b in range(out.shape[0]):
                if produced >= plan["num"]:
                    break
                paths.append(self.sess.write_sample(
                    out[b],
                    os.path.join(self.out_dir,
                                 f"{plan['prefix']}_{produced}")))
                produced += 1
        resp["paths"] = paths
        return resp


def serve_stdio(server: Server, in_stream, out_stream) -> None:
    """One JSON request per line in, one JSON response per line out.
    A line ``{"shutdown": true}`` (or EOF) stops the server."""
    print(json.dumps(server.info()), file=out_stream, flush=True)
    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"ok": False, "error": f"bad json: {e}"}),
                  file=out_stream, flush=True)
            continue
        if isinstance(req, dict) and req.get("shutdown"):
            print(json.dumps({"ok": True, "event": "shutdown"}),
                  file=out_stream, flush=True)
            return
        print(json.dumps(server.handle(req)), file=out_stream, flush=True)


def serve_http(server: Server, host: str, port: int,
               ready_cb=None) -> None:
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, server.info())
            else:
                self._send(404, {"ok": False, "error": "GET /healthz only"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"ok": False,
                                 "error": "POST /generate only"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
            except Exception as e:
                self._send(400, {"ok": False, "error": f"bad json: {e}"})
                return
            resp = server.handle(req)
            code = 200 if resp.get("ok") else (
                400 if resp.get("client_error") else 500)
            self._send(code, resp)

        def log_message(self, fmt, *args):
            logging.info("http: " + fmt % args)

    httpd = ThreadingHTTPServer((host, port), Handler)
    logging.info(f"serving on http://{host}:{httpd.server_address[1]} "
                 f"(POST /generate, GET /healthz)")
    if ready_cb is not None:
        ready_cb(httpd)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


def main() -> None:
    from hpvaegan_tpu.serving import config_from_cli_args, explicit_cli_keys
    parser = build_parser()
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = config_from_cli_args(args)
    apply_snapshot(cfg, args.netG, explicit_cli_keys(build_parser),
                   user_chose_source=bool(args.video_path or args.image_path))
    cfg.adjust_scales()

    sess = SamplerSession(cfg, batch_size=args.batch_size,
                          manual_seed=args.manualSeed,
                          h_factor=args.h_factor, w_factor=args.w_factor,
                          t_factor=args.t_factor, mesh_shape=args.mesh_shape)
    out_dir = args.output_dir or os.path.join(os.path.dirname(cfg.netG),
                                              "serve")
    server = Server(sess, out_dir, default_num=args.num_samples,
                    seed0=args.manualSeed, coalesce_ms=args.coalesce_ms)

    warm = [m.strip() for m in args.warm.split(",") if m.strip()]
    if warm:
        t0 = time.perf_counter()
        sess.warmup(warm)
        logging.info(f"warmup({','.join(warm)}): "
                     f"{time.perf_counter() - t0:.1f}s")

    if args.port:
        serve_http(server, args.host, args.port)
    else:
        serve_stdio(server, sys.stdin, sys.stdout)


if __name__ == "__main__":
    main()
