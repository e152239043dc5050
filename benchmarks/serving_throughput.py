#!/usr/bin/env python
"""Sustained-load serving benchmark (VERDICT r3 weak #4).

Drives a live ``hpvaegan-serve`` HTTP server with concurrent clients and
the stdio transport with a sequential client, and reports requests/s,
samples/s and latency percentiles per (mode, num_samples, concurrency,
write) cell.  The device work is serialized inside the server by design
(one sampler program); what concurrency buys is the overlap of the
POST-device work — MJPG/PNG encode + disk write, which runs OUTSIDE the
device lock — with the next request's device batch.  ``write:false``
cells isolate the pure device+transport throughput.

Usage (full-res 3D checkpoint, TPU):
  python benchmarks/serving_throughput.py \
      --netG run/wingsuit/soak10000/experiment_1/netG \
      --requests 16 --concurrency 1,4 --batch-size 2

Prints one JSON document; paste the table into BENCHMARKS.md.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_healthy(port: int, timeout_s: float = 900.0) -> dict:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                return json.loads(r.read())
        except Exception:
            time.sleep(2.0)
    raise RuntimeError("server never became healthy")


def post(port: int, body: dict, timeout_s: float = 600.0) -> dict:
    data = json.dumps(body).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate", data=data,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout_s) as r:
        return json.loads(r.read())


def run_cell(port: int, mode: str, num_samples: int, concurrency: int,
             write: bool, n_requests: int, seeded: bool = True) -> dict:
    lat, dev = [], []
    errors = []
    lock = threading.Lock()
    idx = [0]

    def client():
        while True:
            with lock:
                if idx[0] >= n_requests:
                    return
                i = idx[0]
                idx[0] += 1
            body = {"mode": mode, "num_samples": num_samples,
                    "write": write, "prefix": f"bench{i}"}
            if seeded:
                # seeded requests pin the sample stream but are excluded
                # from --coalesce-ms batching by design; pass --unseeded
                # to measure the coalescing path
                body["seed"] = i
            t0 = time.perf_counter()
            try:
                resp = post(port, body)
                if not resp.get("ok"):
                    raise RuntimeError(resp.get("error"))
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(str(e))
                return
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                lat.append(dt)
                dev.append(float(resp.get("device_ms", 0.0)))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        return {"error": errors[0]}
    lat.sort()
    return {
        "requests": len(lat),
        "wall_s": round(wall, 2),
        "req_per_s": round(len(lat) / wall, 3),
        "samples_per_s": round(len(lat) * num_samples / wall, 2),
        "lat_p50_ms": round(statistics.median(lat), 1),
        "lat_p95_ms": round(lat[max(0, int(len(lat) * 0.95) - 1)], 1),
        "device_ms_mean": round(statistics.mean(dev), 1) if dev else None,
    }


def bench_stdio(args, cells) -> list:
    """Sequential JSON-lines client over the stdio transport."""
    cmd = [sys.executable, os.path.join(REPO, "serve.py"),
           "--netG", args.netG, "--batch-size", str(args.batch_size),
           "--num-samples", str(args.batch_size), "--manualSeed", "5",
           "--warm", "rand"] + args.extra
    proc = subprocess.Popen(cmd, cwd=REPO, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, text=True)
    rows = []
    try:
        ready = json.loads(proc.stdout.readline())
        assert ready.get("event") == "ready", ready
        for num_samples, write in cells:
            # one untimed warm request per cell shape
            proc.stdin.write(json.dumps(
                {"num_samples": num_samples, "write": write, "seed": 0,
                 "prefix": "warm"}) + "\n")
            proc.stdin.flush()
            json.loads(proc.stdout.readline())
            lat = []
            t0 = time.perf_counter()
            for i in range(args.requests):
                r0 = time.perf_counter()
                proc.stdin.write(json.dumps(
                    {"num_samples": num_samples, "write": write, "seed": i,
                     "prefix": f"sb{i}"}) + "\n")
                proc.stdin.flush()
                resp = json.loads(proc.stdout.readline())
                assert resp.get("ok"), resp
                lat.append((time.perf_counter() - r0) * 1e3)
            wall = time.perf_counter() - t0
            lat.sort()
            rows.append({"transport": "stdio", "num_samples": num_samples,
                         "write": write, "concurrency": 1,
                         "requests": len(lat),
                         "req_per_s": round(len(lat) / wall, 3),
                         "samples_per_s": round(
                             len(lat) * num_samples / wall, 2),
                         "lat_p50_ms": round(statistics.median(lat), 1)})
        proc.stdin.write(json.dumps({"shutdown": True}) + "\n")
        proc.stdin.flush()
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--netG", required=True)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--requests", type=int, default=12)
    p.add_argument("--concurrency", type=str, default="1,4")
    p.add_argument("--port", type=int, default=18431)
    p.add_argument("--mode", type=str, default="rand")
    p.add_argument("--skip-stdio", action="store_true")
    p.add_argument("--unseeded", action="store_true",
                   help="omit per-request seeds (required for requests to "
                        "qualify for --coalesce-ms batching)")
    args, extra = p.parse_known_args()
    args.extra = extra  # unrecognized flags pass through to serve.py

    cells = [(1, False), (args.batch_size, False), (args.batch_size, True)]
    conc = [int(c) for c in args.concurrency.split(",")]

    cmd = [sys.executable, os.path.join(REPO, "serve.py"),
           "--netG", args.netG, "--batch-size", str(args.batch_size),
           "--num-samples", str(args.batch_size), "--manualSeed", "5",
           "--warm", "rand", "--port", str(args.port)] + args.extra
    server = subprocess.Popen(cmd, cwd=REPO)
    rows = []
    try:
        info = wait_healthy(args.port)
        for num_samples, write in cells:
            # warm this cell shape once, untimed
            post(args.port, {"mode": args.mode, "num_samples": num_samples,
                             "write": write, "seed": 0, "prefix": "warm"})
            for c in conc:
                cell = run_cell(args.port, args.mode, num_samples, c,
                                write, args.requests,
                                seeded=not args.unseeded)
                rows.append({"transport": "http",
                             "num_samples": num_samples, "write": write,
                             "concurrency": c, "seeded": not args.unseeded,
                             **cell})
                print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    finally:
        server.terminate()
        try:
            server.wait(timeout=30)
        except subprocess.TimeoutExpired:
            server.kill()

    if not args.skip_stdio:
        rows += bench_stdio(args, cells)

    print(json.dumps({"netG": args.netG, "batch_size": args.batch_size,
                      "server_info": {k: info.get(k) for k in
                                      ("ndim", "scale", "batch_size")},
                      "cells": rows}, indent=1))


if __name__ == "__main__":
    main()
