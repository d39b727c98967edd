"""Measured serving throughput/latency row (VERDICT r4 item 7).

Drives the real HTTP daemon (cli/serve.py) end-to-end over localhost with
the flagship checkpoint: steady-state frames/s and per-request latency
for 1 sequential client vs N concurrent clients.  The threaded daemon
overlaps request decode + response encode with another request's device
compute behind the engine lock; concurrency therefore buys throughput up
to the device-leg ceiling while single-client latency stays unchanged.

Protocol notes (CLAUDE.md):
  - every request carries FRESH frames (the axon runtime memoizes
    repeated (executable, inputs) calls — identical payloads would
    measure the memoizer);
  - serving throughput is an END-TO-END wall-clock metric by definition
    (HTTP + decode + device + postproc + encode), so wall-clock is the
    right clock here, unlike kernel benchmarks;
  - warmup requests are excluded (first request pays the compile).

Run ON THE CHIP (~3 min):
  python scripts/bench_serve.py [--frames 16] [--requests 8] [--clients 4]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.client import HTTPConnection
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def make_payload(rng, n_frames: int, size: int) -> bytes:
    """Fresh synthetic crop stack (bright blobs, same recipe as bench.py)."""
    frames = np.empty((n_frames, size, size), np.uint16)
    yy, xx = np.mgrid[0:size, 0:size]
    for t in range(n_frames):
        mask = np.zeros((size, size), bool)
        for _ in range(12):
            cy, cx = rng.integers(10, size - 10, 2)
            ry, rx = rng.integers(4, 9, 2)
            mask |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        img = mask * 28000.0 + rng.normal(0, 900, (size, size)) + 2500.0
        frames[t] = np.clip(img, 0, 65535).astype(np.uint16)
    buf = io.BytesIO()
    np.save(buf, frames, allow_pickle=False)
    return buf.getvalue()


def post(addr, payload: bytes) -> float:
    t0 = time.perf_counter()
    conn = HTTPConnection(*addr, timeout=600)
    conn.request("POST", "/segment", body=payload)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    assert resp.status == 200, data[:200]
    return time.perf_counter() - t0


def run_clients(addr, payload_lists) -> tuple[float, list]:
    """Each inner list is one client's request sequence; clients run on
    threads concurrently.  Returns (wall seconds, all latencies)."""
    lats: list = [[] for _ in payload_lists]

    def client(i):
        for p in payload_lists[i]:
            lats[i].append(post(addr, p))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(payload_lists))]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0, [v for l in lats for v in l]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", nargs="+",
                   default=["_scale_flagship/models/trainset256/"
                            "distance_model_01"])
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--frames", type=int, default=16,
                   help="frames per request")
    p.add_argument("--requests", type=int, default=8,
                   help="timed requests per client")
    p.add_argument("--clients", type=int, default=4)
    args = p.parse_args(argv)

    from microbeseg_tpu.cli.serve import engine_from_args, serve

    class _A:  # engine_from_args contract
        model = args.model
        thresholds = [0.10, 0.45]
        batch_size = 16
        sliding_window = False
        tile_size = 1024
        tile_overlap = 128
        quantize = False
        tta = False

    engine = engine_from_args(_A)
    httpd = serve(engine, {"model": args.model,
                           "label_type": engine.label_type},
                  "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    addr = httpd.server_address
    rng = np.random.default_rng(0)

    try:
        # warmup: compile + calibrate (excluded from timing)
        for _ in range(2):
            post(addr, make_payload(rng, args.frames, args.size))

        # 1 sequential client
        seq_payloads = [[make_payload(rng, args.frames, args.size)
                         for _ in range(args.requests)]]
        t_seq, lat_seq = run_clients(addr, seq_payloads)
        seq_fps = args.requests * args.frames / t_seq

        # N concurrent clients, same per-client request count
        conc_payloads = [[make_payload(rng, args.frames, args.size)
                          for _ in range(args.requests)]
                         for _ in range(args.clients)]
        t_conc, lat_conc = run_clients(addr, conc_payloads)
        conc_fps = args.clients * args.requests * args.frames / t_conc

        report = {
            "frames_per_request": args.frames,
            "size": args.size,
            "seq_frames_per_s": round(seq_fps, 1),
            "seq_latency_s": {
                "p50": round(float(np.median(lat_seq)), 3),
                "p95": round(float(np.quantile(lat_seq, 0.95)), 3)},
            "clients": args.clients,
            "conc_frames_per_s": round(conc_fps, 1),
            "conc_latency_s": {
                "p50": round(float(np.median(lat_conc)), 3),
                "p95": round(float(np.quantile(lat_conc, 0.95)), 3)},
            "conc_over_seq": round(conc_fps / seq_fps, 2),
        }
        print(json.dumps(report, indent=1))
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
