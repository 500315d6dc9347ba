"""Serving-path benchmark: single-request latency + concurrent-load
throughput through the REAL HTTP stack (yolov3_tpu.serve), on the real chip.

Round-4 measurement (VERDICT round-3 item 3): BASELINE.md's serving row was
measured in round 1, before scan/pairmax/packed-decode/micro-batcher landed,
and serving throughput under concurrency had never been measured at all.
This tool stands the server up in-process (same code path as
``python -m yolov3_tpu.serve``), drives it with threaded HTTP clients
posting a real JPEG, and reports:

* sequential mode (1 client, no micro-batching): per-request latency
  p50/p90/p99 — the reference-style curl-one-image number;
* concurrent mode (N clients, ``--batch-window``): req/s, latency
  percentiles, and the coalesced batch-size distribution scraped from the
  server's own /metrics endpoint.

Run on the chip:

    python tools/bench_serve.py --config models/yolov3-tiny.cfg --size 416
    python tools/bench_serve.py --config models/yolov3.cfg --size 608 \
        --clients 16 --window-ms 5

Prints one JSON line per mode (sequential first, then concurrent unless
--sequential-only).
"""
import argparse
import json
import io
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _jpeg_bytes(hw=(720, 1280), seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return bytes(buf)


def _post(url, data, timeout=120.0):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": "image/jpeg"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        payload = json.loads(r.read())
    return (time.perf_counter() - t0) * 1e3, payload


def _stages(base):
    """The server's own per-request stage attribution (/stats, round 5) —
    the in-server counterpart of this bench's external timing, so the
    transport-vs-device split is observable from the server itself."""
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        return json.loads(r.read()).get("stages", {})


def _metrics(base):
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        return r.read().decode()


def _batch_hist(metrics_text):
    """Parse the coalesced-batch-size distribution from /metrics."""
    hist = {}
    for line in metrics_text.splitlines():
        if line.startswith("yolov3_device_batches_total{"):
            # yolov3_device_batches_total{size="16"} 12
            size = line.split('size="')[1].split('"')[0]
            hist[size] = int(float(line.rsplit(" ", 1)[1]))
    return hist


def run_load(base, jpeg, clients, per_client):
    lat = []
    errs = [0]
    lock = threading.Lock()

    def client(ci):
        for _ in range(per_client):
            try:
                ms, _ = _post(base + "/detect", jpeg)
            except Exception:
                with lock:
                    errs[0] += 1
                continue
            with lock:
                lat.append(ms)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return lat, errs[0], wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="models/yolov3-tiny.cfg")
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--quantize-int8", action="store_true",
                    help="serve the int8 PTQ tier (calibrated on random "
                         "frames — throughput measurement only)")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=8,
                    help="requests per client in concurrent mode")
    ap.add_argument("--seq-requests", type=int, default=20)
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-results", type=int, default=128,
                    help="Detector max_results (post-NMS survivors "
                         "returned per image) — the D2H payload is "
                         "max_results*24 bytes/image, the binding term "
                         "through this environment's ~150 KB/s relay D2H")
    ap.add_argument("--src-hw", default="720x1280")
    ap.add_argument("--sequential-only", action="store_true")
    ap.add_argument("--concurrent-only", action="store_true")
    args = ap.parse_args()

    repo = Path(__file__).parent.parent
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.serve import serve
    from yolov3_tpu.weights import random_raw, write_weights

    cfg = repo / args.config
    g = load_graph(cfg)
    with tempfile.NamedTemporaryFile(suffix=".weights") as f:
        write_weights(f.name, g, random_raw(g, seed=0))
        net = Darknet(cfg, precision=args.precision).load_weights(f.name)
    net_hw = (args.size, args.size)
    if args.quantize_int8:
        rng = np.random.default_rng(5)
        net.quantize_int8(rng.integers(0, 256, (8, *net_hw, 3),
                                       dtype=np.uint8), net_hw=net_hw)
    src_hw = tuple(int(v) for v in args.src_hw.split("x"))
    jpeg = _jpeg_bytes(src_hw)
    name = (f"{g.name}@{args.size} "
            f"{'int8' if args.quantize_int8 else args.precision}")

    def start(batch_window_s, max_batch):
        det = Detector(net, prob_thresh=0.3, net_hw=net_hw,
                       max_results=args.max_results)
        srv = serve(det, host="127.0.0.1", port=0, warmup_hw=src_hw,
                    batch_window_s=batch_window_s, max_batch=max_batch)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}"

    def pct(lat):
        if not lat:  # all requests failed: report it, don't crash numpy
            return {"p50_ms": None, "p90_ms": None, "p99_ms": None}
        return {k: round(float(np.percentile(lat, q)), 1)
                for k, q in (("p50_ms", 50), ("p90_ms", 90), ("p99_ms", 99))}

    if not args.concurrent_only:
        srv, base = start(0.0, 1)
        _post(base + "/detect", jpeg)  # compile/warm
        lat, errs, wall = run_load(base, jpeg, 1, args.seq_requests)
        out = {"mode": "sequential", "server": name,
               "max_results": args.max_results,
               "src_hw": args.src_hw, "requests": len(lat), "errors": errs,
               **pct(lat), "req_s": round(len(lat) / wall, 2),
               "stages": _stages(base)}
        print(json.dumps(out), flush=True)
        srv.shutdown()

    if not args.sequential_only:
        srv, base = start(args.window_ms / 1e3, args.max_batch)
        _post(base + "/detect", jpeg)
        # pre-warm the coalesced batch shapes a concurrent burst will hit
        # (the LRU jit cache compiles per batch size; an unwarmed size would
        # charge one client ~30 s of compile and poison the percentiles)
        warm_lat, _, _ = run_load(base, jpeg, args.clients, 2)
        lat, errs, wall = run_load(base, jpeg, args.clients, args.requests)
        hist = _batch_hist(_metrics(base))
        out = {"mode": "concurrent", "server": name,
               "clients": args.clients, "window_ms": args.window_ms,
               "max_batch": args.max_batch, "src_hw": args.src_hw,
               "max_results": args.max_results,
               "requests": len(lat), "errors": errs,
               **pct(lat), "req_s": round(len(lat) / wall, 2),
               "batch_size_hist_le": hist, "stages": _stages(base)}
        print(json.dumps(out), flush=True)
        srv.shutdown()


if __name__ == "__main__":
    main()
