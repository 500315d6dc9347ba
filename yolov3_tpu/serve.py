"""Minimal production-style serving endpoint over a :class:`Detector`.

Stdlib-only HTTP server: POST an encoded image (JPEG/PNG bytes) to ``/detect``
→ JSON detections in source-image pixels. Startup pre-compiles the pipeline
(`Detector.warmup`) so the first request doesn't pay the TPU compile.

    python -m yolov3_tpu.serve --config models/yolov3.cfg \
        --weights models/yolov3.weights --port 8500 [--precision bf16]

    curl -s --data-binary @dog.jpg localhost:8500/detect | jq .

Endpoints: ``POST /detect`` (image bytes → detections),
``GET /healthz`` (readiness), ``GET /stats`` (request counters/latency).

Single-threaded handler by design: one TPU, one pipeline — concurrency
belongs in batching (clients that need throughput should send batches to a
directory/stream pipeline instead); the handler itself is already overlapped
with NIC/decode work by cv2/JAX releasing the GIL.
"""
from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np


class _Stats:
    def __init__(self):
        self.requests = 0
        self.errors = 0
        self.total_latency = 0.0
        self.started = time.time()


def make_handler(detector, class_names, stats: _Stats):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging, not stderr
            import logging

            logging.getLogger("yolov3_tpu.serve").info(fmt, *args)

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/stats":
                mean = (stats.total_latency / stats.requests
                        if stats.requests else 0.0)
                self._json(200, {
                    "requests": stats.requests, "errors": stats.errors,
                    "mean_latency_ms": round(mean * 1e3, 2),
                    "uptime_s": round(time.time() - stats.started, 1)})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/detect":
                self._json(404, {"error": "unknown path"})
                return
            t0 = time.perf_counter()
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0 or length > 64 * 1024 * 1024:
                    raise ValueError(f"bad Content-Length {length}")
                data = self.rfile.read(length)
                frame = cv2.imdecode(np.frombuffer(data, np.uint8),
                                     cv2.IMREAD_COLOR)
                if frame is None:
                    raise ValueError("could not decode image")
            except Exception as e:  # noqa: BLE001 - request validation
                stats.errors += 1
                self._json(400, {"error": str(e)})
                return
            try:
                # detect_mixed letterboxes on the host -> ONE compiled
                # executable serves any client resolution (detect_batch
                # would compile ~60s per novel source shape, stalling the
                # single-threaded server)
                (det,) = detector.detect_mixed([frame])
                out = [{
                    "bbox_tlbr": [round(float(v), 2) for v in box],
                    "score": round(float(s), 4),
                    "class_id": int(c),
                    "class_name": (class_names[int(c)] if class_names
                                   and 0 <= int(c) < len(class_names)
                                   else str(int(c))),
                } for box, s, c in zip(det.bbox_tlbr, det.class_prob,
                                       det.class_idx)]
                dt = time.perf_counter() - t0
                stats.requests += 1
                stats.total_latency += dt
                self._json(200, {"detections": out,
                                 "latency_ms": round(dt * 1e3, 2),
                                 "image_hw": list(frame.shape[:2])})
            except Exception as e:  # noqa: BLE001 - serving boundary
                stats.errors += 1
                # inference failures are server faults, not client errors
                self._json(500, {"error": str(e)})

    return Handler


def serve(detector, class_names=None, host: str = "127.0.0.1",
          port: int = 8500, warmup_hw: Optional[tuple] = (720, 1280),
          server_cls=HTTPServer):
    """Start the blocking HTTP serving loop (returns the server if
    ``server_cls`` overrides serve_forever, e.g. in tests)."""
    from . import native

    stats = _Stats()
    if warmup_hw:
        # warm the host-letterboxed pipeline (what /detect uses when the C++
        # loader is available — one executable for every client resolution)
        detector.warmup(1, tuple(warmup_hw),
                        host_preprocessed=native.available())
    server = server_cls((host, port), make_handler(detector, class_names,
                                                   stats))
    return server


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="yolov3_tpu.serve")
    ap.add_argument("--config", "-C", default="models/yolov3.cfg")
    ap.add_argument("--weights", "-W", required=True)
    ap.add_argument("--class-names", "-N", default="models/coco.names")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--prob-thresh", type=float, default=0.05)
    ap.add_argument("--iou-thresh", type=float, default=0.3)
    ap.add_argument("--precision", choices=("default", "highest", "bf16"),
                    default="bf16")
    ap.add_argument("--net-size", type=int, default=None)
    ap.add_argument("--warmup-hw", default="720x1280",
                    help="source resolution to pre-compile for (HxW), or "
                         "'none'")
    args = ap.parse_args(argv)

    from pathlib import Path

    from .inference import Detector
    from .model import Darknet
    from .utils.drawing import load_class_names

    precision = None if args.precision == "default" else args.precision
    net = Darknet(args.config, precision=precision)
    net.load_weights(args.weights)
    net_hw = (args.net_size, args.net_size) if args.net_size else None
    detector = Detector(net, prob_thresh=args.prob_thresh,
                        iou_thresh=args.iou_thresh, net_hw=net_hw)
    names = (load_class_names(args.class_names)
             if Path(args.class_names).exists() else None)
    warmup = (None if args.warmup_hw == "none"
              else tuple(int(v) for v in args.warmup_hw.split("x")))

    server = serve(detector, names, args.host, args.port, warmup)
    print(f"serving on http://{args.host}:{args.port} "
          f"(POST /detect, GET /healthz, GET /stats)")
    server.serve_forever()


if __name__ == "__main__":
    main()
