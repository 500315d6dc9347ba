"""Scanned multi-batch throughput: K pipeline steps per device dispatch.

Through this environment's relay, each jitted dispatch costs ~26-33 ms of
host-side round trip, so any model whose device step is faster than that is
DISPATCH-bound in the driver bench (tiny@416's device step is ~10 ms against
a 32 ms measured dispatch interval — tools/profile_int8.py vs BASELINE.md).
TPU-native fix: run K full uint8→NMS steps inside ONE jitted ``lax.scan``
over a pre-staged (K, B, H, W, 3) input — the dispatch cost amortizes K×
on any hardware (launch overhead exists without the relay too; the relay
just makes it dominant for small models).

    python tools/bench_scan.py --cfg yolov3-tiny.cfg --size 416 --batch 128 \
        --scan 8 [--precision int8] [--top-k 512]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from tools.bench_clock import enable_compile_cache
from yolov3_tpu.graph import load_graph
from yolov3_tpu.ops.preprocess import preprocess
from yolov3_tpu.weights import fold_raw, random_raw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov3-tiny.cfg")
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan", type=int, default=8,
                    help="pipeline steps per dispatch")
    ap.add_argument("--src-hw", default=None,
                    help="source frame resolution H,W (e.g. 1080,1920 for "
                         "the video-path row; default: net size)")
    ap.add_argument("--dispatches", type=int, default=4,
                    help="timed dispatches (distinct inputs)")
    ap.add_argument("--precision", choices=("bf16", "int8"), default="int8")
    ap.add_argument("--prob-thresh", type=float, default=0.05)
    ap.add_argument("--top-k", type=int, default=512)
    ap.add_argument("--int8-heads", action="store_true")
    args = ap.parse_args()
    enable_compile_cache()

    from yolov3_tpu.ops.nms import batched_nms_packed

    g = load_graph(Path(__file__).parent.parent / "models" / args.cfg)
    params = jax.device_put(jax.tree.map(jnp.asarray,
                                         fold_raw(random_raw(g, 0))))
    net_hw = (args.size, args.size)
    src_hw = (tuple(int(v) for v in args.src_hw.split(","))
              if args.src_hw else net_hw)
    rng = np.random.default_rng(3)

    if args.precision == "int8":
        from yolov3_tpu.quant import (calibrate_tensors, forward_packed_int8,
                                      quantize_weights)

        calib = [preprocess(jnp.asarray(
            rng.integers(0, 256, (8, *net_hw, 3), dtype=np.uint8)), net_hw)]
        scales = calibrate_tensors(g, params, calib, precision="bf16")
        qparams = jax.device_put(quantize_weights(
            g, params, include_heads=args.int8_heads))

        def fwd(fr):
            x = preprocess(fr[..., ::-1], net_hw)
            return forward_packed_int8(g, qparams, scales, x,
                                       prob_thresh=args.prob_thresh,
                                       precision="bf16", carrier="int8")
    else:
        from yolov3_tpu.model import forward_packed

        bparams = jax.device_put(jax.tree.map(
            lambda a: jnp.asarray(a, jnp.bfloat16), params))

        def fwd(fr):
            x = preprocess(fr[..., ::-1], net_hw)
            return forward_packed(g, bparams, x,
                                  prob_thresh=args.prob_thresh,
                                  precision="bf16")

    @jax.jit
    def run_scan(frames_k):  # (K, B, H, W, 3) uint8
        def body(carry, fr):
            payload, scores = fwd(fr)
            res = batched_nms_packed(payload, scores, top_k=args.top_k)
            return carry, (jnp.sum(res.scores), jnp.sum(res.valid))
        _, outs = lax.scan(body, jnp.float32(0), frames_k)
        return outs

    rng = np.random.default_rng(7)
    inputs = [jnp.asarray(rng.integers(
        0, 256, (args.scan, args.batch, *src_hw, 3), dtype=np.uint8))
        for _ in range(args.dispatches)]
    # warm/compile
    float(run_scan(inputs[0])[0][0])
    float(run_scan(inputs[-1])[0][0])

    best = 0.0
    per_block = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [run_scan(i) for i in inputs]
        for o in outs:
            float(o[0][0])
        dt = time.perf_counter() - t0
        rate = args.scan * args.batch * args.dispatches / dt
        per_block.append(round(rate, 1))
        best = max(best, rate)
    print(json.dumps({
        "cfg": g.name, "size": args.size, "src_hw": list(src_hw),
        "batch": args.batch,
        "scan": args.scan, "precision": args.precision,
        "top_k": args.top_k, "int8_heads": args.int8_heads,
        "img_s": round(best, 1), "blocks": per_block,
        "ms_per_batch": round(1e3 * args.batch / best, 2),
    }))


if __name__ == "__main__":
    main()
