"""Benchmark harness — prints ONE JSON line for the driver.

Tracked metric (BASELINE.json): images/sec/chip @608 batch end-to-end
inference (uint8 frames → on-device preprocess → forward → decode → batched
NMS). ``vs_baseline`` is the ratio against the measured reference-equivalent
PyTorch-CPU pipeline (torch module-list forward + host numpy NMS — the
reference's structure per SURVEY.md §3.1), denominator cached in
``BENCH_TORCH_BASELINE.json`` after first measurement.

Real darknet weights are not downloadable in this environment (zero egress);
both sides run the same synthesized weights — throughput is weight-agnostic.

Usage: python bench.py [--quick] [--batch 32] [--size 608] [--remeasure-baseline]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
BASELINE_CACHE = REPO / "BENCH_TORCH_BASELINE.json"


def measure_tpu(graph, params, frames, iters, prob_thresh=0.05,
                precision=None):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.model import forward_compact
    from yolov3_tpu.ops.nms import batched_nms_compact
    from yolov3_tpu.ops.preprocess import preprocess

    net_hw = (frames.shape[1], frames.shape[2])

    @jax.jit
    def run(params, frames_u8):
        x = preprocess(frames_u8[..., ::-1], net_hw)
        boxes, scores, classes = forward_compact(graph, params, x,
                                                 precision=precision)
        res = batched_nms_compact(boxes, scores, classes,
                                  prob_thresh=prob_thresh)
        # reduce to scalars ON DEVICE: fetching full NMS buffers through this
        # environment's TPU relay runs at ~150 KB/s (a tunnel artifact, not
        # chip D2H) and would swamp the measurement; completion of these
        # scalars implies the whole step executed
        return jnp.sum(res.scores), jnp.sum(res.valid)

    dev_params = jax.device_put(params)
    # distinct pre-staged input per iteration (defeats any execution
    # memoization; real serving overlaps H2D with compute)
    rng = np.random.default_rng(7)
    batches = [jnp.asarray(rng.integers(0, 256, frames.shape, dtype=np.uint8))
               for _ in range(iters)]
    # warmup/compile (block via scalar fetch — block_until_ready is
    # fire-and-forget through the relay)
    float(run(dev_params, batches[0])[0])
    float(run(dev_params, batches[-1])[0])
    t0 = time.perf_counter()
    outs = [run(dev_params, b) for b in batches]  # enqueue all (pipelined)
    for o in outs:
        float(o[0])
    dt = time.perf_counter() - t0
    return frames.shape[0] * iters / dt


def measure_tpu_int8(graph, params, frames, iters, prob_thresh=0.05):
    """int8 PTQ path (calibrated on random frames — throughput-only here;
    accuracy calibration uses real images via Darknet.quantize_int8)."""
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.ops.nms import batched_nms_compact
    from yolov3_tpu.ops.preprocess import preprocess
    from yolov3_tpu.quant import (calibrate, forward_compact_int8,
                                  quantize_weights)

    net_hw = (frames.shape[1], frames.shape[2])
    dev_params = jax.device_put(jax.tree.map(jnp.asarray, params))
    rng = np.random.default_rng(3)
    calib = [preprocess(jnp.asarray(
        rng.integers(0, 256, (8, *net_hw, 3), dtype=np.uint8)), net_hw)]
    scales = calibrate(graph, dev_params, calib, precision="bf16")
    qparams = jax.device_put(quantize_weights(graph, dev_params))

    @jax.jit
    def run(qparams, frames_u8):
        x = preprocess(frames_u8[..., ::-1], net_hw)
        boxes, scores, classes = forward_compact_int8(
            graph, qparams, scales, x, precision="bf16")
        res = batched_nms_compact(boxes, scores, classes,
                                  prob_thresh=prob_thresh)
        return jnp.sum(res.scores), jnp.sum(res.valid)

    rng = np.random.default_rng(7)
    batches = [jnp.asarray(rng.integers(0, 256, frames.shape, dtype=np.uint8))
               for _ in range(iters)]
    float(run(qparams, batches[0])[0])
    float(run(qparams, batches[-1])[0])
    t0 = time.perf_counter()
    outs = [run(qparams, b) for b in batches]
    for o in outs:
        float(o[0])
    return frames.shape[0] * iters / (time.perf_counter() - t0)


def measure_torch_cpu(graph, raw, size, batch, iters):
    """Reference-equivalent pipeline: torch forward + host numpy NMS."""
    import torch

    from tests.test_nms import numpy_reference_nms  # reference-style host NMS
    from tools.torch_ref import TorchDarknet

    model = TorchDarknet(graph).load_raw(raw)
    x = torch.from_numpy(
        np.random.default_rng(0).uniform(0, 1, (batch, 3, size, size))
        .astype(np.float32))
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            det = model(x).numpy()
            for i in range(batch):
                numpy_reference_nms(det[i], 0.05, 0.3)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cfg", default="yolov3.cfg")
    ap.add_argument("--quick", action="store_true",
                    help="tiny model, small batch (smoke check)")
    ap.add_argument("--remeasure-baseline", action="store_true")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the timed loop")
    ap.add_argument("--precision", choices=("default", "highest", "bf16",
                                            "int8"),
                    default="bf16",
                    help="serving precision (bf16 = production default; int8 "
                         "= PTQ fast path; box parity is checked in tests)")
    args = ap.parse_args()

    if args.quick:
        args.cfg, args.size, args.batch, args.iters = ("yolov3-tiny.cfg", 416,
                                                       8, 5)

    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.weights import fold_raw, random_raw

    graph = load_graph(REPO / "models" / args.cfg)
    raw = random_raw(graph, seed=0)
    # push objectness biases negative so post-threshold candidate counts are
    # trained-weights realistic — otherwise ~half of all anchors pass 0.05
    # and the reference's data-dependent Python NMS is unfairly swamped
    per_anchor = 5 + graph.yolo_nodes[0].classes
    for node in graph.conv_nodes:
        if not node.batch_normalize:
            raw[node.index]["bias"][4::per_anchor] = -6.0
    params = fold_raw(raw)

    frames = np.random.default_rng(1).integers(
        0, 256, (args.batch, args.size, args.size, 3), dtype=np.uint8)

    precision = None if args.precision == "default" else args.precision
    if precision == "bf16":
        import jax.numpy as jnp

        params = {k: {n: np.asarray(v, dtype=jnp.bfloat16)
                      for n, v in p.items()} for k, p in params.items()}

    measure = measure_tpu
    if precision == "int8":
        measure = lambda g, p, f, i, precision=None: measure_tpu_int8(g, p, f, i)  # noqa: E731

    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            tpu_ips = measure(graph, params, frames, args.iters,
                              precision=precision)
    else:
        tpu_ips = measure(graph, params, frames, args.iters,
                          precision=precision)

    key = f"{graph.name}@{args.size}"
    cache = {}
    if BASELINE_CACHE.exists():
        cache = json.loads(BASELINE_CACHE.read_text())
    if key not in cache or args.remeasure_baseline:
        torch_batch = min(args.batch, 4)
        torch_iters = 2 if not args.quick else 1
        cache[key] = measure_torch_cpu(graph, raw, args.size, torch_batch,
                                       torch_iters)
        BASELINE_CACHE.write_text(json.dumps(cache, indent=1))
    torch_ips = cache[key]

    print(json.dumps({
        "metric": f"images/sec/chip {key} batch{args.batch} "
                  f"{args.precision} e2e inference",
        "value": round(tpu_ips, 2),
        "unit": "img/s",
        "vs_baseline": round(tpu_ips / torch_ips, 2),
    }))


if __name__ == "__main__":
    main()
