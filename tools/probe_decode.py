"""Probe: why does packed decode cost +6.9 ms on the int8 path (round-3 map)
when the round-2 bf16 map recorded +0.4 ms?

Measures, on the differential scan clock, the delta of several decode
formulations over the bare conv walk, for both the int8 carrier and bf16
paths — isolating whether the cost is the Pallas kernel, the packed-record
build, an int8-program interaction, or a round-2 mismeasurement.

    python tools/probe_decode.py [--size 608] [--batch 128] [--lens 8,40]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from tools.bench_clock import enable_compile_cache, timeit_scanned
from yolov3_tpu.graph import load_graph
from yolov3_tpu.ops.preprocess import preprocess
from yolov3_tpu.weights import fold_raw, random_raw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov3.cfg")
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--lens", default="8,40")
    ap.add_argument("--prob-thresh", type=float, default=0.05)
    args = ap.parse_args()
    enable_compile_cache()
    lens = tuple(int(v) for v in args.lens.split(","))

    from yolov3_tpu.model import forward_features
    from yolov3_tpu.ops.decode import decode_compact
    from yolov3_tpu.ops.pallas_decode import (decode_compact_pallas,
                                              decode_packed_pallas)
    from yolov3_tpu.quant import (calibrate_tensors,
                                  forward_features_int8_carrier,
                                  quantize_weights)

    g = load_graph(Path(__file__).parent.parent / "models" / args.cfg)
    params = jax.device_put(jax.tree.map(jnp.asarray,
                                         fold_raw(random_raw(g, 0))))
    bparams = jax.device_put(jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16), params))
    net_hw = (args.size, args.size)
    rng = np.random.default_rng(3)
    calib = [preprocess(jnp.asarray(
        rng.integers(0, 256, (8, *net_hw, 3), dtype=np.uint8)), net_hw)]
    scales = calibrate_tensors(g, params, calib, precision="bf16")
    qparams = jax.device_put(quantize_weights(g, params))

    frames = jnp.asarray(rng.integers(
        0, 256, (args.batch, *net_hw, 3), dtype=np.uint8))
    x0 = jax.jit(lambda f: preprocess(f[..., ::-1], net_hw))(frames)
    x0.block_until_ready()

    yolo = g.yolo_nodes
    anchors = [n.anchors for n in yolo]
    strides = list(g.head_strides())
    classes = yolo[0].classes

    def int8_heads(xc):
        return forward_features_int8_carrier(g, qparams, scales, xc, "bf16")

    def bf16_heads(xc):
        return forward_features(g, bparams, xc, precision="bf16")

    def t(label, fn):
        dt = timeit_scanned(fn, (x0,), reps=args.reps, lens=lens)
        print(f"{label:36s}: {dt * 1e3:8.2f} ms", flush=True)
        return dt

    base_i8 = t("int8 walk, heads only", lambda xc: tuple(int8_heads(xc)))
    for label, dec in (
            ("packed pallas", lambda h: decode_packed_pallas(
                h, anchors, strides, classes,
                prob_thresh=args.prob_thresh)),
            ("compact pallas", lambda h: decode_compact_pallas(
                h, anchors, strides, classes)),
            ("compact xla", lambda h: decode_compact(
                h, anchors, strides, classes))):
        dt = t(f"int8 walk + {label}",
               lambda xc, d=dec: tuple(d(int8_heads(xc))))
        print(f"    -> {label} delta over int8 walk: "
              f"{(dt - base_i8) * 1e3:+.2f} ms", flush=True)

    base_bf = t("bf16 walk, heads only", lambda xc: tuple(bf16_heads(xc)))
    dt = t("bf16 walk + packed pallas",
           lambda xc: tuple(decode_packed_pallas(
               bf16_heads(xc), anchors, strides, classes,
               prob_thresh=args.prob_thresh)))
    print(f"    -> packed delta over bf16 walk: {(dt - base_bf) * 1e3:+.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
