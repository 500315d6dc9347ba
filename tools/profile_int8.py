"""int8-path cumulative stage profiler (round-2 verdict next #1).

Reproduces the bf16 cumulative stage map (docs/DESIGN.md "Roadmap") for the
int8 serving path: truncated prefixes of the EXACT int8-carrier program
(``quant.forward_features_int8_carrier(upto=...)`` — quantization decisions
come from the full graph) at every downsample boundary, then the serving
tail (packed decode → pair-max selection → blocked suppression), each timed
with the hardened differential-scan clock (tools/bench_clock.py — the carry
is the preprocessed input tensor, every output fully consumed into it, so
the relay RTT cancels exactly; an absolute-loop variant of this tool read
33 ms for the 2-layer prefix — pure dispatch floor — and 352 ms for one
mid-prefix — a truncation-compile artifact; both ruled that clock out).
Marginal deltas between marks are the stage costs; each truncation pays a
full-consumption reduction the longer prefixes don't, so marginals carry a
~1 ms-class consumption skew on the biggest intermediates. Preprocess is
excluded (measured ~free, docs/DESIGN.md).

    python tools/profile_int8.py [--cfg yolov3.cfg] [--size 608] [--batch 128]
                                 [--int8-heads] [--lens 8,40]
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
    ap.add_argument("--lens", default="8,40",
                    help="short,long differential scan lengths")
    ap.add_argument("--prob-thresh", type=float, default=0.05)
    ap.add_argument("--top-k", type=int, default=512)
    ap.add_argument("--int8-heads", action="store_true",
                    help="quantize the no-BN head projections too")
    ap.add_argument("--act-scheme", choices=("symmetric", "asymmetric"),
                    default="symmetric",
                    help="activation quantization scheme (round 5)")
    args = ap.parse_args()
    enable_compile_cache()
    lens = tuple(int(v) for v in args.lens.split(","))

    from yolov3_tpu.ops.nms import _select_pairmax_payload, batched_nms_packed
    from yolov3_tpu.quant import (calibrate_tensors,
                                  calibrate_tensors_affine,
                                  forward_features_int8_carrier,
                                  forward_packed_int8, quantize_weights)

    g = load_graph(Path(__file__).parent.parent / "models" / args.cfg)
    params = jax.device_put(jax.tree.map(jnp.asarray,
                                         fold_raw(random_raw(g, 0))))
    net_hw = (args.size, args.size)
    rng = np.random.default_rng(3)
    calib = [preprocess(jnp.asarray(
        rng.integers(0, 256, (8, *net_hw, 3), dtype=np.uint8)), net_hw)]
    zeros = None
    if args.act_scheme == "asymmetric":
        scales, zeros = calibrate_tensors_affine(g, params, calib,
                                                 precision="bf16")
    else:
        scales = calibrate_tensors(g, params, calib, precision="bf16")
    qparams = jax.device_put(quantize_weights(
        g, params, include_heads=args.int8_heads))

    frames = jnp.asarray(rng.integers(
        0, 256, (args.batch, *net_hw, 3), dtype=np.uint8))
    x0 = jax.jit(lambda f: preprocess(f[..., ::-1], net_hw))(frames)
    x0.block_until_ready()

    # downsample-boundary marks + full depth (same defaults as
    # tools/profile_layers.py's bf16 map)
    marks, seen = [], set()
    for n in g.nodes:
        if (n.kind == "convolutional" and n.stride > 1
                and n.downsample not in seen):
            seen.add(n.downsample)
            marks.append(n.index + 1)
    marks.append(len(g.nodes))

    rows = []

    def run_mark(label, stage_fn):
        dt = timeit_scanned(stage_fn, (x0,), reps=args.reps, lens=lens)
        prev = rows[-1][1] if rows else 0.0
        rows.append((label, dt))
        print(f"{label:28s}: {dt * 1e3:8.2f} ms "
              f"(marginal {(dt - prev) * 1e3:+7.2f} ms)", flush=True)

    for upto in marks:
        def walk(xc, u=upto):
            return tuple(forward_features_int8_carrier(
                g, qparams, scales, xc, "bf16", upto=u,
                tensor_zeros=zeros))
        run_mark(f"conv walk [0:{upto})", walk)

    def with_decode(xc):
        return forward_packed_int8(
            g, qparams, scales, xc, prob_thresh=args.prob_thresh,
            precision="bf16", carrier="int8", zeros=zeros)
    run_mark("+ packed decode", with_decode)

    def with_selection(xc):
        payload, scores = forward_packed_int8(
            g, qparams, scales, xc, prob_thresh=args.prob_thresh,
            precision="bf16", carrier="int8", zeros=zeros)
        return _select_pairmax_payload(payload, scores, args.top_k)
    run_mark("+ pair-max selection", with_selection)

    def full(xc):
        payload, scores = forward_packed_int8(
            g, qparams, scales, xc, prob_thresh=args.prob_thresh,
            precision="bf16", carrier="int8", zeros=zeros)
        return tuple(batched_nms_packed(payload, scores, top_k=args.top_k))
    run_mark("+ suppression (full step)", full)

    total = rows[-1][1]
    print(f"\nfull int8 device step ({'heads int8' if args.int8_heads else 'heads bf16'}): "
          f"{total * 1e3:.2f} ms = {args.batch / total:.1f} img/s "
          f"at b{args.batch}@{args.size}")


if __name__ == "__main__":
    main()
