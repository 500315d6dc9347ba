"""Per-stage forward profiler: cumulative truncation timing on the real chip.

Builds partial forwards (layers [0, k)) at increasing depths and reports
marginal per-stage cost — how the bottleneck map in docs/DESIGN.md was
measured. Relay-safe sync via scalar fetch.

    python tools/profile_layers.py [--cfg yolov3.cfg] [--size 608] [--batch 128]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from yolov3_tpu.graph import load_graph
from yolov3_tpu.model import _conv, _maxpool, _upsample_nearest
from yolov3_tpu.weights import fold_raw, random_raw


def partial_forward(graph, params, x, upto, precision=None):
    cache = {}
    prev = x.astype(jnp.bfloat16) if precision == "bf16" else x
    needed = graph.needed_outputs
    for node in graph.nodes[:upto]:
        if node.kind == "convolutional":
            p = params[node.index]
            out = _conv(prev, p["w"], p["b"], node, None)
        elif node.kind == "maxpool":
            out = _maxpool(prev, node)
        elif node.kind == "upsample":
            out = _upsample_nearest(prev, node.stride)
        elif node.kind == "shortcut":
            out = prev + cache[node.inputs[1]]
        elif node.kind == "route":
            srcs = [prev if i == node.index - 1 else cache[i]
                    for i in node.inputs]
            out = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
        else:
            out = prev
        if node.index in needed:
            cache[node.index] = out
        prev = out
    return jnp.sum(prev.astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov3.cfg")
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--marks", default=None,
                    help="comma-separated layer indices (default: stage "
                         "boundaries)")
    args = ap.parse_args()

    g = load_graph(Path(__file__).parent.parent / "models" / args.cfg)
    params = jax.device_put(jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16), fold_raw(random_raw(g, 0))))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (args.batch, args.size, args.size, 3)).astype(np.float32))

    if args.marks:
        marks = [int(m) for m in args.marks.split(",")]
    else:
        # downsample-boundary defaults + full depth
        marks, seen = [], set()
        for n in g.nodes:
            if n.kind == "convolutional" and n.stride > 1 and n.downsample not in seen:
                seen.add(n.downsample)
                marks.append(n.index + 1)
        marks.append(len(g.nodes))

    prev_t = 0.0
    for upto in marks:
        fn = jax.jit(lambda p, x, u=upto: partial_forward(g, p, x, u,
                                                          "bf16"))
        float(fn(params, x))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = fn(params, x)
        float(v)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"layers[0:{upto:3d}]: {dt * 1e3:7.1f} ms "
              f"(marginal {(dt - prev_t) * 1e3:+7.1f} ms)", flush=True)
        prev_t = dt


if __name__ == "__main__":
    main()
