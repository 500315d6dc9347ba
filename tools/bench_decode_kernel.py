"""A/B the packed-decode kernels on the real chip: transposing (round 2)
vs transpose-free (round 3) at serving shapes, plus an on-chip bit-exactness
gate between them. Differential scan clock; full consumption.

    python tools/bench_decode_kernel.py [--batch 128] [--size 608]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from tools.bench_clock import enable_compile_cache, timeit_scanned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--lens", default="8,40")
    args = ap.parse_args()
    enable_compile_cache()
    lens = tuple(int(v) for v in args.lens.split(","))

    from yolov3_tpu.ops.pallas_decode import (decode_packed_head_pallas,
                                              decode_packed_head_pallas_noT)

    anchors = (((116., 90.), (156., 198.), (373., 326.)),
               ((30., 61.), (62., 45.), (59., 119.)),
               ((10., 13.), (16., 30.), (33., 23.)))
    strides = (32, 16, 8)
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 2, (args.batch, args.size // s,
                                           args.size // s, 255))
                         .astype(np.float32)).astype(jnp.bfloat16)
             for s in strides]

    # on-chip bit-exactness gate (compiled, not interpret)
    for f, a, s in zip(feats, anchors, strides):
        p0, s0 = jax.jit(lambda x: decode_packed_head_pallas(
            x, a, s, 80, prob_thresh=0.05, head_offset=7))(f[:2])
        p1, s1 = jax.jit(lambda x: decode_packed_head_pallas_noT(
            x, a, s, 80, prob_thresh=0.05, head_offset=7))(f[:2])
        d = float(jnp.max(jnp.abs(p0 - p1)))
        print(f"head s{s}: compiled payload max|diff| = {d}", flush=True)
        assert d == 0.0, "kernels disagree on chip"

    def run(kind):
        # feats 1/2 ride as scan args, NOT closure constants — closed-over
        # arrays embed in the compile payload and overflow the relay's
        # request-size limit (HTTP 413)
        def fn(carry_feat, f1, f2):
            outs = []
            ps = [carry_feat, f1, f2]
            off = 0
            for f, a, s in zip(ps, anchors, strides):
                if kind == "noT":
                    p, sc = decode_packed_head_pallas_noT(
                        f, a, s, 80, prob_thresh=0.05, head_offset=off)
                else:
                    p, sc = decode_packed_head_pallas(
                        f, a, s, 80, prob_thresh=0.05, head_offset=off,
                        out_rows=(kind == "T2"))
                off += 3 * f.shape[1] * f.shape[2]
                outs.extend([p, sc])
            return tuple(outs)
        dt = timeit_scanned(fn, (feats[0], feats[1], feats[2]),
                            reps=2, lens=lens)
        print(f"packed decode [{kind:3s}] all heads: {dt * 1e3:7.3f} ms",
              flush=True)

    run("T")
    run("T2")
    run("noT")


if __name__ == "__main__":
    main()
