"""Sweep the group-max selection width (ops/nms.py::_select_pairmax_payload)
on the serving shape: the dominant lax.top_k term scales with N/G · k while
the final sort grows as G·k — this finds the measured crossover.

    python tools/bench_select_group.py [--batch 128] [--n 22743] [--k 512]
                                       [--groups 2,4,8,16]
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
    ap.add_argument("--n", type=int, default=22743)  # yolov3@608 candidates
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--groups", default="2,4,8,16")
    ap.add_argument("--density", type=float, default=0.02,
                    help="fraction of candidates above threshold "
                         "(trained-weights realistic at 0.05 thresh)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--lens", default="8,40")
    args = ap.parse_args()
    enable_compile_cache()
    lens = tuple(int(v) for v in args.lens.split(","))

    from yolov3_tpu.ops.nms import _select_pairmax_payload

    rng = np.random.default_rng(5)
    b, n = args.batch, args.n
    raw = rng.uniform(0.1, 1.0, (b, n)).astype(np.float32)
    masked = np.where(rng.uniform(0, 1, (b, n)) < args.density, raw, 0.0)
    payload = rng.uniform(0, 416, (b, n, 8)).astype(np.float32)
    payload[:, :, 4] = masked
    payload[:, :, 6] = np.arange(n, dtype=np.float32)[None]
    payload_d = jnp.asarray(payload)
    float(jnp.sum(payload_d))

    base = None
    for g in (int(v) for v in args.groups.split(",")):
        # scores come from the payload's own lane 4 (the serving dataflow);
        # the payload is the scan CARRY, so the whole selection — including
        # the group-max + top_k — re-runs every iteration instead of being
        # hoisted as loop-invariant
        fn = (lambda p, g=g: _select_pairmax_payload(
            p, p[:, :, 4], args.k, group=g))
        dt = timeit_scanned(fn, (payload_d,), reps=args.reps, lens=lens)
        note = "" if base is None else f"  ({(dt - base) * 1e3:+.2f} vs G=2)"
        if base is None:
            base = dt
        print(f"group={g:3d}: {dt * 1e3:7.3f} ms{note}", flush=True)


if __name__ == "__main__":
    main()
