"""Microbenchmark: why does top-k candidate GATHER cost ~3 ms?

bench_topk.py showed lax.top_k over (B=128, N=22743) is ~16 us while the
following take_along_axis gathers cost ~3.1 ms. This isolates the gather:
source layout, index source, operand size, and MXU one-hot alternatives.

Run: python tools/bench_gather.py [--batch 128]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from tools.bench_topk import N_608, dep_carry, timeit_scanned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=N_608)
    ap.add_argument("--k", type=int, default=512)
    args = ap.parse_args()
    b, n, k = args.batch, args.n, args.k

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 608, (b, n, 4)).astype(np.float32))
    boxes_t = jnp.asarray(np.transpose(np.asarray(boxes), (0, 2, 1)))
    classes = jnp.asarray(rng.integers(0, 80, (b, n), dtype=np.int32))
    boxes_small = boxes[:, :4096, :]

    # carry is scores (B, N) f32; idx-carrying variants derive indices from
    # carry so nothing is hoisted out of the scan
    def carried_idx(s):
        return lax.top_k(s, k)[1]

    variants = {
        # full serving stage for context
        "topk+box+cls gather": lambda s: (
            lambda ts, ti: (ts,
                            jnp.take_along_axis(boxes, ti[..., None], axis=1),
                            jnp.take_along_axis(classes, ti, axis=1)))
        (*lax.top_k(s, k)),
        # gather only, indices derived from carry (isolates each operand)
        "box gather (B,N,4)": lambda s: (jnp.take_along_axis(
            boxes, carried_idx(s)[..., None], axis=1),),
        "cls gather (B,N)i32": lambda s: (jnp.take_along_axis(
            classes, carried_idx(s), axis=1),),
        "score gather (B,N)f32": lambda s: (jnp.take_along_axis(
            s, carried_idx(s), axis=1),),
        # transposed source: gather along the minor axis
        "boxT gather (B,4,N)": lambda s: (jnp.take_along_axis(
            boxes_t, carried_idx(s)[:, None, :], axis=2),),
        # flattened global take: one (B*N, 4) row gather
        "flat take (B*N,4)": lambda s: (jnp.take(
            boxes.reshape(b * n, 4),
            (carried_idx(s)
             + (jnp.arange(b, dtype=jnp.int32) * n)[:, None]).reshape(-1),
            axis=0).reshape(b, k, 4),),
        # small source operand: does cost scale with N?
        "box gather N=4096": lambda s: (jnp.take_along_axis(
            boxes_small,
            (carried_idx(s) % 4096)[..., None], axis=1),),
        # one-hot matmul gather (bf16 MXU) for calibration
        "onehot matmul bf16": lambda s: ((
            jax.nn.one_hot(carried_idx(s), n, dtype=jnp.bfloat16)
            @ boxes.astype(jnp.bfloat16)),),
        # sort-payload alternative: single multi-operand full-N sort
        "sort N w/ 6 payloads": lambda s: tuple(
            o[:, -k:] for o in lax.sort(
                (s, boxes_t[:, 0], boxes_t[:, 1], boxes_t[:, 2],
                 boxes_t[:, 3], classes.astype(jnp.float32)),
                dimension=1, num_keys=1)),
    }

    for name, fn in variants.items():
        try:
            t = timeit_scanned(fn, (scores,), dep_carry)
            print(f"{name:24s}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
