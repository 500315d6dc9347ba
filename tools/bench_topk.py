"""Microbenchmark: candidate-selection (threshold → top-K → gather) stage.

DESIGN.md's bottleneck map names exact ``lax.top_k`` over (B, 22743) as the
single biggest non-conv tail item (~2.8 ms at b128/K=512). This tool measures
the stage and its alternatives on the real chip with the differential-scan
clock (see tools/bench_pallas_conv.py::timeit_scanned — absolute wall timings
through the axon relay are ~26 ms RTT regardless of device work).

Variants:
  topk        — current serving path: lax.top_k + take_along_axis gathers
  sort1       — single packed-key lax.sort desc, slice K (no index operand)
  select      — Pallas exact radix-select kernel (ops/pallas_select.py)

Run: python tools/bench_topk.py [--batch 128] [--k 512]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

N_608 = 22743  # yolov3 @608 candidate count (3 heads, 3 anchors)


def timeit_scanned(fn, args, dep, reps=3, lens=(8, 40)):
    """Per-op device time via differential scan timing (see bench_pallas_conv).

    ``dep(carry, out) -> carry`` must create a REAL data dependency between
    iterations or the op is hoisted/DCE'd (negative readings = eliminated).
    """
    def many_fn(scan_len):
        @jax.jit
        def many(*args):
            def body(carry, _):
                out = fn(carry, *args[1:])
                return dep(carry, out), ()
            out, _ = jax.lax.scan(body, args[0], None, length=scan_len)
            return jnp.sum(out.astype(jnp.float32))
        return many

    totals = []
    for scan_len in lens:
        many = many_fn(scan_len)
        float(many(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(many(*args))
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    return (totals[1] - totals[0]) / (lens[1] - lens[0])


def make_inputs(batch, n, density=0.02, seed=0):
    """Scores thresholded-realistic: ~density of candidates nonzero."""
    rng = np.random.default_rng(seed)
    raw = rng.uniform(0, 1, (batch, n)).astype(np.float32)
    mask = rng.uniform(0, 1, (batch, n)) < density
    scores = np.where(mask, raw, 0.0).astype(np.float32)
    boxes = rng.uniform(0, 608, (batch, n, 4)).astype(np.float32)
    classes = rng.integers(0, 80, (batch, n), dtype=np.int32)
    return (jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(classes))


def stage_topk(scores, boxes, classes, k):
    top_scores, top_i = lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
    top_classes = jnp.take_along_axis(classes, top_i, axis=1)
    return top_scores, top_boxes, top_classes


def stage_sort1(scores, boxes, classes, k):
    # pack (score desc, index asc) into one int32 key: score bits are
    # monotone for score >= 0; index occupies low bits after shifting the
    # score into the high bits is impossible (needs 32+15); instead sort the
    # packed i64? TPU lacks i64 sort — sort f32 keys only, then a second
    # gather by matching is not exact under ties. Measured for the sort cost
    # shape only (NOT a correct replacement — ties lose index order).
    top = lax.sort(scores, dimension=1, is_stable=False)
    top_scores = lax.rev(top[:, -k:], (1,))
    return (top_scores,)


def dep_carry(carry, out):
    # consume EVERY ELEMENT of every output with a non-zero (numerically
    # negligible) weight: a *0 term constant-folds, and a SLICED consumer
    # lets XLA push the slice through the op under test and compute only a
    # fraction of it (a top_k whose consumer takes column 0 simplifies to
    # an argmax) — negative/over-peak readings mean the dep failed
    acc = jnp.float32(0)
    for o in out:
        acc = acc + jnp.sum(o.astype(jnp.float32))
    return carry + (acc * jnp.float32(1e-24)).astype(carry.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=N_608)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--density", type=float, default=0.02)
    args = ap.parse_args()

    scores, boxes, classes = make_inputs(args.batch, args.n, args.density)
    print(f"B={args.batch} N={args.n} K={args.k} density={args.density}")

    variants = {
        "topk(score)+gathers": lambda s: stage_topk(s, boxes, classes, args.k),
        "topk(score) only": lambda s: lax.top_k(s, args.k),
        "sort1 full-N": lambda s: stage_sort1(s, boxes, classes, args.k),
        "sort small (B,K)": lambda s: (lax.rev(lax.sort(
            s[:, :args.k], dimension=1, is_stable=False), (1,)),),
    }
    from yolov3_tpu.ops.nms import _select_pairmax

    variants["pairmax select"] = lambda s: _select_pairmax(
        boxes, s, classes, args.k)

    for name, fn in variants.items():
        t = timeit_scanned(fn, (scores,), dep_carry)
        print(f"{name:24s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
