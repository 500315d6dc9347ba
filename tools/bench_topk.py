"""Microbenchmark: candidate-selection (threshold → top-K → gather) stage.

DESIGN.md's bottleneck map names exact ``lax.top_k`` over (B, 22743) as the
single biggest non-conv tail item (~2.8 ms at b128/K=512). This tool measures
the stage and its alternatives on the real chip with the differential-scan
clock (tools/bench_clock.py — absolute wall timings through the axon
relay are ~26 ms RTT regardless of device work).

Variants: the direct top_k+gathers stage, sort-based alternatives, and
the shipped exact pair-max selection (ops/nms.py::_select_pairmax).

Run: python tools/bench_topk.py [--batch 128] [--k 512]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

N_608 = 22743  # yolov3 @608 candidate count (3 heads, 3 anchors)


# canonical clock lives in tools/bench_clock.py; these names are kept for
# the sibling benches that import them
from tools.bench_clock import dep_full, timeit_scanned  # noqa: F401,E402


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


dep_carry = dep_full  # legacy name


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
