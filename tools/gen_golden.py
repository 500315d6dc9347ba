"""Regenerate the golden regression fixture (tests/data/golden_tiny.json).

Run ONLY when an intentional semantic change (decode math, NMS ordering,
preprocess geometry/pad, weight folding) invalidates the frozen detections —
note the reason in the commit message. Usage::

    python tools/gen_golden.py

The prob_thresh is placed in the middle of the largest score gap within the
[0.2, 0.5] candidate band, and that gap ("threshold_margin") is recorded so
test_golden can keep its score tolerance ~3x below it — drift within
tolerance can then never flip the survivor count.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from yolov3_tpu.graph import load_graph  # noqa: E402
from yolov3_tpu.model import forward_compact  # noqa: E402
from yolov3_tpu.ops.nms import batched_nms_compact  # noqa: E402
from yolov3_tpu.ops.preprocess import preprocess  # noqa: E402
from yolov3_tpu.weights import fold_raw, random_raw  # noqa: E402

REPO = Path(__file__).parent.parent
OUT = REPO / "tests" / "data" / "golden_tiny.json"
SEED = 777
IOU_THRESH = 0.45
TOP_K = 64


def main():
    g = load_graph(REPO / "models" / "yolov3-tiny.cfg")
    params = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, seed=SEED)))
    frames = np.random.default_rng(SEED).integers(
        0, 256, (1, 480, 640, 3), dtype=np.uint8)
    x = preprocess(jnp.asarray(frames)[..., ::-1], (416, 416))
    bx, sc, cl = forward_compact(g, params, x, precision="highest")

    scores = np.sort(np.asarray(sc[0], np.float64))[::-1]
    band = scores[(scores > 0.2) & (scores < 0.5)]
    if len(band) < 2:
        raise SystemExit(
            f"no usable threshold band: {len(band)} candidate score(s) in "
            f"(0.2, 0.5) — a gap-maximizing threshold needs at least two; "
            f"adjust SEED or the band bounds")
    gaps = band[:-1] - band[1:]
    i = int(np.argmax(gaps))
    prob_thresh = float((band[i] + band[i + 1]) / 2)
    margin = float(gaps[i])

    res = batched_nms_compact(bx, sc, cl, prob_thresh=prob_thresh,
                              iou_thresh=IOU_THRESH, top_k=TOP_K)
    v = np.asarray(res.valid[0])
    fixture = {
        "seed": SEED,
        "prob_thresh": prob_thresh,
        "iou_thresh": IOU_THRESH,
        "top_k": TOP_K,
        "threshold_margin": margin,
        "boxes": np.round(np.asarray(res.boxes[0][v], np.float64),
                          3).tolist(),
        "scores": np.asarray(res.scores[0][v], np.float64).tolist(),
        "classes": np.asarray(res.classes[0][v]).tolist(),
    }
    OUT.write_text(json.dumps(fixture, indent=1))
    print(f"wrote {OUT}: {int(v.sum())} survivors, "
          f"prob_thresh={prob_thresh:.6f}, margin={margin:.3e}")
    assert margin > 3 * 5e-5, "gap too small for test_golden's tolerance"


if __name__ == "__main__":
    main()
