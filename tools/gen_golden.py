"""Regenerate the golden regression fixtures (tests/data/golden_*.json).

Run ONLY when an intentional semantic change (decode math, NMS ordering,
preprocess geometry/pad, weight folding) invalidates the frozen detections —
note the reason in the commit message. Usage::

    python tools/gen_golden.py            # all fixtures
    python tools/gen_golden.py tiny       # just one

Two fixtures (VERDICT r4 item 4): ``tiny`` (yolov3-tiny@416 — the original)
and ``yolov3`` (full yolov3@320, reduced resolution to keep the CPU forward
fast). The full-model fixture catches numeric drift in the 75-layer
residual/route graph torch-independently — full-yolov3 parity otherwise
rests entirely on tools/torch_ref.py being importable and healthy.

Two determinism rules learned generating the full-model fixture:

- The generator MUST run under the same XLA env as the tests: CPU conv
  numerics change with ``--xla_force_host_platform_device_count`` (thread
  partitioning), so this script pins the flag exactly as tests/conftest.py
  does. Regenerating outside pytest without it produces a fixture the suite
  can't reproduce bit-for-bit.
- The 75-layer graph needs tamed weights (``scale=0.9``): at He scale 1.0
  the residual stack's variance growth drives the head's ``exp(tw)`` to
  ~1e13 boxes, where fp32 ULP >> any usable tolerance; at <=0.7 every
  activation is so small all 6300 scores collapse to sigmoid(0)^2 = 0.25
  and no usable threshold gap exists. 0.9 gives spread scores (max ~0.73)
  and sane boxes (max ~2e3).

The prob_thresh is placed in the middle of the largest score gap among
sorted-score ranks [lo_rank, top_k-8), so (a) the survivor count is the number
above the threshold — the rank-``top_k`` truncation cut never engages —
and (b) that one cut carries a recorded margin ("threshold_margin") that
test_golden keeps its score tolerance ~3x below; drift within tolerance can
then never flip the survivor set.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

# Match tests/conftest.py BEFORE any backend initializes: same platform,
# same virtual device count (the flag changes CPU conv numerics).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from yolov3_tpu.graph import load_graph  # noqa: E402
from yolov3_tpu.model import forward_compact  # noqa: E402
from yolov3_tpu.ops.nms import batched_nms_compact  # noqa: E402
from yolov3_tpu.ops.preprocess import preprocess  # noqa: E402
from yolov3_tpu.weights import fold_raw, random_raw  # noqa: E402

REPO = Path(__file__).parent.parent
SEED = 777
IOU_THRESH = 0.45
TOP_K = 64
SCORE_ATOL = 5e-5  # keep in sync with tests/test_golden.py

# name -> (cfg file, net size, weight scale, min rank for the threshold
# cut). Frame shape is shared (1, 480, 640, 3). See module docstring for why
# yolov3 runs at 0.9; lo_rank is the deepest window start whose best gap
# still clears the margin assert (deeper = more survivors pinned).
FIXTURES = {
    "tiny": ("yolov3-tiny.cfg", 416, 1.0, 16),
    "yolov3": ("yolov3.cfg", 320, 0.9, 24),
    # spp pins the 4-way SPP route + 5/9/13 maxpool chain — the one
    # structural feature the other two fixtures don't cover
    "spp": ("yolov3-spp.cfg", 320, 0.9, 24),
}


def generate(name: str) -> None:
    cfg, net, scale, lo_rank = FIXTURES[name]
    out = REPO / "tests" / "data" / f"golden_{name}.json"
    g = load_graph(REPO / "models" / cfg)
    params = jax.tree.map(
        jnp.asarray, fold_raw(random_raw(g, seed=SEED, scale=scale)))
    frames = np.random.default_rng(SEED).integers(
        0, 256, (1, 480, 640, 3), dtype=np.uint8)
    x = preprocess(jnp.asarray(frames)[..., ::-1], (net, net))
    bx, sc, cl = forward_compact(g, params, x, precision="highest")

    scores = np.sort(np.asarray(sc[0], np.float64))[::-1]
    lo, hi = lo_rank, TOP_K - 8  # survivor count lands in (lo, top_k-8]
    window = scores[lo:hi]
    gaps = window[:-1] - window[1:]
    i = int(np.argmax(gaps))
    prob_thresh = float((window[i] + window[i + 1]) / 2)
    margin = float(gaps[i])
    n_above = int((scores > prob_thresh).sum())
    assert lo < n_above < TOP_K, (name, n_above)
    assert margin > 3 * SCORE_ATOL, \
        f"[{name}] best gap {margin:.2e} too small for test_golden's tolerance"

    res = batched_nms_compact(bx, sc, cl, prob_thresh=prob_thresh,
                              iou_thresh=IOU_THRESH, top_k=TOP_K)
    v = np.asarray(res.valid[0])
    boxes = np.asarray(res.boxes[0][v], np.float64)
    assert np.abs(boxes).max() < 1e4, \
        f"[{name}] boxes blew up ({np.abs(boxes).max():.1e}) — lower scale"
    fixture = {
        "cfg": cfg,
        "net_size": net,
        "seed": SEED,
        "scale": scale,
        "prob_thresh": prob_thresh,
        "iou_thresh": IOU_THRESH,
        "top_k": TOP_K,
        "threshold_margin": margin,
        "boxes": np.round(boxes, 3).tolist(),
        "scores": np.asarray(res.scores[0][v], np.float64).tolist(),
        "classes": np.asarray(res.classes[0][v]).tolist(),
    }
    out.write_text(json.dumps(fixture, indent=1))
    print(f"wrote {out}: {int(v.sum())} survivors ({n_above} above thresh), "
          f"prob_thresh={prob_thresh:.6f}, margin={margin:.3e}")


def main():
    names = sys.argv[1:] or list(FIXTURES)
    for name in names:
        generate(name)


if __name__ == "__main__":
    main()
