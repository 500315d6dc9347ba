"""Golden regression fixtures: frozen end-to-end detections for a fixed seed.

Guard against silent semantic drift (decode math, NMS ordering, preprocess
geometry, weight folding) without needing the torch oracle — if one fails
and the change was intentional, regenerate via tools/gen_golden.py and note
the reason in the commit message.

Two configs (VERDICT r4 item 4): tiny@416 (the original fixture) and full
yolov3@320 — the latter pins the 75-layer residual/route graph's numerics
torch-independently; full-model parity otherwise rests entirely on
tools/torch_ref.py being importable and healthy.
"""
import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov3_tpu.graph import load_graph
from yolov3_tpu.model import forward_compact
from yolov3_tpu.ops.nms import batched_nms_compact
from yolov3_tpu.ops.preprocess import preprocess
from yolov3_tpu.weights import fold_raw, random_raw

DATA = Path(__file__).parent / "data"


@pytest.mark.parametrize("fixture", ["golden_tiny.json",
                                     "golden_yolov3.json",
                                     "golden_spp.json"])
def test_golden_detections(fixture):
    golden = json.loads((DATA / fixture).read_text())

    g = load_graph(Path(__file__).parent.parent / "models" / golden["cfg"])
    params = jax.tree.map(
        jnp.asarray,
        fold_raw(random_raw(g, seed=golden["seed"],
                            scale=golden.get("scale", 1.0))))
    frames = np.random.default_rng(golden["seed"]).integers(
        0, 256, (1, 480, 640, 3), dtype=np.uint8)
    net = golden["net_size"]
    x = preprocess(jnp.asarray(frames)[..., ::-1], (net, net))
    bx, sc, cl = forward_compact(g, params, x, precision="highest")
    res = batched_nms_compact(bx, sc, cl, prob_thresh=golden["prob_thresh"],
                              iou_thresh=golden["iou_thresh"],
                              top_k=golden["top_k"])
    v = np.asarray(res.valid[0])
    boxes = np.asarray(res.boxes[0][v])
    scores = np.asarray(res.scores[0][v])
    classes = np.asarray(res.classes[0][v])

    assert len(scores) == len(golden["scores"]), (
        f"{len(scores)} survivors vs golden {len(golden['scores'])}")
    np.testing.assert_array_equal(classes, np.asarray(golden["classes"]))
    # fixture's threshold sits in the largest score gap (margin recorded in
    # the json); tolerance stays ~3x below it so drift within tolerance
    # cannot flip the survivor count
    np.testing.assert_allclose(scores, np.asarray(golden["scores"]),
                               atol=5e-5)
    np.testing.assert_allclose(boxes, np.asarray(golden["boxes"]), atol=0.1)
