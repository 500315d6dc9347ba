"""Serving-path equivalence: compact decode+NMS ≡ reference-layout pipeline,
and bf16 conv mode keeps box parity (IoU) with fp32.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov3_tpu.graph import load_graph
from yolov3_tpu.model import forward, forward_compact
from yolov3_tpu.ops.nms import batched_nms, batched_nms_compact
from yolov3_tpu.weights import fold_raw, random_raw


@pytest.fixture(scope="module")
def setup(cfg_paths):
    g = load_graph(cfg_paths["yolov3-tiny"])
    params = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, seed=3)))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 416, 416, 3)).astype(np.float32))
    return g, params, x


def test_compact_decode_matches_full(setup):
    g, params, x = setup
    det = forward(g, params, x)  # (B, N, 85)
    boxes, scores, classes = forward_compact(g, params, x)

    obj = np.asarray(det[..., 4])
    cls_prob = np.asarray(det[..., 5:]).max(-1)
    np.testing.assert_allclose(np.asarray(scores), obj * cls_prob,
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(classes),
                                  np.asarray(det[..., 5:]).argmax(-1))
    cxywh = np.asarray(det[..., :4])
    tlbr = np.concatenate([cxywh[..., :2] - cxywh[..., 2:4] / 2,
                           cxywh[..., :2] + cxywh[..., 2:4] / 2], -1)
    np.testing.assert_allclose(np.asarray(boxes), tlbr, atol=1e-3, rtol=1e-5)


def test_compact_nms_matches_full(setup):
    g, params, x = setup
    det = forward(g, params, x)
    ref = batched_nms(det, prob_thresh=0.3, iou_thresh=0.4, top_k=64)

    boxes, scores, classes = forward_compact(g, params, x)
    out = batched_nms_compact(boxes, scores, classes, prob_thresh=0.3,
                              iou_thresh=0.4, top_k=64)
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(out.classes),
                                  np.asarray(ref.classes))
    np.testing.assert_allclose(np.asarray(out.boxes), np.asarray(ref.boxes),
                               atol=2e-3, rtol=1e-5)


def _iou(a, b):
    tl = np.maximum(a[:2], b[:2])
    br = np.minimum(a[2:], b[2:])
    wh = np.maximum(br - tl, 0)
    inter = wh[0] * wh[1]
    ua = (a[2] - a[0]) * (a[3] - a[1])
    ub = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(ua + ub - inter, 1e-9)


def test_bf16_box_parity_with_fp32(setup):
    """bf16 conv mode: surviving boxes match fp32 at IoU>0.99 on the
    confidently-detected set (the north-star parity bar)."""
    g, params, x = setup
    bf_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    b32, s32, c32 = forward_compact(g, params, x)
    bbf, sbf, cbf = forward_compact(g, bf_params, x, precision="bf16")

    r32 = batched_nms_compact(b32, s32, c32, prob_thresh=0.35, top_k=64)
    rbf = batched_nms_compact(bbf, sbf, cbf, prob_thresh=0.35, top_k=64)

    matched, total = 0, 0
    for i in range(x.shape[0]):
        v32 = np.where(np.asarray(r32.valid[i]))[0]
        for j in v32:
            # consider confident fp32 detections; find same-class bf16 match
            if float(r32.scores[i, j]) < 0.45:
                continue
            total += 1
            box32 = np.asarray(r32.boxes[i, j])
            cls32 = int(r32.classes[i, j])
            vbf = np.where(np.asarray(rbf.valid[i]))[0]
            best = max((_iou(box32, np.asarray(rbf.boxes[i, k]))
                        for k in vbf if int(rbf.classes[i, k]) == cls32),
                       default=0.0)
            if best > 0.99:
                matched += 1
    assert total > 0
    assert matched / total >= 0.9, f"bf16 parity {matched}/{total}"


def test_serving_top_k_256_preset_same_detections(cfg_paths):
    """K=256 serving preset (round-3 tiny tail work): with trained-realistic
    negative objectness biases, the candidate census at the serving
    threshold sits far below 256, so top_k=256 must produce IDENTICAL
    detection sets to top_k=512 — selection and suppression shrink ~2x for
    free. (The >K truncation contract itself is covered in test_nms.py;
    this pins that the preset is lossless at serving thresholds.)"""
    from yolov3_tpu.weights import random_raw as _rr

    g = load_graph(cfg_paths["yolov3-tiny"])
    raw = _rr(g, seed=11)
    per_anchor = 5 + g.yolo_nodes[0].classes
    for node in g.conv_nodes:
        if not node.batch_normalize:
            raw[node.index]["bias"][4::per_anchor] = -6.0
    params = jax.tree.map(jnp.asarray, fold_raw(raw))
    x = jnp.asarray(np.random.default_rng(5).uniform(
        0, 1, (4, 416, 416, 3)).astype(np.float32))

    boxes, scores, classes = forward_compact(g, params, x)
    n_cand = int(np.sum(np.asarray(scores) >= 0.05, axis=1).max())
    assert n_cand < 256, f"census {n_cand} invalidates the K=256 preset"
    r512 = batched_nms_compact(boxes, scores, classes, prob_thresh=0.05,
                               top_k=512)
    r256 = batched_nms_compact(boxes, scores, classes, prob_thresh=0.05,
                               top_k=256)
    for i in range(4):
        v512 = np.where(np.asarray(r512.valid[i]))[0]
        v256 = np.where(np.asarray(r256.valid[i]))[0]
        np.testing.assert_allclose(np.asarray(r512.boxes[i][v512]),
                                   np.asarray(r256.boxes[i][v256]),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(r512.classes[i][v512]),
                                      np.asarray(r256.classes[i][v256]))
        np.testing.assert_allclose(np.asarray(r512.scores[i][v512]),
                                   np.asarray(r256.scores[i][v256]),
                                   atol=1e-6)
