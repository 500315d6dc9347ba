"""Batched NMS tests (SURVEY.md §4.3): against a pure-numpy greedy reference,
plus property tests — class-awareness, no surviving same-class pair above the
IoU threshold, permutation invariance, threshold behavior, top-K capping.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from yolov3_tpu.ops.nms import batched_nms, iou_matrix
from yolov3_tpu.utils.boxes import cxywh_to_tlbr


def numpy_reference_nms(det, prob_thresh, iou_thresh):
    """Reference-style host NMS: per-class greedy loops (SURVEY.md §2.7)."""
    obj = det[:, 4]
    cls_prob = det[:, 5:].max(axis=1)
    cls_idx = det[:, 5:].argmax(axis=1)
    score = obj * cls_prob
    keep_rows = score >= prob_thresh
    boxes = cxywh_to_tlbr(det[:, :4])

    def iou(a, b):
        tl = np.maximum(a[:2], b[:2])
        br = np.minimum(a[2:], b[2:])
        wh = np.maximum(br - tl, 0)
        inter = wh[0] * wh[1]
        ua = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
        ub = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
        return inter / max(ua + ub - inter, 1e-9)

    survivors = []
    for c in np.unique(cls_idx[keep_rows]):
        idxs = np.where(keep_rows & (cls_idx == c))[0]
        idxs = idxs[np.argsort(-score[idxs], kind="stable")]
        kept = []
        for i in idxs:
            if all(iou(boxes[i], boxes[j]) <= iou_thresh for j in kept):
                kept.append(i)
        survivors.extend(kept)
    return {(tuple(np.round(boxes[i], 4)), int(cls_idx[i])) for i in survivors}


def _result_set(res, b=0):
    out = set()
    for i in np.where(np.asarray(res.valid[b]))[0]:
        out.add((tuple(np.round(np.asarray(res.boxes[b, i]), 4)),
                 int(res.classes[b, i])))
    return out


def random_detections(rng, n=200, classes=6, size=416):
    cx = rng.uniform(0, size, (n, 1))
    cy = rng.uniform(0, size, (n, 1))
    wh = rng.uniform(8, size / 3, (n, 2))
    obj = rng.uniform(0, 1, (n, 1))
    cls = rng.uniform(0, 1, (n, classes))
    return np.concatenate([cx, cy, wh, obj, cls], axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_numpy_reference(seed):
    rng = np.random.default_rng(seed)
    det = random_detections(rng)
    res = batched_nms(jnp.asarray(det[None]), prob_thresh=0.2, iou_thresh=0.4)
    assert _result_set(res) == numpy_reference_nms(det, 0.2, 0.4)


def test_no_same_class_overlap_survives():
    rng = np.random.default_rng(7)
    det = random_detections(rng, n=300, classes=3)
    res = batched_nms(jnp.asarray(det[None]), prob_thresh=0.1, iou_thresh=0.3)
    valid = np.where(np.asarray(res.valid[0]))[0]
    boxes = np.asarray(res.boxes[0, valid])
    classes = np.asarray(res.classes[0, valid])
    iou = np.asarray(iou_matrix(jnp.asarray(boxes)))
    same = classes[:, None] == classes[None, :]
    off_diag = ~np.eye(len(valid), dtype=bool)
    assert not np.any((iou > 0.3) & same & off_diag)


def test_different_classes_not_suppressed():
    """Two identical boxes of different classes both survive (class-aware)."""
    det = np.zeros((2, 5 + 3), dtype=np.float32)
    det[:, :4] = [100, 100, 50, 50]
    det[:, 4] = 0.9
    det[0, 5] = 0.9  # class 0
    det[1, 6] = 0.8  # class 1
    res = batched_nms(jnp.asarray(det[None]), prob_thresh=0.1, iou_thresh=0.3)
    assert int(np.sum(np.asarray(res.valid))) == 2


def test_same_class_duplicate_suppressed():
    det = np.zeros((2, 5 + 3), dtype=np.float32)
    det[:, :4] = [100, 100, 50, 50]
    det[:, 4] = [0.9, 0.8]
    det[:, 5] = 0.9
    res = batched_nms(jnp.asarray(det[None]), prob_thresh=0.1, iou_thresh=0.3)
    assert int(np.sum(np.asarray(res.valid))) == 1
    # the higher-scoring one wins
    assert np.asarray(res.scores).max() == pytest.approx(0.81, abs=1e-5)


def test_permutation_invariance():
    rng = np.random.default_rng(11)
    det = random_detections(rng, n=150)
    perm = rng.permutation(len(det))
    r1 = batched_nms(jnp.asarray(det[None]), prob_thresh=0.2, iou_thresh=0.4)
    r2 = batched_nms(jnp.asarray(det[perm][None]), prob_thresh=0.2, iou_thresh=0.4)
    assert _result_set(r1) == _result_set(r2)


def test_threshold_filters_everything():
    rng = np.random.default_rng(13)
    det = random_detections(rng)
    det[:, 4] = 0.001  # objectness kills all scores
    res = batched_nms(jnp.asarray(det[None]), prob_thresh=0.5, iou_thresh=0.3)
    assert not np.any(np.asarray(res.valid))
    assert np.all(np.asarray(res.scores) == 0)
    assert np.all(np.asarray(res.classes) == -1)


def test_top_k_cap_keeps_highest():
    rng = np.random.default_rng(17)
    det = random_detections(rng, n=64)
    res = batched_nms(jnp.asarray(det[None]), prob_thresh=0.0,
                      iou_thresh=1.1, top_k=8)  # iou>1.1 never suppresses
    assert res.boxes.shape == (1, 8, 4)
    score = det[:, 4] * det[:, 5:].max(1)
    expected = np.sort(score)[-8:][::-1]
    np.testing.assert_allclose(np.sort(np.asarray(res.scores[0]))[::-1],
                               expected, rtol=1e-5)


def test_max_results_compaction():
    """compact_results keeps exactly the top survivors, same contents."""
    from yolov3_tpu.ops.nms import batched_nms_compact
    from yolov3_tpu.utils.boxes import cxywh_to_tlbr

    rng = np.random.default_rng(23)
    det = random_detections(rng, n=400)
    boxes = jnp.asarray(cxywh_to_tlbr(det[None, :, :4]))
    obj = det[:, 4]
    cls_prob = det[:, 5:].max(1)
    scores = jnp.asarray((obj * cls_prob)[None])
    classes = jnp.asarray(det[:, 5:].argmax(1).astype(np.int32)[None])

    full = batched_nms_compact(boxes, scores, classes, prob_thresh=0.1,
                               iou_thresh=0.5, top_k=256)
    small = batched_nms_compact(boxes, scores, classes, prob_thresh=0.1,
                                iou_thresh=0.5, top_k=256, max_results=16)
    assert small.boxes.shape == (1, 16, 4)
    n_full = int(np.asarray(full.valid).sum())
    # survivors in the compact output = top-16 of the full output by score
    full_scores = np.sort(np.asarray(full.scores[0]))[::-1][:min(16, n_full)]
    small_scores = np.sort(np.asarray(small.scores[0]))[::-1][:min(16, n_full)]
    np.testing.assert_allclose(small_scores, full_scores, rtol=1e-6)
    # boxes/classes agree for the shared survivors
    full_set = {(round(float(s), 5), int(c))
                for s, c, v in zip(full.scores[0], full.classes[0],
                                   full.valid[0]) if v}
    small_set = {(round(float(s), 5), int(c))
                 for s, c, v in zip(small.scores[0], small.classes[0],
                                    small.valid[0]) if v}
    assert small_set <= full_set


def test_batched_independence():
    """Each batch element is NMS'd independently."""
    rng = np.random.default_rng(19)
    a, b = random_detections(rng), random_detections(rng)
    batched = batched_nms(jnp.asarray(np.stack([a, b])), prob_thresh=0.2,
                          iou_thresh=0.4)
    single_a = batched_nms(jnp.asarray(a[None]), prob_thresh=0.2, iou_thresh=0.4)
    assert _result_set(batched, 0) == _result_set(single_a, 0)


def test_over_top_k_truncates_to_exact_top_k_by_score():
    """>K regime (VERDICT.md round-1 #5, eval_coco's prob_thresh=0.005):
    when more candidates pass the threshold than top_k, exactly the K
    highest-scoring candidates enter suppression; with non-overlapping
    boxes (no suppression) the survivor set IS the top-K by score."""
    from yolov3_tpu.ops.nms import batched_nms_compact

    n, k = 2000, 512
    rng = np.random.default_rng(31)
    # non-overlapping 4x4 boxes on a grid: no pair can be suppressed
    gx, gy = np.meshgrid(np.arange(50), np.arange(40))
    x0 = (gx.ravel()[:n] * 8).astype(np.float32)
    y0 = (gy.ravel()[:n] * 8).astype(np.float32)
    boxes = np.stack([x0, y0, x0 + 4, y0 + 4], axis=1)
    scores = rng.permutation(np.linspace(0.01, 0.99, n)).astype(np.float32)
    classes = rng.integers(0, 80, n).astype(np.int32)
    assert (scores >= 0.005).sum() > k  # genuinely >K candidates

    res = batched_nms_compact(jnp.asarray(boxes[None]),
                              jnp.asarray(scores[None]),
                              jnp.asarray(classes[None]),
                              prob_thresh=0.005, iou_thresh=0.3, top_k=k)
    got = np.sort(np.asarray(res.scores[0])[np.asarray(res.valid[0])])
    want = np.sort(scores)[-k:]
    assert len(got) == k
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_over_top_k_full_path_matches_reference_on_top_k_subset():
    """Full batched_nms in the >K regime: suppression semantics on the
    truncated set must equal the numpy reference run on that same subset."""
    rng = np.random.default_rng(37)
    n, k = 1200, 256
    det = random_detections(rng, n=n, classes=4)
    det[:, 4] = rng.uniform(0.5, 1.0, n)  # everything passes the threshold

    res = batched_nms(jnp.asarray(det[None]), prob_thresh=0.01,
                      iou_thresh=0.4, top_k=k)

    # build the reference's input restricted to the top-k candidates
    score = det[:, 4] * det[:, 5:].max(axis=1)
    top = np.argsort(-score, kind="stable")[:k]
    want = numpy_reference_nms(det[top], 0.01, 0.4)
    assert _result_set(res, 0) == want


def test_blocked_suppress_equals_scalar_greedy():
    """_greedy_suppress_blocked is bit-identical to the scalar greedy loop,
    including on adversarial suppression chains (a ladder of boxes where
    each suppresses the next — maximal fixpoint-iteration depth) and across
    block boundaries."""
    import jax
    from yolov3_tpu.ops.nms import (_greedy_suppress,
                                    _greedy_suppress_blocked, iou_matrix)

    rng = np.random.default_rng(41)
    cases = []
    # random clouds
    for n in (64, 128, 512):
        det = random_detections(rng, n=n, classes=5)
        boxes = cxywh_to_tlbr(det[:, :4])
        classes = det[:, 5:].argmax(1).astype(np.int32)
        valid = rng.uniform(0, 1, n) > 0.2
        cases.append((boxes, classes, valid))
    # adversarial ladder: box i overlaps i+1 heavily (chain depth = n),
    # same class, crossing block boundaries
    n = 192
    x0 = np.arange(n, dtype=np.float32) * 4.0
    ladder = np.stack([x0, np.zeros(n, np.float32),
                       x0 + 40.0, np.full(n, 40.0, np.float32)], axis=1)
    cases.append((ladder, np.zeros(n, np.int32), np.ones(n, bool)))

    for boxes, classes, valid in cases:
        iou = iou_matrix(jnp.asarray(boxes))
        same = jnp.asarray(classes[:, None] == classes[None, :])
        va = jnp.asarray(valid)
        ref = np.asarray(jax.jit(_greedy_suppress,
                                 static_argnames="iou_thresh")(iou, same, va, 0.3))
        out = np.asarray(jax.jit(_greedy_suppress_blocked,
                                 static_argnames="iou_thresh")(iou, same, va, 0.3))
        np.testing.assert_array_equal(ref, out)


def test_pairmax_select_matches_topk_select():
    """_select_pairmax is bit-identical to the lax.top_k selection —
    including tie-heavy scores (quantized to force exact duplicates), the
    >K regime, n < k, and the all-below-threshold case."""
    import jax
    from jax import lax
    from yolov3_tpu.ops.nms import _select_pairmax

    def topk_reference(boxes, masked, classes, k):
        top_scores, top_i = lax.top_k(masked, k)
        return (jnp.take_along_axis(boxes, top_i[..., None], axis=1),
                top_scores,
                jnp.take_along_axis(classes, top_i, axis=1),
                top_scores > 0.0)

    rng = np.random.default_rng(57)
    cases = []
    for n, k, quantize, density in [
        (22743, 512, False, 0.02),   # serving shape, sparse
        (2000, 512, False, 0.9),     # >K regime: dense
        (2000, 512, True, 0.9),      # >K with massive score ties
        (300, 512, False, 0.5),      # n < k (k clamps to n)
        (129, 64, True, 1.0),        # odd n: pair padding
        (1000, 256, False, 0.0),     # everything below threshold
    ]:
        b = 3
        raw = rng.uniform(0.1, 1.0, (b, n)).astype(np.float32)
        if quantize:
            raw = (np.round(raw * 8) / 8).astype(np.float32)  # heavy ties
        mask = rng.uniform(0, 1, (b, n)) < density
        masked = np.where(mask, raw, 0.0).astype(np.float32)
        boxes = rng.uniform(0, 416, (b, n, 4)).astype(np.float32)
        classes = rng.integers(0, 80, (b, n), dtype=np.int32)
        cases.append((boxes, masked, classes, min(k, n)))

    select = jax.jit(_select_pairmax, static_argnames=("k", "group"))
    for boxes, masked, classes, k in cases:
        args = (jnp.asarray(boxes), jnp.asarray(masked), jnp.asarray(classes))
        ref = topk_reference(*args, k)
        # group-max exactness holds for ANY group width (incl. odd widths
        # that force padding); 2 is the shipping default
        for group in (2, 3, 4, 8):
            out = select(*args, k=k, group=group)
            # selection set + order must match exactly; box/class payloads
            # of INVALID (zero-score padding) slots are unspecified in both
            valid = np.asarray(ref[3])
            ctx = f"group={group} k={k}"
            np.testing.assert_array_equal(np.asarray(out[1]),
                                          np.asarray(ref[1]), err_msg=ctx)
            np.testing.assert_array_equal(np.asarray(out[3]), valid,
                                          err_msg=ctx)
            np.testing.assert_array_equal(np.asarray(out[0])[valid],
                                          np.asarray(ref[0])[valid],
                                          err_msg=ctx)
            np.testing.assert_array_equal(np.asarray(out[2])[valid],
                                          np.asarray(ref[2])[valid],
                                          err_msg=ctx)


def test_nms_compact_pairmax_equals_topk_end_to_end():
    """batched_nms_compact(select_impl="pairmax") ≡ select_impl="topk"."""
    from yolov3_tpu.ops.nms import batched_nms_compact

    rng = np.random.default_rng(61)
    det = random_detections(rng, n=1200, classes=8)
    boxes = jnp.asarray(cxywh_to_tlbr(det[None, :, :4]))
    scores = jnp.asarray((det[:, 4] * det[:, 5:].max(1))[None])
    classes = jnp.asarray(det[:, 5:].argmax(1).astype(np.int32)[None])
    a = batched_nms_compact(boxes, scores, classes, prob_thresh=0.1,
                            iou_thresh=0.4, top_k=256, select_impl="pairmax")
    b = batched_nms_compact(boxes, scores, classes, prob_thresh=0.1,
                            iou_thresh=0.4, top_k=256, select_impl="topk")
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
    np.testing.assert_array_equal(np.asarray(a.classes), np.asarray(b.classes))


def test_packed_path_equals_compact_path():
    """forward_packed + batched_nms_packed ≡ forward_compact +
    batched_nms_compact (the fused decode→selection serving fast path),
    bit-for-bit, across thresholds including ones that filter heavily."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.model import forward_compact, forward_packed
    from yolov3_tpu.ops.nms import batched_nms_compact, batched_nms_packed
    from yolov3_tpu.weights import fold_raw, random_raw
    import jax.numpy as jnp
    from pathlib import Path

    repo = Path(__file__).parent.parent
    g = load_graph(repo / "models" / "yolov3-tiny.cfg")
    params = {k: {n: jnp.asarray(v) for n, v in p.items()}
              for k, p in fold_raw(random_raw(g, seed=3)).items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
    bx, sc, cl = forward_compact(g, params, x, decode_impl="pallas")
    for thresh in (0.3, 0.62):  # 0.62: most candidates masked out
        ref = batched_nms_compact(bx, sc, cl, prob_thresh=thresh,
                                  iou_thresh=0.4)
        payload, scores = forward_packed(g, params, x, prob_thresh=thresh)
        out = batched_nms_packed(payload, scores, iou_thresh=0.4)
        for name in ("valid", "scores", "boxes", "classes"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, name)),
                np.asarray(getattr(out, name)), err_msg=f"{name}@{thresh}")


def test_packed_max_results_matches_compact():
    """batched_nms_packed with max_results compaction ≡ compact path."""
    from yolov3_tpu.ops.nms import batched_nms_compact, batched_nms_packed

    rng = np.random.default_rng(73)
    n, thresh = 3000, 0.25
    det = random_detections(rng, n=n, classes=10)
    boxes = jnp.asarray(cxywh_to_tlbr(det[None, :, :4]))
    scores_raw = (det[:, 4] * det[:, 5:].max(1))[None]
    classes = jnp.asarray(det[:, 5:].argmax(1).astype(np.int32)[None])
    # packed contract: payload lane 4 / scores already thresholded
    masked = np.where(scores_raw >= thresh, scores_raw, 0.0).astype(np.float32)
    iota = np.broadcast_to(np.arange(n, dtype=np.float32), (1, n))
    payload = jnp.asarray(np.concatenate(
        [np.asarray(boxes), masked[..., None],
         det[:, 5:].argmax(1).astype(np.float32)[None, :, None],
         iota[..., None], np.zeros((1, n, 1), np.float32)], axis=-1))
    ref = batched_nms_compact(boxes, jnp.asarray(scores_raw), classes,
                              prob_thresh=thresh, iou_thresh=0.45,
                              top_k=256, max_results=32)
    out = batched_nms_packed(payload, jnp.asarray(masked), iou_thresh=0.45,
                             top_k=256, max_results=32)
    for name in ("valid", "scores", "boxes", "classes"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, name)),
                                      np.asarray(getattr(out, name)),
                                      err_msg=name)


def test_pairmax_fuzz_many_shapes():
    """Randomized sweep: pairmax selection ≡ lax.top_k across shapes,
    densities, k values, and tie structures (25 random configs)."""
    import jax
    from jax import lax
    from yolov3_tpu.ops.nms import _select_pairmax

    rng = np.random.default_rng(97)
    select = jax.jit(_select_pairmax, static_argnames=("k", "group"))
    for trial in range(25):
        n = int(rng.integers(2, 4000))
        b = int(rng.integers(1, 4))
        k = min(int(rng.integers(1, 600)), n)
        density = float(rng.uniform(0, 1))
        quant = rng.uniform() < 0.5
        group = int(rng.choice([2, 2, 3, 4, 8]))
        raw = rng.uniform(0.05, 1.0, (b, n)).astype(np.float32)
        if quant:
            raw = (np.round(raw * 4) / 4).astype(np.float32)  # massive ties
        masked = np.where(rng.uniform(0, 1, (b, n)) < density, raw, 0.0
                          ).astype(np.float32)
        boxes = rng.uniform(0, 416, (b, n, 4)).astype(np.float32)
        classes = rng.integers(0, 80, (b, n), dtype=np.int32)

        ts, ti = lax.top_k(jnp.asarray(masked), k)
        ref_boxes = jnp.take_along_axis(jnp.asarray(boxes),
                                        ti[..., None], axis=1)
        ref_classes = jnp.take_along_axis(jnp.asarray(classes), ti, axis=1)
        out = select(jnp.asarray(boxes), jnp.asarray(masked),
                     jnp.asarray(classes), k=k, group=group)
        valid = np.asarray(ts) > 0
        ctx = (f"trial={trial} n={n} b={b} k={k} density={density:.2f} "
               f"group={group}")
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ts),
                                      err_msg=ctx)
        np.testing.assert_array_equal(np.asarray(out[3]), valid, err_msg=ctx)
        np.testing.assert_array_equal(np.asarray(out[0])[valid],
                                      np.asarray(ref_boxes)[valid],
                                      err_msg=ctx)
        np.testing.assert_array_equal(np.asarray(out[2])[valid],
                                      np.asarray(ref_classes)[valid],
                                      err_msg=ctx)


def test_pack_results_roundtrip_and_validity_invariant():
    """pack_results/unpack_results (round-4 serving fast path: ONE device
    array per batch instead of four, so _unpack pays one D2H transfer).
    The pack drops the valid plane, relying on the producer contract —
    suppressed/pad scores are zeroed, surviving scores strictly positive —
    so ``score > 0`` ≡ ``valid``. Verify the contract on real NMS output
    (including prob_thresh=0.0, where `>= thresh` alone would admit exact
    zeros) and the exact round trip of every field."""
    from yolov3_tpu.ops.nms import (batched_nms_compact, pack_results,
                                    unpack_results)

    rng = np.random.default_rng(91)
    det = random_detections(rng, n=900, classes=6)
    boxes = jnp.asarray(cxywh_to_tlbr(det[None, :, :4]))
    scores = jnp.asarray((det[:, 4] * det[:, 5:].max(1))[None])
    classes = jnp.asarray(det[:, 5:].argmax(1).astype(np.int32)[None])
    for thresh in (0.0, 0.3):
        res = batched_nms_compact(boxes, scores, classes, prob_thresh=thresh,
                                  iou_thresh=0.4, top_k=128)
        np.testing.assert_array_equal(np.asarray(res.valid),
                                      np.asarray(res.scores) > 0.0,
                                      err_msg=f"producer contract@{thresh}")
        packed = pack_results(res)
        assert packed.shape == (*res.scores.shape, 6)
        back = unpack_results(packed)
        for name in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(res, name)),
                                          np.asarray(getattr(back, name)),
                                          err_msg=f"{name}@{thresh}")


def test_blocked_fused_equals_blocked():
    """_greedy_suppress_blocked_fused (on-the-fly conflict columns) is
    bit-identical to the matrix-based blocked form and the scalar greedy."""
    import jax
    from yolov3_tpu.ops.nms import (_greedy_suppress_blocked,
                                    _greedy_suppress_blocked_fused,
                                    iou_matrix)

    rng = np.random.default_rng(43)
    for n in (64, 128, 512, 100):  # 100: non-multiple fallback path
        det = random_detections(rng, n=n, classes=5)
        boxes = jnp.asarray(cxywh_to_tlbr(det[:, :4]))
        classes = jnp.asarray(det[:, 5:].argmax(1).astype(np.int32))
        valid = jnp.asarray(rng.uniform(0, 1, n) > 0.2)
        ref = np.asarray(jax.jit(
            _greedy_suppress_blocked, static_argnames="iou_thresh")(
            iou_matrix(boxes), classes[:, None] == classes[None, :],
            valid, 0.3)) if n % 64 == 0 else None
        out = np.asarray(jax.jit(
            _greedy_suppress_blocked_fused, static_argnames="iou_thresh")(
            boxes, classes, valid, 0.3))
        if ref is not None:
            np.testing.assert_array_equal(ref, out)
        # always identical to the scalar greedy reference
        from yolov3_tpu.ops.nms import _greedy_suppress
        scalar = np.asarray(jax.jit(
            _greedy_suppress, static_argnames="iou_thresh")(
            iou_matrix(boxes), classes[:, None] == classes[None, :],
            valid, 0.3))
        np.testing.assert_array_equal(scalar, out)


def test_detector_select_group_plumbing_bit_identical(cfg_paths):
    """Detector(select_group=G) produces BIT-identical detections for any G
    (the group-max selection proof in ops/nms.py::_select_pairmax holds for
    every width; this pins the end-to-end plumbing through Detector)."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import fold_raw, random_raw
    from yolov3_tpu.graph import load_graph

    g = load_graph(cfg_paths["yolov3-tiny"])
    params = fold_raw(random_raw(g, seed=11))
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (2, 200, 320, 3), dtype=np.uint8)
    results = []
    for grp in (2, 8):
        net = Darknet(cfg_paths["yolov3-tiny"],
                      precision="highest").set_params(params)
        det = Detector(net, prob_thresh=0.2, net_hw=(128, 128),
                       select_group=grp)
        results.append(det.detect_batch(frames))
    for a, b in zip(*results):
        np.testing.assert_array_equal(a.class_prob, b.class_prob)
        np.testing.assert_array_equal(a.class_idx, b.class_idx)
        np.testing.assert_array_equal(a.bbox_tlbr, b.bbox_tlbr)

    import pytest
    with pytest.raises(ValueError):
        Detector(Darknet(cfg_paths["yolov3-tiny"],
                         precision="highest").set_params(params),
                 select_group=1)


def test_auto_top_k_policy(cfg_paths):
    """auto_top_k is the ONE NMS working-set policy source (round 4): 256
    for graphs whose candidate space is <= 4096, 512 otherwise — and both
    Detector(top_k=None) and bench.py's mirror resolve through it, so the
    driver-captured bench rows are the numbers a Detector user gets."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.ops.nms import auto_top_k

    tiny = load_graph(cfg_paths["yolov3-tiny"])
    full = load_graph(cfg_paths["yolov3"])
    spp = load_graph(cfg_paths["yolov3-spp"])

    # tiny@416: (26^2 + 13^2) * 3 = 2535 candidates -> small preset
    assert tiny.num_detections(416, 416) == 2535
    assert auto_top_k(tiny, (416, 416)) == 256
    # the preset is resolution-dependent, not model-name-dependent:
    # tiny@608 has (38^2 + 19^2) * 3 = 5415 > 4096 candidates
    assert auto_top_k(tiny, (608, 608)) == 512
    # full-size graphs stay at the historical 512 at every benched size
    for g in (full, spp):
        for s in (320, 416, 608):
            assert auto_top_k(g, (s, s)) == 512

    # bench.py's wrapper delegates to the same policy (single source)
    import bench
    for g, hw in ((tiny, (416, 416)), (tiny, (608, 608)),
                  (full, (608, 608))):
        assert bench.auto_top_k(g, hw) == auto_top_k(g, hw)


def test_detector_resolves_auto_top_k(cfg_paths):
    """Detector(top_k=None) resolves the preset AFTER net_hw is known (the
    candidate space depends on the serving resolution, not the cfg's
    net_size); an explicit top_k always wins."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import fold_raw, random_raw

    params = fold_raw(random_raw(load_graph(cfg_paths["yolov3-tiny"]),
                                 seed=5))

    def det(**kw):
        net = Darknet(cfg_paths["yolov3-tiny"]).set_params(params)
        return Detector(net, **kw)

    assert det(net_hw=(416, 416)).top_k == 256
    assert det(net_hw=(608, 608)).top_k == 512
    assert det(net_hw=(416, 416), top_k=96).top_k == 96
