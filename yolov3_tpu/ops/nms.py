"""Batched, static-shape, class-aware NMS — entirely on-device.

The reference's ``yolov3/inference.py::non_max_suppression`` (SURVEY.md §2.7)
runs per-image Python loops over unique class ids on the host — its slowest
stage and the explicit point of attack in BASELINE.json's north star. Here the
whole filter runs under jit with static shapes:

1. score = objectness × max class prob; class = argmax (reference formula);
2. threshold mask → per-image ``top_k`` (static K) candidates;
3. dense K×K IoU matrix (one fused batched pass);
4. exact greedy suppression in score order (greedy NMS is order-dependent and
   non-transitive, so the scan is semantically required — each step is a tiny
   vectorized mask update);
5. fixed-size output: (boxes_tlbr, scores, classes, valid) each padded to K.

``impl="xla"`` runs stages 3–4 as fused XLA ops; ``impl="pallas"`` runs them
as one VMEM-resident Pallas kernel per image (``ops/pallas_nms.py``). Both
are exact-greedy and bit-agree.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class NMSResult(NamedTuple):
    boxes: jax.Array   # (B, K, 4) tlbr, net-input pixels
    scores: jax.Array  # (B, K) obj * class prob, 0 where invalid
    classes: jax.Array  # (B, K) int32 class ids
    valid: jax.Array   # (B, K) bool survivor mask


def auto_top_k(graph, net_hw) -> int:
    """The NMS working-set preset — the ONE policy source (round 4):
    256 for small graphs (candidate space ≤ 4096; tiny@416 has 2535 and
    measured +18% throughput at K=256, tools/bench_tiny_k.py), 512
    otherwise. Semantics are bounded by the >K truncation contract:
    results change only on images where more than K candidates pass the
    serving threshold. Used by Detector(top_k=None) and mirrored by
    bench.py so driver-captured rows are the numbers a Detector user
    gets."""
    return 256 if graph.num_detections(*net_hw) <= 4096 else 512


def pack_results(res: NMSResult) -> jax.Array:
    """Flatten an NMSResult into ONE f32 array for a single D2H transfer:
    ``[..., :4]`` tlbr boxes, ``[..., 4]`` score, ``[..., 5]`` class id.

    Validity needs no separate plane: every NMS producer in this module
    zeroes scores on suppressed/pad slots and every surviving candidate's
    score is strictly positive (sigmoid outputs are > 0), so
    ``score > 0`` ≡ ``valid`` — the host side recovers the mask for free.
    Class ids (< 80) and net-pixel boxes are exact in f32.

    Serving motivation: the four-field fetch cost four device→host
    transfers per batch — four launch round trips on any transport, and
    through this environment's relay ~30 ms EACH (measured round 4,
    tools/bench_serve.py: 4 fetches dominated the sequential request)."""
    return jnp.concatenate(
        [res.boxes, res.scores[..., None],
         res.classes.astype(jnp.float32)[..., None]], axis=-1)


def unpack_results(arr) -> NMSResult:
    """Host-side inverse of ``pack_results`` (numpy in, numpy fields out)."""
    import numpy as np

    arr = np.asarray(arr)
    scores = arr[..., 4]
    return NMSResult(boxes=arr[..., :4], scores=scores,
                     classes=arr[..., 5].astype(np.int32),
                     valid=scores > 0.0)


def iou_matrix(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU of (K, 4) tlbr boxes → (K, K)."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    tl = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    br = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(br - tl, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _greedy_suppress(iou: jax.Array, same_class: jax.Array, valid: jax.Array,
                     iou_thresh: float) -> jax.Array:
    """Exact greedy NMS over score-desc-sorted candidates (scalar loop).

    keep[i] ⇔ valid[i] and no kept j<i of the same class with IoU>τ —
    identical semantics to the reference's per-class greedy loop. Kept as
    the semantic reference; production uses :func:`_greedy_suppress_blocked`
    (bit-identical, ~6× fewer sequential steps).
    """
    k = iou.shape[0]
    conflict = (iou > iou_thresh) & same_class  # (K, K), symmetric

    def body(i, keep):
        suppressed = jnp.any(keep & conflict[:, i])
        return keep.at[i].set(valid[i] & ~suppressed)

    return lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))


_BLOCK = 64


def _greedy_suppress_blocked(iou: jax.Array, same_class: jax.Array,
                             valid: jax.Array, iou_thresh: float
                             ) -> jax.Array:
    """Exact greedy NMS with blocked sequential structure (XLA impl).

    The scalar loop above is latency-bound: K sequential steps of trivial
    vector work (~1.9 ms of the b128 step at K=512). This computes the
    SAME fixpoint in K/64 sequential block steps: candidates already kept
    in earlier blocks suppress the block via one masked matrix reduce, and
    the block's internal order resolves by fixpoint iteration of

        keep[i] ← valid[i] ∧ ¬∃ j<i : keep[j] ∧ conflict[j, i]

    which converges to the greedy solution in at most the depth of the
    block's suppression DAG (elements at depth ≤ t are correct and fixed
    after t sweeps; real candidate sets converge in a handful).
    """
    k = iou.shape[0]
    if k % _BLOCK:
        return _greedy_suppress(iou, same_class, valid, iou_thresh)
    conflict = (iou > iou_thresh) & same_class  # (K, K), symmetric
    n_blocks = k // _BLOCK
    # strictly-lower-triangular mask: j (row) suppresses i (col) iff j < i
    tri = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1))

    def block_step(b, keep):
        off = b * _BLOCK
        conf_cols = lax.dynamic_slice(conflict, (0, off), (k, _BLOCK))
        ext = jnp.any(keep[:, None] & conf_cols, axis=0)      # (BLOCK,)
        v = lax.dynamic_slice(valid, (off,), (_BLOCK,)) & ~ext
        cloc = lax.dynamic_slice(conf_cols, (off, 0),
                                 (_BLOCK, _BLOCK)) & tri      # (BLOCK, BLOCK)

        def fix_cond(state):
            kb, changed = state
            return changed

        def fix_body(state):
            kb, _ = state
            nkb = v & ~jnp.any(kb[:, None] & cloc, axis=0)
            return nkb, jnp.any(nkb != kb)

        kb, _ = lax.while_loop(fix_cond, fix_body,
                               (v, jnp.asarray(True)))
        return lax.dynamic_update_slice(keep, kb, (off,))

    return lax.fori_loop(0, n_blocks, block_step,
                         jnp.zeros((k,), dtype=bool))


def _greedy_suppress_blocked_fused(boxes: jax.Array, classes: jax.Array,
                                   valid: jax.Array, iou_thresh: float
                                   ) -> jax.Array:
    """Blocked greedy NMS with the conflict columns computed ON THE FLY.

    Same fixpoint as :func:`_greedy_suppress_blocked` (bit-identical keep
    mask), but instead of materializing the dense K×K IoU/conflict matrix
    — (B, 512, 512) f32 + bool per batch at serving shape, most of the
    measured 0.8 ms IoU stage — each block step computes just its (K, 64)
    conflict slab from the raw boxes/classes. Total IoU ARITHMETIC is
    unchanged (K/64 slabs of K×64 = the same K² pairs); the win is that
    nothing K²-sized is ever written to or read from memory.
    """
    k = boxes.shape[0]
    if k % _BLOCK:
        iou = iou_matrix(boxes)
        same = classes[:, None] == classes[None, :]
        return _greedy_suppress(iou, same, valid, iou_thresh)
    n_blocks = k // _BLOCK
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1))

    def block_step(b, keep):
        off = b * _BLOCK
        blk_boxes = lax.dynamic_slice(boxes, (off, 0), (_BLOCK, 4))
        blk_cls = lax.dynamic_slice(classes, (off,), (_BLOCK,))
        blk_area = lax.dynamic_slice(area, (off,), (_BLOCK,))
        # (K, BLOCK) IoU of every candidate vs this block — identical
        # arithmetic to iou_matrix's corresponding columns
        tl = jnp.maximum(boxes[:, None, :2], blk_boxes[None, :, :2])
        br = jnp.minimum(boxes[:, None, 2:], blk_boxes[None, :, 2:])
        wh = jnp.maximum(br - tl, 0)
        inter = wh[..., 0] * wh[..., 1]
        union = area[:, None] + blk_area[None, :] - inter
        conf_cols = ((inter / jnp.maximum(union, 1e-9) > iou_thresh)
                     & (classes[:, None] == blk_cls[None, :]))

        ext = jnp.any(keep[:, None] & conf_cols, axis=0)
        v = lax.dynamic_slice(valid, (off,), (_BLOCK,)) & ~ext
        cloc = lax.dynamic_slice(conf_cols, (off, 0),
                                 (_BLOCK, _BLOCK)) & tri

        def fix_cond(state):
            kb, changed = state
            return changed

        def fix_body(state):
            kb, _ = state
            nkb = v & ~jnp.any(kb[:, None] & cloc, axis=0)
            return nkb, jnp.any(nkb != kb)

        kb, _ = lax.while_loop(fix_cond, fix_body,
                               (v, jnp.asarray(True)))
        return lax.dynamic_update_slice(keep, kb, (off,))

    return lax.fori_loop(0, n_blocks, block_step,
                         jnp.zeros((k,), dtype=bool))


def _candidates(det: jax.Array, prob_thresh: float, top_k: int):
    """Per-image: score/class reduction, threshold, static top-k gather."""
    obj = det[:, 4]
    class_prob = jnp.max(det[:, 5:], axis=1)
    class_idx = jnp.argmax(det[:, 5:], axis=1).astype(jnp.int32)
    score = obj * class_prob

    passed = score >= prob_thresh
    masked = jnp.where(passed, score, 0.0)

    k = min(top_k, det.shape[0])
    top_scores, top_i = lax.top_k(masked, k)
    valid = top_scores > 0.0

    cxywh = det[top_i, :4]
    half = cxywh[:, 2:4] * 0.5
    boxes = jnp.concatenate([cxywh[:, :2] - half, cxywh[:, :2] + half], axis=1)
    return boxes, top_scores, class_idx[top_i], valid


def _select_pairmax(boxes: jax.Array, masked: jax.Array, classes: jax.Array,
                    k: int, group: int = 2):
    """Exact top-k candidate selection via group-max reduction (serving
    path).

    Replaces ``lax.top_k(masked, k)`` + two big gathers, which measure
    ~3.1 ms at (B=128, N=22743, K=512) on v5e — lax.top_k scales with N·k
    and every take_along_axis from an (B, N, ·) operand costs ~0.7 ms
    regardless of payload width (tools/bench_topk*.py). Three steps:

    1. group-max: reduce scores to N/G group maxima (one cheap VPU pass);
    2. ``lax.top_k`` over the group maxima (N/G-size input, int32 bitcast
       keys — monotone for non-negative floats and ~20% faster than f32),
       then ONE packed gather of all G elements of each selected group;
    3. small 2-key stable sort of the G·k surviving candidates by
       (score desc, original index asc) — exactly lax.top_k's order.

    Exactness (incl. ties), for ANY group size G: an element e belongs to
    the top-k by (score desc, index asc) ⇒ fewer than k elements precede
    it ⇒ fewer than k groups have (max, group-index) preceding e's group
    (each such group contains a preceding element) ⇒ e's group is in the
    group-top-k, so e survives step 2 and step 3 places it exactly.
    Tested against lax.top_k bit-for-bit at G ∈ {2, 4, 8}, tie-heavy
    cases included (tests/test_nms.py).

    ``group`` trades the dominant ``top_k`` term (∝ N/G · k) against the
    final sort size (G·k): G=2 is the round-2 measured default; larger G
    shrinks top_k further once the sort is the cheaper side.
    """
    b, n = masked.shape
    if n >= 2 ** 24:
        # the f32 candidate-index lane is exact only below 2^24; fall back
        # to the direct top_k form (bit-identical results) above it rather
        # than silently mis-breaking ties (static shape — free at trace time)
        top_scores, top_i = lax.top_k(masked, k)
        return (jnp.take_along_axis(boxes, top_i[..., None], axis=1),
                top_scores,
                jnp.take_along_axis(classes, top_i, axis=1),
                top_scores > 0.0)
    iota = lax.broadcasted_iota(jnp.float32, (b, n), 1)  # < 2^24: exact f32
    # packed per-candidate payload: one gather moves everything
    payload = jnp.concatenate(
        [boxes, masked[..., None], classes.astype(jnp.float32)[..., None],
         iota[..., None], jnp.zeros((b, n, 1), jnp.float32)], axis=-1)
    return _select_pairmax_payload(payload, masked, k, group=group)


def _select_pairmax_payload(payload: jax.Array, masked: jax.Array, k: int,
                            group: int = 2):
    """Group-max selection over a prebuilt candidate payload (B, N, 8) with
    lanes [x0, y0, x1, y1, thresholded score, class, candidate index, –].

    CONTRACT: lane 4 must equal ``masked`` (score already thresholded —
    the fused decode kernel zeroes it in-kernel); an unthresholded lane 4
    would let sub-threshold candidates through the final sort as valid."""
    b, n = masked.shape
    # lane 6 (candidate index) is f32 — exact only below 2^24. The payload's
    # index was computed upstream (in-kernel), so there is no exact fallback
    # here; no real head layout comes near this (N=22743 @608). Static shape:
    # the assert is free at trace time.
    assert n < 2 ** 24, (
        f"pair-max payload selection requires N < 2^24 for exact f32 "
        f"indices; got N={n}")
    assert group >= 2
    npg = -(-n // group) * group
    if npg != n:
        payload = jnp.pad(payload, ((0, 0), (0, npg - n), (0, 0)))
        masked = jnp.pad(masked, ((0, 0), (0, npg - n)))

    kp = min(k, npg // group)
    pmax = jnp.max(masked.reshape(b, npg // group, group), axis=2)
    _, pair_i = lax.top_k(lax.bitcast_convert_type(pmax, jnp.int32), kp)
    pairs = jnp.take_along_axis(payload.reshape(b, npg // group, 8 * group),
                                pair_i[..., None], axis=1)
    cand = pairs.reshape(b, group * kp, 8)

    key = -lax.bitcast_convert_type(cand[:, :, 4], jnp.int32)
    srt = lax.sort((key, cand[:, :, 6], cand[:, :, 0], cand[:, :, 1],
                    cand[:, :, 2], cand[:, :, 3], cand[:, :, 5]),
                   dimension=1, num_keys=2)
    top_scores = lax.bitcast_convert_type(-srt[0][:, :k], jnp.float32)
    top_boxes = jnp.stack([srt[i][:, :k] for i in (2, 3, 4, 5)], axis=-1)
    top_classes = srt[6][:, :k].astype(jnp.int32)
    return top_boxes, top_scores, top_classes, top_scores > 0.0


def compact_results(res: NMSResult, max_results: int) -> NMSResult:
    """Gather the top ``max_results`` survivors per image (score-desc).

    Post-NMS survivor counts are far below the NMS working set K; shrinking
    the returned buffers cuts device→host transfer by K/max_results (COCO
    evaluation itself caps at 100 detections/image)."""
    k = res.scores.shape[1]
    r = min(max_results, k)
    top_scores, idx = lax.top_k(jnp.where(res.valid, res.scores, -1.0), r)
    take = lambda a: jnp.take_along_axis(a, idx, axis=1)  # noqa: E731
    valid = take(res.valid) & (top_scores > 0)
    return NMSResult(
        boxes=jnp.take_along_axis(res.boxes, idx[..., None], axis=1),
        scores=jnp.where(valid, top_scores, 0.0),
        classes=jnp.where(valid, take(res.classes), -1),
        valid=valid,
    )


def _suppress_batch(boxes, scores, classes, valid, iou_thresh, impl,
                    interpret):
    if impl == "pallas":
        from .pallas_nms import pallas_suppress

        keep = pallas_suppress(boxes, classes, valid, iou_thresh,
                               interpret=interpret)
    elif impl == "xla":
        # fused variant: conflict columns computed per block step — the
        # dense (B, K, K) IoU matrix never materializes
        keep = jax.vmap(
            lambda bx, cl, va: _greedy_suppress_blocked_fused(
                bx, cl, va, iou_thresh))(boxes, classes, valid)
    else:
        raise ValueError(f"unknown NMS impl {impl!r}")

    return NMSResult(
        boxes=jnp.where(keep[..., None], boxes, 0.0),
        scores=jnp.where(keep, scores, 0.0),
        classes=jnp.where(keep, classes, -1),
        valid=keep,
    )


@partial(jax.jit, static_argnames=("prob_thresh", "iou_thresh", "top_k",
                                   "impl", "interpret"))
def batched_nms(detections: jax.Array, prob_thresh: float = 0.05,
                iou_thresh: float = 0.3, top_k: int = 512,
                impl: str = "xla", interpret: bool = False) -> NMSResult:
    """Class-aware NMS over a batch of decoded detections (B, N, 5+C).

    ``prob_thresh``/``iou_thresh`` default to the reference CLI defaults
    (SURVEY.md §2.11). K caps the NMS working set per image (static shape).
    **>K truncation contract:** when more than ``top_k`` candidates pass the
    threshold, exactly the K highest-scoring candidates enter suppression
    and the rest are dropped (tested in tests/test_nms.py::test_over_top_k_*).
    K=512 is far above any real image's census at the reference's serving
    defaults (0.05); evaluation at very low thresholds (eval_coco's 0.005)
    should raise K — ``tools/eval_coco.py`` defaults to 1024 and exposes
    ``--top-k``.
    """
    boxes, scores, classes, valid = jax.vmap(
        lambda d: _candidates(d, prob_thresh, top_k))(detections)
    return _suppress_batch(boxes, scores, classes, valid, iou_thresh, impl,
                           interpret)


@partial(jax.jit, static_argnames=("prob_thresh", "iou_thresh", "top_k",
                                   "impl", "interpret", "max_results",
                                   "select_impl", "select_group"))
def batched_nms_compact(boxes: jax.Array, scores: jax.Array,
                        classes: jax.Array, prob_thresh: float = 0.05,
                        iou_thresh: float = 0.3, top_k: int = 512,
                        impl: str = "xla", interpret: bool = False,
                        max_results: int = 0,
                        select_impl: str = "pairmax",
                        select_group: int = 2) -> NMSResult:
    """NMS over compact-decode outputs (serving path): tlbr boxes (B, N, 4),
    scores (B, N), classes (B, N) — score/class reduction already fused into
    decode, so this is just threshold → top-k gather → greedy suppression.
    Identical semantics/results to :func:`batched_nms` on the same data.
    ``max_results > 0`` compacts the output to that many top survivors.
    ``select_impl``: "pairmax" (default — exact pair-max selection,
    ~1.6× faster at serving shapes, see :func:`_select_pairmax`) or "topk"
    (the direct lax.top_k + gathers formulation; bit-identical results).
    ``select_group``: group-max reduction width (see :func:`_select_pairmax`;
    bit-identical results for any value).
    """
    masked = jnp.where(scores >= prob_thresh, scores, 0.0)
    k = min(top_k, scores.shape[1])
    if select_impl == "pairmax":
        top_boxes, top_scores, top_classes, valid = _select_pairmax(
            boxes, masked, classes, k, group=select_group)
    elif select_impl == "topk":
        top_scores, top_i = lax.top_k(masked, k)  # batched over leading dim
        valid = top_scores > 0.0
        top_boxes = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
        top_classes = jnp.take_along_axis(classes, top_i, axis=1)
    else:
        raise ValueError(f"unknown select_impl {select_impl!r}")
    res = _suppress_batch(top_boxes, top_scores, top_classes, valid,
                          iou_thresh, impl, interpret)
    if max_results and max_results < k:
        res = compact_results(res, max_results)
    return res


@partial(jax.jit, static_argnames=("iou_thresh", "top_k", "impl",
                                   "interpret", "max_results",
                                   "select_group"))
def batched_nms_packed(payload: jax.Array, scores: jax.Array,
                       iou_thresh: float = 0.3, top_k: int = 512,
                       impl: str = "xla", interpret: bool = False,
                       max_results: int = 0,
                       select_group: int = 2) -> NMSResult:
    """NMS over the fused packed decode output (serving fast path):
    ``payload`` (B, N, 8) candidate records and ``scores`` (B, N) from
    ``ops.pallas_decode.decode_packed_pallas`` — **already thresholded
    in-kernel** (pass the serving ``prob_thresh`` to the decode; this
    function applies none). Results are identical to
    :func:`batched_nms_compact` at the same threshold; the payload's
    in-kernel candidate-index lane replaces the iota/concat build.
    ``select_group``: group-max reduction width (bit-identical results for
    any value; see :func:`_select_pairmax`)."""
    k = min(top_k, scores.shape[1])
    top_boxes, top_scores, top_classes, valid = _select_pairmax_payload(
        payload, scores, k, group=select_group)
    res = _suppress_batch(top_boxes, top_scores, top_classes, valid,
                          iou_thresh, impl, interpret)
    if max_results and max_results < k:
        res = compact_results(res, max_results)
    return res
