"""On-TPU validation: compiled Pallas kernels vs jnp references, full pipeline
smoke, and per-stage timing. Run on the real chip (no env overrides):

    python tools/tpu_check.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def check_decode():
    from yolov3_tpu.ops.decode import decode_head
    from yolov3_tpu.ops.pallas_decode import decode_head_pallas

    anchors = ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0))
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(0, 1, (8, 19, 19, 255)).astype(np.float32))
    ref = np.asarray(decode_head(feat, anchors, 32, 80))
    out = np.asarray(decode_head_pallas(feat, anchors, 32, 80))
    err = np.abs(out - ref).max()
    rel = (np.abs(out - ref) / (np.abs(ref) + 1e-6)).max()
    print(f"pallas decode compiled: max abs {err:.2e}, max rel {rel:.2e}")
    assert rel < 1e-4, "pallas decode diverges on TPU"


def check_compact_decode():
    """Fused compact-decode kernel (the serving default) vs XLA compact
    decode, compiled on the chip — bit-exact modulo the documented
    anchor-major candidate order."""
    from yolov3_tpu.ops.decode import decode_compact_head
    from yolov3_tpu.ops.pallas_decode import decode_compact_head_pallas

    anchors = ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0))
    rng = np.random.default_rng(5)
    feat = jnp.asarray(rng.normal(0, 2, (3, 19, 19, 255)).astype(np.float32))
    bx0, sc0, cl0 = decode_compact_head(feat, anchors, 32, 80)
    bx1, sc1, cl1 = decode_compact_head_pallas(feat, anchors, 32, 80)
    g2, n = 361, 1083

    def reorder(x):
        x = np.asarray(x)
        return (x.reshape(3, g2, 3, *x.shape[2:]).swapaxes(1, 2)
                .reshape(x.shape[0], n, *x.shape[2:]))

    err = max(np.abs(reorder(bx0) - np.asarray(bx1)).max(),
              np.abs(reorder(sc0) - np.asarray(sc1)).max())
    mism = int((reorder(cl0) != np.asarray(cl1)).sum())
    print(f"pallas compact decode compiled: max abs {err:.2e}, "
          f"class mismatches {mism}")
    assert err == 0.0 and mism == 0, "pallas compact decode diverges on TPU"


def check_nms():
    from yolov3_tpu.ops.nms import batched_nms

    rng = np.random.default_rng(1)
    n = 2000
    det = np.concatenate([
        rng.uniform(0, 608, (n, 2)), rng.uniform(10, 150, (n, 2)),
        rng.uniform(0, 1, (n, 1)), rng.uniform(0, 1, (n, 80))], 1
    ).astype(np.float32)
    det = jnp.asarray(np.stack([det] * 4))
    ref = batched_nms(det, prob_thresh=0.3, iou_thresh=0.4, top_k=256,
                      impl="xla")
    out = batched_nms(det, prob_thresh=0.3, iou_thresh=0.4, top_k=256,
                      impl="pallas")
    ok = np.array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    print(f"pallas NMS compiled: survivors "
          f"{int(np.asarray(out.valid).sum())} vs xla "
          f"{int(np.asarray(ref.valid).sum())}, exact match: {ok}")
    assert ok, "pallas NMS diverges on TPU"


def check_pairmax_select():
    """pairmax selection ≡ lax.top_k selection, compiled on the chip."""
    from yolov3_tpu.ops.nms import batched_nms_compact
    from yolov3_tpu.utils.boxes import cxywh_to_tlbr

    rng = np.random.default_rng(3)
    n = 22743
    boxes = jnp.asarray(cxywh_to_tlbr(np.concatenate(
        [rng.uniform(0, 608, (2, n, 2)), rng.uniform(8, 120, (2, n, 2))],
        axis=2).astype(np.float32)))
    scores = jnp.asarray(rng.uniform(0, 1, (2, n)).astype(np.float32)
                         * (rng.uniform(0, 1, (2, n)) < 0.05))
    classes = jnp.asarray(rng.integers(0, 80, (2, n), dtype=np.int32))
    a = batched_nms_compact(boxes, scores, classes, prob_thresh=0.3,
                            select_impl="pairmax")
    b = batched_nms_compact(boxes, scores, classes, prob_thresh=0.3,
                            select_impl="topk")
    ok = (np.array_equal(np.asarray(a.valid), np.asarray(b.valid))
          and np.array_equal(np.asarray(a.scores), np.asarray(b.scores))
          and np.array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
          and np.array_equal(np.asarray(a.classes), np.asarray(b.classes)))
    print(f"pairmax select compiled: survivors "
          f"{int(np.asarray(a.valid).sum())}, exact match vs top_k: {ok}")
    assert ok, "pairmax selection diverges on TPU"


def check_packed_decode():
    """The fused packed decode (the serving default) end-to-end on chip:
    forward_packed + batched_nms_packed must match forward_compact +
    batched_nms_compact bit-for-bit (same contract as the CPU test
    tests/test_nms.py::test_packed_path_equals_compact_path)."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.model import forward_compact, forward_packed
    from yolov3_tpu.ops.nms import batched_nms_compact, batched_nms_packed
    from yolov3_tpu.weights import fold_raw, random_raw

    repo = Path(__file__).parent.parent
    g = load_graph(repo / "models" / "yolov3-tiny.cfg")
    params = {k: {n: jnp.asarray(v) for n, v in p.items()}
              for k, p in fold_raw(random_raw(g, seed=3)).items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
    bx, sc, cl = jax.jit(lambda p, x: forward_compact(
        g, p, x, decode_impl="pallas"))(params, x)
    ref = batched_nms_compact(bx, sc, cl, prob_thresh=0.3, iou_thresh=0.4)
    payload, scores = jax.jit(lambda p, x: forward_packed(
        g, p, x, prob_thresh=0.3))(params, x)
    out = batched_nms_packed(payload, scores, iou_thresh=0.4)
    ok = all(np.array_equal(np.asarray(getattr(ref, f)),
                            np.asarray(getattr(out, f)))
             for f in ("valid", "scores", "boxes", "classes"))
    print(f"packed decode compiled: survivors "
          f"{int(np.asarray(out.valid).sum())}, exact match vs compact: {ok}")
    assert ok, "packed decode path diverges on TPU"


def _packed_paths_close(p0, s0, p1, s1, prob_thresh, score_atol,
                        straddle_eps=2e-3, box_atol=5e-3):
    """Position-aligned comparison of two packed-decode outputs that differ
    only in accumulation order (XLA head conv vs in-kernel MXU dot).

    Exact survivor-count equality is the WRONG gate here: a candidate whose
    score sits within float noise of the serving threshold legitimately
    flips between the two paths (the kernel zeroes lane 4 in-kernel), and
    random-weight logits are tie-heavy. The gate:

    * every score mismatch must be a threshold STRADDLER — one side zeroed,
      the other within ``straddle_eps`` of ``prob_thresh``;
    * straddlers and class-lane flips are each bounded by a noise budget
      (max(8, 0.5% of kept)): accumulation-order noise produces a handful,
      while a systematic one-sided threshold shift or a broken in-kernel
      class argmax produces them in BULK — the bound keeps the power the
      old survivor-count gate had against systematic bugs without its
      tie false-alarms;
    * candidate-index lane exact wherever either side kept the candidate;
      class lane exact there too up to the flip budget (argmax near-ties
      legitimately flip between accumulation orders); boxes close wherever
      kept.

    Returns (ok, stats) with separate ``score_mism``/``straddlers``/
    ``class_flips``/``budget`` counts so a failure diagnostic never labels
    real divergence as threshold noise."""
    s0n = np.asarray(s0, np.float32)
    s1n = np.asarray(s1, np.float32)
    mism = ~np.isclose(s0n, s1n, atol=score_atol, rtol=1e-3)
    lo = np.minimum(s0n, s1n)
    hi = np.maximum(s0n, s1n)
    is_straddle = (mism & (lo == 0.0)
                   & (np.abs(hi - prob_thresh) < straddle_eps))
    n_mism = int(mism.sum())
    n_straddle = int(is_straddle.sum())
    kept = (s0n > 0) | (s1n > 0)
    budget = max(8, int(0.005 * int(kept.sum())))
    p0n, p1n = np.asarray(p0, np.float32), np.asarray(p1, np.float32)
    idx_ok = np.array_equal(p0n[..., 6][kept], p1n[..., 6][kept])
    boxes_ok = bool(np.allclose(p0n[..., :4][kept], p1n[..., :4][kept],
                                atol=box_atol, rtol=1e-4))
    # the kernel writes lanes 0-3/5/6 unconditionally (only lane 4 is
    # thresholded), so the class lane is comparable at every kept position;
    # straddler positions are excluded — they never survive selection
    class_flips = int(np.sum(p0n[..., 5][kept & ~is_straddle]
                             != p1n[..., 5][kept & ~is_straddle]))
    ok = (n_mism == n_straddle and n_straddle <= budget
          and class_flips <= budget and idx_ok and boxes_ok)
    return ok, {"score_mism": n_mism, "straddlers": n_straddle,
                "class_flips": class_flips, "budget": budget,
                "idx_ok": idx_ok, "boxes_ok": boxes_ok}


def check_packed_decode_variants():
    """Documented-negative packed-decode forms compiled on chip: the
    out_rows back-transposing form and the transpose-free noT kernel must
    stay bit-identical to the shipped transposing kernel (they are exported
    surface; bench_decode_kernel.py measures them, this gates them)."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.ops.pallas_decode import (decode_packed_head_pallas,
                                              decode_packed_head_pallas_noT)

    repo = Path(__file__).parent.parent
    g = load_graph(repo / "models" / "yolov3-tiny.cfg")
    an = g.yolo_nodes[0].anchors
    st = list(g.head_strides())[0]
    rng = np.random.default_rng(11)
    f = jnp.asarray(rng.normal(0, 2, (3, 13, 13, 255)), jnp.float32)
    p0, s0 = jax.jit(lambda x: decode_packed_head_pallas(
        x, an, st, 80, prob_thresh=0.25, head_offset=100))(f)
    p1, s1 = jax.jit(lambda x: decode_packed_head_pallas(
        x, an, st, 80, prob_thresh=0.25, head_offset=100, out_rows=True))(f)
    p2, s2 = jax.jit(lambda x: decode_packed_head_pallas_noT(
        x, an, st, 80, prob_thresh=0.25, head_offset=100))(f)
    ok = (np.array_equal(np.asarray(p0), np.asarray(p1))
          and np.array_equal(np.asarray(s0), np.asarray(s1))
          and np.array_equal(np.asarray(p0), np.asarray(p2))
          and np.array_equal(np.asarray(s0), np.asarray(s2)))
    print(f"packed decode variants compiled: out_rows + noT bit-identical: "
          f"{ok}")
    assert ok, "packed decode variant diverges on TPU"


def check_fused_head_decode():
    """Head-conv-fused packed decode on chip: candidate-level equivalence
    with the unfused packed path at fp32 `highest` (position-aligned,
    threshold-straddler-aware — see _packed_paths_close), then the fused
    output runs through NMS to prove the e2e serving program compiles."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.model import (forward_packed, forward_packed_fused,
                                  fused_heads_eligible)
    from yolov3_tpu.ops.nms import batched_nms_packed
    from yolov3_tpu.weights import fold_raw, random_raw

    repo = Path(__file__).parent.parent
    g = load_graph(repo / "models" / "yolov3-tiny.cfg")
    assert fused_heads_eligible(g)
    params = {k: {n: jnp.asarray(v) for n, v in p.items()}
              for k, p in fold_raw(random_raw(g, seed=3)).items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
    p0, s0 = jax.jit(lambda p, x: forward_packed(
        g, p, x, prob_thresh=0.3, precision="highest"))(params, x)
    p1, s1 = jax.jit(lambda p, x: forward_packed_fused(
        g, p, x, prob_thresh=0.3, precision="highest"))(params, x)
    ok, st = _packed_paths_close(p0, s0, p1, s1, prob_thresh=0.3,
                                 score_atol=1e-4)
    r1 = batched_nms_packed(p1, s1, iou_thresh=0.4)
    n1 = int(np.asarray(r1.valid).sum())
    print(f"fused-head decode compiled: candidates match: {ok} {st}, "
          f"NMS survivors {n1}")
    assert ok, f"fused-head decode diverges on TPU: {st}"

    # int8-carrier variant: same candidate-level bars on the PTQ path
    from yolov3_tpu.quant import (calibrate_tensors,
                                  forward_packed_fused_int8,
                                  forward_packed_int8, quantize_weights)

    scales = calibrate_tensors(g, params, [x], precision="bf16")
    qparams = quantize_weights(g, params)
    pq0, sq0 = jax.jit(lambda q, x: forward_packed_int8(
        g, q, scales, x, prob_thresh=0.3, precision="bf16",
        carrier="int8"))(qparams, x)
    pq1, sq1 = jax.jit(lambda q, x: forward_packed_fused_int8(
        g, q, scales, x, prob_thresh=0.3, precision="bf16",
        carrier="int8"))(qparams, x)
    # box atol is in PIXELS and the int8 carrier rides bf16 activations:
    # a ~100 px coordinate at bf16 relative eps (~4e-3) moves ~0.4 px
    # between the two accumulation orders — 0.75 px bounds that, while a
    # real decode bug (wrong stride/anchor/offset) moves boxes by whole
    # cells (>=8 px)
    ok, st = _packed_paths_close(pq0, sq0, pq1, sq1, prob_thresh=0.3,
                                 score_atol=1e-3, box_atol=0.75)
    print(f"int8 fused-head decode compiled: "
          f"{int((np.asarray(sq1) > 0).sum())} candidates, match: {ok} {st}")
    assert ok, f"int8 fused-head decode diverges on TPU: {st}"


def check_fused_block():
    """Fused int8 residual-block kernel (ops/pallas_block.py) compiled on
    chip vs the unfused int8-carrier walk. Quant-step contract (the kernel
    mimics every intermediate quantization; divergence is confined to
    requant ties flipped by accumulation/contraction differences —
    tests/test_pallas_block.py is the CPU-interpret twin). Runs yolov3@320
    so both channel configs exercise (cin=128/cmid=64 lane-padded at 80²,
    cin=256/cmid=128 at 40²)."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.ops.nms import batched_nms_packed
    from yolov3_tpu.ops.pallas_block import fused_block_plan
    from yolov3_tpu.quant import (calibrate_tensors,
                                  forward_features_int8_carrier,
                                  forward_packed_int8, quantize_weights)
    from yolov3_tpu.weights import fold_raw, random_raw

    repo = Path(__file__).parent.parent
    g = load_graph(repo / "models" / "yolov3.cfg")
    params = {k: {n: jnp.asarray(v) for n, v in p.items()}
              for k, p in fold_raw(random_raw(g, seed=5)).items()}
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (2, 320, 320, 3)).astype(np.float32))
    scales = calibrate_tensors(g, params, [x], precision="bf16")
    qparams = quantize_weights(g, params)
    plan = fused_block_plan(g, qparams, scales)
    assert plan, "no fusable blocks found in yolov3.cfg"

    # block-output contract at the end of the last fused block: mostly
    # exactly equal, nothing beyond a few quantization steps (a broken
    # kernel — wrong taps/masks/scales — diverges by orders of magnitude).
    # Both walks are CO-COMPILED in one program and the diff reduced
    # on-device. Measured 2026-08-19 (tools/probe_block.py::probe_chain):
    # co-compiled frac 0.00000 at every chain prefix k∈{1,2,3,5,10}, but
    # xla-program vs pallas-program compiled SEPARATELY reads frac 0.53
    # (max ~6 quant steps) while xla-vs-xla recompiled is exact — the
    # kernel's presence changes how XLA contracts the SURROUNDING ops
    # (shared prefix + epilogues), flipping requant ties that the
    # 10-block 3×3 chain then diffuses (CPU twin: interpret kernel vs
    # unfused walk grows 0 → 13.4% over k=1..10). The co-compiled diff is
    # the correct kernel gate — the Pallas call is opaque to XLA, so the
    # two paths cannot be CSE'd into each other — and the cross-program
    # tie noise is bounded separately by the candidate-level e2e bars
    # below.
    last = max(plan) + 3

    @jax.jit
    def _block_diff(q, xx):
        a = forward_features_int8_carrier(
            g, q, scales, xx, "bf16", upto=last, block_impl="xla")[-1]
        b = forward_features_int8_carrier(
            g, q, scales, xx, "bf16", upto=last, block_impl="pallas")[-1]
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        return jnp.mean((d > 0).astype(jnp.float32)), jnp.max(d)

    frac, dmax = (float(v) for v in _block_diff(qparams, x))
    s_out = scales[last - 1]
    ok = frac <= 0.05 and dmax <= 3 * s_out
    print(f"fused block compiled: {len(plan)} blocks planned, out diff "
          f"frac {frac:.5f}, max {dmax:.4g} "
          f"(step {s_out:.4g}), ok: {ok}")
    assert ok, "fused residual block diverges on TPU"

    # e2e serving program: packed decode + NMS with the fused blocks —
    # candidate-level bars vs the unfused walk (straddler-aware; same
    # machinery as the fused-head gate). CO-COMPILED like the block gate
    # above and for the same measured reason: compiled as two separate
    # programs this comparison reads score_mism 7347 / class_flips 1178 /
    # boxes>0.75px (2026-08-19) — the cross-program requant-tie flips in
    # the 10-block chain, amplified through the remaining 27 layers to the
    # candidates, with no Pallas bug involved (the fused-head gates above
    # stay separately compiled because their kernel difference enters at
    # the LAST layer, where tie noise has no amplifier behind it).
    @jax.jit
    def _both_packed(q, xx):
        return (forward_packed_int8(
            g, q, scales, xx, prob_thresh=0.3, precision="bf16",
            carrier="int8", block_impl="xla"),
            forward_packed_int8(
            g, q, scales, xx, prob_thresh=0.3, precision="bf16",
            carrier="int8", block_impl="pallas"))

    (pq0, sq0), (pq1, sq1) = _both_packed(qparams, x)
    ok, st = _packed_paths_close(pq0, sq0, pq1, sq1, prob_thresh=0.3,
                                 score_atol=1e-3, box_atol=0.75)
    r = batched_nms_packed(pq1, sq1, iou_thresh=0.4)
    print(f"fused-block packed path compiled: "
          f"{int((np.asarray(sq1) > 0).sum())} candidates, match: {ok} {st}, "
          f"NMS survivors {int(np.asarray(r.valid).sum())}")
    assert ok, f"fused-block packed path diverges on TPU: {st}"


def time_stage(fn, args, iters=5, label=""):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force completion via tiny scalar fetch (relay-safe sync)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms")
    return dt


def check_conv():
    from jax import lax

    from yolov3_tpu.ops.pallas_conv import conv3x3_fused, conv3x3_fused_roll

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 19, 19, 256)), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 256, 256)), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.1, (256,)), dtype=jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(jnp.where(ref + b > 0, ref + b, 0.1 * (ref + b)),
                     dtype=np.float32)
    scale = np.abs(ref).max() + 1e-6
    from yolov3_tpu.ops.pallas_conv import conv3x3_fused_roll2

    for name, fn in (("dma9", conv3x3_fused), ("roll", conv3x3_fused_roll),
                     ("roll2", conv3x3_fused_roll2)):
        out = np.asarray(jax.jit(fn)(x, w, b), dtype=np.float32)
        rel = np.abs(out - ref).max() / scale
        print(f"pallas conv[{name}] compiled: max rel {rel:.2e}")
        assert rel < 2e-2, f"pallas conv {name} diverges on TPU"


def check_asymmetric_int8():
    """Asymmetric (zero-point) activation scheme compiled on chip: the
    affine carrier must hold the SAME candidate-level bars vs the fp32
    `highest` packed path as the symmetric scheme does in the CPU gates
    (tests/test_quant.py::test_asymmetric_carrier_prenms_parity) — its
    only new on-chip ops are explicit q = z conv pads, the quantize-site
    adds, and the constant-folded z·Σwq epilogue terms
    (quant._conv_int8_core)."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.model import forward_packed
    from yolov3_tpu.quant import (calibrate_tensors,
                                  calibrate_tensors_affine,
                                  forward_packed_int8, quantize_weights)
    from yolov3_tpu.weights import fold_raw, random_raw

    repo = Path(__file__).parent.parent
    g = load_graph(repo / "models" / "yolov3-tiny.cfg")
    params = {k: {n: jnp.asarray(v) for n, v in p.items()}
              for k, p in fold_raw(random_raw(g, seed=3)).items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
    qparams = quantize_weights(g, params)
    p32, s32 = jax.jit(lambda p, x: forward_packed(
        g, p, x, prob_thresh=0.3, precision="highest"))(params, x)

    counts = {}
    for scheme in ("symmetric", "asymmetric"):
        if scheme == "asymmetric":
            scales, zeros = calibrate_tensors_affine(g, params, [x],
                                                     precision="bf16")
        else:
            scales = calibrate_tensors(g, params, [x], precision="bf16")
            zeros = None
        pq, sq = jax.jit(lambda q, x, s=scales, z=zeros: forward_packed_int8(
            g, q, s, x, prob_thresh=0.3, precision="bf16",
            carrier="int8", zeros=z))(qparams, x)
        # quantization bars, not bit-equality: the CPU parity gates bound
        # the top-200 score delta at 0.01 and boxes at 0.5 px; the packed
        # comparison is candidate-level with threshold-straddler handling
        ok, st = _packed_paths_close(p32, s32, pq, sq, prob_thresh=0.3,
                                     score_atol=0.02, box_atol=1.0)
        counts[scheme] = int((np.asarray(sq) > 0).sum())
        print(f"int8 {scheme} carrier compiled: {counts[scheme]} "
              f"candidates, fp32 bars: {ok} {st}")
        assert ok, f"int8 {scheme} carrier diverges on TPU: {st}"
    # both schemes see the same scene: candidate counts in the same regime
    assert 0.5 <= (counts["asymmetric"] + 1) / (counts["symmetric"] + 1) <= 2.0


def check_e2e_pipeline():
    """Tiny end-to-end smoke on the chip: uint8 frames → detections."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import fold_raw, random_raw

    import tempfile

    from yolov3_tpu.weights import write_weights
    from yolov3_tpu.graph import load_graph

    repo = Path(__file__).parent.parent
    g = load_graph(repo / "models" / "yolov3-tiny.cfg")
    with tempfile.NamedTemporaryFile(suffix=".weights") as f:
        write_weights(f.name, g, random_raw(g, seed=0))
        net = Darknet(repo / "models" / "yolov3-tiny.cfg",
                      precision="bf16").load_weights(f.name)
    det = Detector(net, prob_thresh=0.3)
    frames = np.random.default_rng(0).integers(
        0, 256, (2, 480, 640, 3), dtype=np.uint8)
    results = det.detect_batch(frames)
    print(f"e2e pipeline compiled: {len(results)} images, "
          f"{sum(len(r.bbox_tlbr) for r in results)} detections")


def main():
    print("devices:", jax.devices())
    check_decode()
    check_compact_decode()
    check_nms()
    check_pairmax_select()
    check_packed_decode()
    check_packed_decode_variants()
    check_fused_head_decode()
    check_fused_block()
    check_conv()
    check_asymmetric_int8()
    check_e2e_pipeline()
    print("OK")


if __name__ == "__main__":
    main()
