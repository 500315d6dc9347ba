"""int8 PTQ tests: weight-quant algebra, calibration, box parity vs fp32,
and Detector integration.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov3_tpu.graph import load_graph
from yolov3_tpu.model import forward_compact
from yolov3_tpu.ops.nms import batched_nms_compact
from yolov3_tpu.quant import (calibrate, eligible, forward_compact_int8,
                              forward_features_int8, quantize_weights)
from yolov3_tpu.weights import fold_raw, random_raw


@pytest.fixture(scope="module")
def setup(cfg_paths):
    g = load_graph(cfg_paths["yolov3-tiny"])
    params = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, seed=3)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
    return g, params, x


def test_eligibility(setup):
    g, _, _ = setup
    flags = {n.index: eligible(g, n) for n in g.conv_nodes}
    assert not flags[0]           # stem (Cin=3)
    assert not flags[15] and not flags[22]  # linear no-BN head convs
    assert flags[2] and flags[12]  # BN'd backbone convs


def test_weight_quant_roundtrip_error(setup):
    g, params, _ = setup
    q = quantize_weights(g, params)
    node = [n for n in g.conv_nodes if eligible(g, n)][0]
    qp = q[node.index]
    assert qp["wq"].dtype == jnp.int8
    w = np.asarray(params[node.index]["w"])
    deq = np.asarray(qp["wq"], np.float32) * np.asarray(qp["sw"])
    # symmetric per-channel: max error is half a step = sw/2
    err = np.abs(deq - w).max(axis=(0, 1, 2))
    assert (err <= np.asarray(qp["sw"]) * 0.5 + 1e-7).all()
    # head conv stays unquantized
    assert "w" in q[15] and "wq" not in q[15]


def test_calibration_scales_cover_activations(setup):
    g, params, x = setup
    scales = calibrate(g, params, [x], precision=None)
    assert set(scales) == {n.index for n in g.conv_nodes if eligible(g, n)}
    assert all(s > 0 for s in scales.values())
    # input to conv index 2 is in [0, ~large); scale*127 should bound it
    assert scales[2] * 127.0 > 0.1


def _iou(a, b):
    tl = np.maximum(a[:2], b[:2])
    br = np.minimum(a[2:], b[2:])
    wh = np.maximum(br - tl, 0)
    inter = wh[0] * wh[1]
    ua = (a[2] - a[0]) * (a[3] - a[1])
    ub = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(ua + ub - inter, 1e-9)


def test_int8_box_parity_with_fp32(setup):
    """int8 pipeline: ≥80% of confident fp32 detections matched at IoU>0.9."""
    g, params, x = setup
    scales = calibrate(g, params, [x], precision=None)
    q = quantize_weights(g, params)

    b32, s32, c32 = forward_compact(g, params, x)
    r32 = batched_nms_compact(b32, s32, c32, prob_thresh=0.3, top_k=64)
    bq, sq, cq = forward_compact_int8(g, q, scales, x, precision=None)
    rq = batched_nms_compact(bq, sq, cq, prob_thresh=0.3, top_k=64)

    matched, total = 0, 0
    for i in range(x.shape[0]):
        for j in np.where(np.asarray(r32.valid[i]))[0]:
            if float(r32.scores[i, j]) < 0.35:
                continue
            total += 1
            box = np.asarray(r32.boxes[i, j])
            cls = int(r32.classes[i, j])
            vq = np.where(np.asarray(rq.valid[i]))[0]
            best = max((_iou(box, np.asarray(rq.boxes[i, k]))
                        for k in vq if int(rq.classes[i, k]) == cls),
                       default=0.0)
            matched += best > 0.9
    assert total > 0
    # Set-level bound stays 0.8 on synthetic weights: random boxes overlap
    # heavily, so sub-pixel int8 box noise flips greedy-NMS suppression
    # cascades near the IoU boundary — a property of the synthetic data,
    # not the quantizer (fraction is flat in the score bar, and the sharp
    # pre-NMS gate below passes at 50x tighter tolerances).
    assert matched / total >= 0.8, f"int8 parity {matched}/{total}"


def test_int8_prenms_parity_with_fp32(setup):
    """Tightened quantizer gate (VERDICT.md round-1 weak #4): on the top-200
    fp32 candidates per image, the int8 pipeline must agree to |Δscore| ≤
    0.01, |Δbox| ≤ 0.5 px (at 416), and the identical class — pre-NMS, so
    suppression-cascade noise cannot mask quantizer regressions. Measured
    headroom: Δscore ≤ 0.005, Δbox ≤ 0.18 px, 0 class flips."""
    g, params, x = setup
    scales = calibrate(g, params, [x], precision=None)
    q = quantize_weights(g, params)

    b32, s32, c32 = forward_compact(g, params, x)
    bq, sq, cq = forward_compact_int8(g, q, scales, x, precision=None)
    s32n, sqn = np.asarray(s32), np.asarray(sq)
    b32n, bqn = np.asarray(b32), np.asarray(bq)
    c32n, cqn = np.asarray(c32), np.asarray(cq)
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - sqn[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - bqn[i][top]).max() <= 0.5
        assert (c32n[i][top] == cqn[i][top]).all()


def test_head_quantization_prenms_parity(setup):
    """quantize_heads=True (round-3): the no-BN head projections quantize
    too, under the SAME pre-NMS gates as the backbone-only scheme — the
    head carries the box-regression signal, so any extra rounding must stay
    under |Δscore| ≤ 0.01, |Δbox| ≤ 0.5 px, zero class flips on the top-200
    candidates."""
    g, params, x = setup
    scales = calibrate(g, params, [x], precision=None, include_heads=True)
    q = quantize_weights(g, params, include_heads=True)
    assert "wq" in q[15] and "wq" in q[22]  # tiny's two head convs

    b32, s32, c32 = forward_compact(g, params, x)
    bq, sq, cq = forward_compact_int8(g, q, scales, x, precision=None)
    s32n, sqn = np.asarray(s32), np.asarray(sq)
    b32n, bqn = np.asarray(b32), np.asarray(bq)
    c32n, cqn = np.asarray(c32), np.asarray(cq)
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - sqn[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - bqn[i][top]).max() <= 0.5
        assert (c32n[i][top] == cqn[i][top]).all()


def test_head_quantization_carrier_prenms_parity(setup):
    """quantize_heads with the int8 activation carrier (the serving
    configuration): per-tensor scales already cover every node, so only the
    qparams change; same pre-NMS gates."""
    from yolov3_tpu.quant import calibrate_tensors, forward_compact_int8

    g, params, x = setup
    scales = calibrate_tensors(g, params, [x], precision=None)
    q = quantize_weights(g, params, include_heads=True)

    b32, s32, c32 = forward_compact(g, params, x)
    bq, sq, cq = forward_compact_int8(g, q, scales, x, precision=None,
                                      carrier="int8")
    s32n, sqn = np.asarray(s32), np.asarray(sq)
    b32n, bqn = np.asarray(b32), np.asarray(bq)
    c32n, cqn = np.asarray(c32), np.asarray(cq)
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - sqn[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - bqn[i][top]).max() <= 0.5
        assert (c32n[i][top] == cqn[i][top]).all()


def test_stem_exact_u8_algebra(setup):
    """The exact-u8 stem scheme: for u8-origin inputs (x = u8/255, the
    serving case), ``_conv_stem_int8`` must equal the REAL-arithmetic conv
    with the dequantized weights — the input representation q = u8 − 128 is
    exact, the conv accumulates in int32 (exact), and the +128 zero-point
    fold is an identity, so the only rounding left is the f32 epilogue."""
    from jax import lax

    from yolov3_tpu.quant import _conv_stem_int8

    g, params, _ = setup
    node = g.conv_nodes[0]
    assert node.inputs[0] < 0
    q = quantize_weights(g, params, include_stem=True)
    qp = q[0]
    assert "wq" in qp

    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    x = jnp.asarray(u8, jnp.float32) / 255.0

    got = _conv_stem_int8(x, node, qp)
    # real-arithmetic reference: conv with the DEQUANTIZED weights and the
    # ORIGINAL (pre-fold) bias — the +128 zero-point fold in qp["b"] must
    # cancel the shifted representation exactly, leaving only f32 epilogue
    # rounding
    w_deq = qp["wq"].astype(jnp.float32) * qp["sw"]
    pad = node.size // 2
    want = lax.conv_general_dilated(
        x, w_deq, (node.stride, node.stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST) + jnp.asarray(params[0]["b"],
                                                       jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-5)


def test_stem_quantization_prenms_parity(setup):
    """include_stem (round 3): same pre-NMS gates as the backbone/head
    quantization — the stem adds only weight-rounding error (the input
    representation is exact for u8-origin pixels)."""
    g, params, x = setup
    scales = calibrate(g, params, [x], precision=None)
    q = quantize_weights(g, params, include_stem=True)
    assert "wq" in q[0]

    b32, s32, c32 = forward_compact(g, params, x)
    bq, sq, cq = forward_compact_int8(g, q, scales, x, precision=None)
    s32n, sqn = np.asarray(s32), np.asarray(sq)
    b32n, bqn = np.asarray(b32), np.asarray(bq)
    c32n, cqn = np.asarray(c32), np.asarray(cq)
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - sqn[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - bqn[i][top]).max() <= 0.5
        assert (c32n[i][top] == cqn[i][top]).all()


def test_stem_quantization_carrier_prenms_parity(setup):
    """include_stem + include_heads with the int8 activation carrier (the
    full serving fast-path configuration); same pre-NMS gates."""
    from yolov3_tpu.quant import calibrate_tensors, forward_compact_int8

    g, params, x = setup
    scales = calibrate_tensors(g, params, [x], precision=None)
    q = quantize_weights(g, params, include_heads=True, include_stem=True)
    assert "wq" in q[0]

    b32, s32, c32 = forward_compact(g, params, x)
    bq, sq, cq = forward_compact_int8(g, q, scales, x, precision=None,
                                      carrier="int8")
    s32n, sqn = np.asarray(s32), np.asarray(sq)
    b32n, bqn = np.asarray(b32), np.asarray(bq)
    c32n, cqn = np.asarray(c32), np.asarray(cq)
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - sqn[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - bqn[i][top]).max() <= 0.5
        assert (c32n[i][top] == cqn[i][top]).all()


def test_chain_targets_structure(cfg_paths):
    """yolov3's residual bottleneck 1x1s chain into their 3x3 consumers."""
    from yolov3_tpu.quant import chain_targets

    g = load_graph(cfg_paths["yolov3"])
    q = quantize_weights(g, jax.tree.map(
        jnp.asarray, __import__("yolov3_tpu.weights", fromlist=["fold_raw"])
        .fold_raw(random_raw(g, seed=1))))
    chains = chain_targets(g, q)
    # first residual block: conv2 (1x1 32) -> conv3 (3x3 64)
    assert chains.get(2) == 3
    # conv3 feeds the shortcut -> must NOT chain
    assert 3 not in chains
    # backbone has 23 residual blocks; every bottleneck 1x1 chains
    assert len(chains) >= 23


def test_chain_emission_matches_unchained(setup):
    """chain=True and chain=False agree to quantization-step tolerance."""
    g, params, x = setup
    scales = calibrate(g, params, [x], precision=None)
    q = quantize_weights(g, params)
    h_chain = forward_features_int8(g, q, scales, x, precision=None,
                                    chain=True)
    h_plain = forward_features_int8(g, q, scales, x, precision=None,
                                    chain=False)
    for a, b in zip(h_chain, h_plain):
        # only difference: chained activations skip a bf16 rounding
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.15, rtol=0.05)


def test_quantize_before_load_raises(cfg_paths):
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"])
    with pytest.raises(RuntimeError, match="load_weights"):
        net.quantize_int8(np.zeros((1, 64, 64, 3), np.uint8))


def test_detector_int8_integration(setup, cfg_paths, tmp_path):
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import random_raw, write_weights

    g, _, _ = setup
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=3))
    net = Darknet(cfg_paths["yolov3-tiny"], precision=None)
    net.load_weights(wpath)
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (8, 480, 640, 3), dtype=np.uint8)
    net.quantize_int8(calib, net_hw=(160, 160))
    assert net.quantized

    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    results = det.detect_batch(
        rng.integers(0, 256, (2, 480, 640, 3), dtype=np.uint8))
    assert len(results) == 2


def test_calibrate_tensors_matches_conv_input_scales(setup):
    """Per-tensor calibration is a superset of the per-conv-input view:
    a conv's input scale equals its input tensor's output scale."""
    from yolov3_tpu.quant import calibrate_tensors

    g, params, x = setup
    s_conv = calibrate(g, params, [x], precision=None)
    s_tens = calibrate_tensors(g, params, [x], precision=None)
    assert set(s_tens) == {n.index for n in g.nodes}
    for n in g.conv_nodes:
        if eligible(g, n) and n.inputs[0] >= 0:
            np.testing.assert_allclose(s_conv[n.index], s_tens[n.inputs[0]],
                                       rtol=1e-6)


def test_int8_carrier_prenms_parity_with_fp32(setup):
    """The int8 activation carrier (round 2) must hold the same pre-NMS
    gate as the bf16 carrier: top-200 fp32 candidates, |Δscore| ≤ 0.01,
    |Δbox| ≤ 0.5 px @416, identical class."""
    from yolov3_tpu.quant import calibrate_tensors

    g, params, x = setup
    s_tens = calibrate_tensors(g, params, [x], precision=None)
    q = quantize_weights(g, params)

    b32, s32, c32 = forward_compact(g, params, x)
    bq, sq, cq = forward_compact_int8(g, q, s_tens, x, precision=None,
                                      carrier="int8")
    s32n, sqn = np.asarray(s32), np.asarray(sq)
    b32n, bqn = np.asarray(b32), np.asarray(bq)
    c32n, cqn = np.asarray(c32), np.asarray(cq)
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - sqn[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - bqn[i][top]).max() <= 0.5
        assert (c32n[i][top] == cqn[i][top]).all()


def test_int8_carrier_box_parity_with_fp32(setup):
    """Set-level detection parity through NMS for the int8 carrier."""
    from yolov3_tpu.quant import calibrate_tensors

    g, params, x = setup
    s_tens = calibrate_tensors(g, params, [x], precision=None)
    q = quantize_weights(g, params)

    b32, s32, c32 = forward_compact(g, params, x)
    r32 = batched_nms_compact(b32, s32, c32, prob_thresh=0.3, top_k=64)
    bq, sq, cq = forward_compact_int8(g, q, s_tens, x, precision=None,
                                      carrier="int8")
    rq = batched_nms_compact(bq, sq, cq, prob_thresh=0.3, top_k=64)

    matched, total = 0, 0
    for i in range(x.shape[0]):
        for j in np.where(np.asarray(r32.valid[i]))[0]:
            if float(r32.scores[i, j]) < 0.35:
                continue
            total += 1
            box = np.asarray(r32.boxes[i, j])
            cls = int(r32.classes[i, j])
            vq = np.where(np.asarray(rq.valid[i]))[0]
            best = max((_iou(box, np.asarray(rq.boxes[i, k]))
                        for k in vq if int(rq.classes[i, k]) == cls),
                       default=0.0)
            matched += best > 0.9
    assert total > 0
    assert matched / total >= 0.8, f"int8 carrier parity {matched}/{total}"


def test_int8_carrier_fused_head_decode_matches_packed(setup):
    """Head-conv-fused packed decode on the int8 CARRIER path ≈ the unfused
    int8 packed path: identical candidate order, float-tolerance scores and
    boxes (the only numeric difference is the head projection accumulating
    in-kernel in f32 instead of via the XLA conv)."""
    from yolov3_tpu.model import fused_heads_eligible
    from yolov3_tpu.quant import (calibrate_tensors, forward_packed_int8,
                                  forward_packed_fused_int8)

    g, params, x = setup
    assert fused_heads_eligible(g)
    s_tens = calibrate_tensors(g, params, [x], precision=None)
    q = quantize_weights(g, params)

    p0, s0 = forward_packed_int8(g, q, s_tens, x, prob_thresh=0.2,
                                 precision=None, carrier="int8")
    p1, s1 = forward_packed_fused_int8(g, q, s_tens, x, prob_thresh=0.2,
                                       precision=None, carrier="int8")
    assert p0.shape == p1.shape and s0.shape == s1.shape
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               atol=1e-5, rtol=1e-4)
    m = (np.asarray(s0) > 0) & (np.asarray(s1) > 0)
    np.testing.assert_allclose(np.asarray(p0)[m], np.asarray(p1)[m],
                               atol=5e-3, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(p0)[..., 6],
                                  np.asarray(p1)[..., 6])
    # bf16 carrier falls back to the unfused form (identical results)
    pb0, sb0 = forward_packed_int8(g, q, s_tens, x, prob_thresh=0.2,
                                   precision=None, carrier="bf16")
    pb1, sb1 = forward_packed_fused_int8(g, q, s_tens, x, prob_thresh=0.2,
                                         precision=None, carrier="bf16")
    np.testing.assert_array_equal(np.asarray(pb0), np.asarray(pb1))
    np.testing.assert_array_equal(np.asarray(sb0), np.asarray(sb1))


def test_int8_carrier_fused_head_decode_quantized_heads(setup):
    """--int8-heads + fused decode: the per-channel weight scale folds back
    into the projection at trace time; same candidate order and tolerance
    bars vs the unfused quantized-head path."""
    from yolov3_tpu.model import fused_heads_eligible
    from yolov3_tpu.quant import (calibrate_tensors, forward_packed_int8,
                                  forward_packed_fused_int8)

    g, params, x = setup
    assert fused_heads_eligible(g)
    s_tens = calibrate_tensors(g, params, [x], precision=None)
    q = quantize_weights(g, params, include_heads=True)

    p0, s0 = forward_packed_int8(g, q, s_tens, x, prob_thresh=0.2,
                                 precision=None, carrier="int8")
    p1, s1 = forward_packed_fused_int8(g, q, s_tens, x, prob_thresh=0.2,
                                       precision=None, carrier="int8")
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               atol=1e-3, rtol=1e-3)
    m = (np.asarray(s0) > 0) & (np.asarray(s1) > 0)
    np.testing.assert_allclose(np.asarray(p0)[m], np.asarray(p1)[m],
                               atol=5e-2, rtol=1e-3)


def test_detector_int8_fused_decode_same_detections(setup, cfg_paths,
                                                    tmp_path, caplog):
    """Detector(decode_impl='pallas-fused') on a quantized int8-carrier net:
    engages the fused path (no fallback warning) and matches
    decode_impl='pallas' at the set level. Exact record-level numerics are
    pinned by test_int8_carrier_fused_head_decode_matches_packed; this is
    the wiring gate."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import random_raw, write_weights

    g, _, _ = setup
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=3))
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (8, 480, 640, 3), dtype=np.uint8)
    frames = rng.integers(0, 256, (2, 480, 640, 3), dtype=np.uint8)

    nets = []
    for _ in range(2):
        net = Darknet(cfg_paths["yolov3-tiny"], precision=None)
        net.load_weights(wpath)
        net.quantize_int8(calib, net_hw=(160, 160))
        assert getattr(net, "qcarrier", None) == "int8"
        nets.append(net)

    det_p = Detector(nets[0], prob_thresh=0.3, net_hw=(160, 160),
                     decode_impl="pallas")
    det_f = Detector(nets[1], prob_thresh=0.3, net_hw=(160, 160),
                     decode_impl="pallas-fused")
    rp = det_p.detect_batch(frames)
    import logging
    with caplog.at_level(logging.WARNING, logger="yolov3_tpu"):
        rf = det_f.detect_batch(frames)
    assert not any("falling back" in r.message for r in caplog.records), \
        "int8-carrier net must take the fused path, not fall back"
    # random-weight quantized logits are full of exact class TIES; the
    # fused projection's different accumulation order can break a tie the
    # other way, which legitimately changes the class-aware NMS conflict
    # sets. So the gate is SET-level (like the fp32-vs-int8 parity test):
    # nearly every detection of one path must have an IoU>0.9 same-ish-score
    # counterpart in the other. Systematic divergence (wrong projection,
    # wrong candidate order) collapses the match rate.
    matched, total = 0, 0
    for a, b in zip(rp, rf):
        assert abs(len(a.class_prob) - len(b.class_prob)) <= 2
        for j in range(len(a.class_prob)):
            total += 1
            box, sc = a.bbox_tlbr[j], a.class_prob[j]
            best = max((_iou(box, b.bbox_tlbr[k])
                        for k in range(len(b.class_prob))
                        if abs(b.class_prob[k] - sc) < 1e-2), default=0.0)
            matched += best > 0.9
    assert total > 0
    # same bar as the fp32-vs-int8 set parity above: random-weight NMS is
    # chaotic under class tie-flips (one flip rewrites a conflict set)
    assert matched / total >= 0.75, f"fused parity {matched}/{total}"


def test_load_calibration_dir(tmp_path):
    """The ONE calibration-image loader behind both CLIs' --quantize-int8:
    filter-then-cap (non-image files must not crowd out images), BGR->RGB,
    native sizes preserved, one-line SystemExit when nothing is readable."""
    import cv2

    from yolov3_tpu.quant import load_calibration_dir

    rng = np.random.default_rng(7)
    # leading non-image clutter (sorts first), a subdirectory, 3 images of
    # distinct sizes
    (tmp_path / "0_README.txt").write_text("not an image")
    (tmp_path / "0_labels").mkdir()
    imgs_bgr = []
    for i, hw in enumerate([(32, 48), (40, 40), (24, 64)]):
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / f"img_{i}.png"), img)
        imgs_bgr.append(img)

    # cap counts readable images only (filter-then-cap): the text file and
    # the directory must not consume cap slots
    calib = load_calibration_dir(tmp_path, cap=2)
    assert len(calib) == 2
    # sorted order, BGR->RGB conversion, native sizes preserved
    for got, bgr in zip(calib, imgs_bgr):
        np.testing.assert_array_equal(got, bgr[..., ::-1])

    calib = load_calibration_dir(tmp_path, cap=32)
    assert len(calib) == 3

    # a directory with no readable images is user error: one-line exit
    empty = tmp_path / "noimgs"
    empty.mkdir()
    (empty / "README.txt").write_text("x")
    with pytest.raises(SystemExit, match="no readable calibration"):
        load_calibration_dir(empty)


def test_percentile_calibration_scales_bounded_by_absmax(setup):
    """Percentile scales never exceed absmax scales (|t|'s q-th percentile
    <= its max), and q=100 reproduces absmax exactly."""
    from yolov3_tpu.quant import calibrate_tensors

    g, params, x = setup
    s_max = calibrate_tensors(g, params, [x], precision=None)
    s_p = calibrate_tensors(g, params, [x], precision=None,
                            method="percentile", percentile=99.0)
    s_p100 = calibrate_tensors(g, params, [x], precision=None,
                               method="percentile", percentile=100.0)
    assert set(s_p) == set(s_max)
    tol = 1e-6
    assert all(s_p[i] <= s_max[i] + tol for i in s_max)
    # a large activation tensor at q=99 must actually truncate the tail
    assert any(s_p[i] < s_max[i] * 0.999 for i in s_max)
    for i in s_max:
        np.testing.assert_allclose(s_p100[i], s_max[i], rtol=1e-5)

    s_conv_max = calibrate(g, params, [x], precision=None)
    s_conv_p = calibrate(g, params, [x], precision=None,
                         method="percentile", percentile=99.0)
    assert set(s_conv_p) == set(s_conv_max)
    assert all(s_conv_p[i] <= s_conv_max[i] + tol for i in s_conv_max)


def test_percentile_calibration_carrier_parity(setup):
    """The int8 carrier under percentile-99.9 calibration holds the same
    pre-NMS gate as absmax (the clipped tail is rarer than the gate's
    top-200 candidates care about on this distribution)."""
    from yolov3_tpu.quant import calibrate_tensors

    g, params, x = setup
    s_tens = calibrate_tensors(g, params, [x], precision=None,
                               method="percentile", percentile=99.9)
    q = quantize_weights(g, params)

    b32, s32, c32 = forward_compact(g, params, x)
    bq, sq, cq = forward_compact_int8(g, q, s_tens, x, precision=None,
                                      carrier="int8")
    s32n, sqn = np.asarray(s32), np.asarray(sq)
    b32n, bqn = np.asarray(b32), np.asarray(bq)
    c32n, cqn = np.asarray(c32), np.asarray(cq)
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - sqn[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - bqn[i][top]).max() <= 0.5
        assert (c32n[i][top] == cqn[i][top]).all()


def test_calibration_method_validation(setup):
    from yolov3_tpu.quant import calibrate_tensors

    g, params, x = setup
    with pytest.raises(ValueError, match="unknown calibration method"):
        calibrate_tensors(g, params, [x], precision=None, method="entropy")
    with pytest.raises(ValueError, match="percentile must be"):
        calibrate_tensors(g, params, [x], precision=None,
                          method="percentile", percentile=0.0)


def test_quantize_int8_calib_method_plumbing(setup, cfg_paths, tmp_path):
    """Darknet.quantize_int8(calib_method=...) reaches the calibrators:
    percentile scales come out <= the absmax ones on the same frames."""
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import random_raw, write_weights

    g, _, _ = setup
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=3))
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (4, 240, 320, 3), dtype=np.uint8)

    nets = {}
    for method in ("absmax", "percentile"):
        net = Darknet(cfg_paths["yolov3-tiny"], precision=None)
        net.load_weights(wpath)
        net.quantize_int8(calib, net_hw=(160, 160), calib_method=method,
                          calib_percentile=99.0)
        nets[method] = net
    s_max, s_p = nets["absmax"].act_scales, nets["percentile"].act_scales
    assert set(s_p) == set(s_max)
    assert all(s_p[i] <= s_max[i] + 1e-6 for i in s_max)
    assert any(s_p[i] < s_max[i] * 0.999 for i in s_max)

def test_bias_correct_structure(setup):
    """bias_correct is a pure qparams rewrite: new dict, only the biases of
    QUANTIZED convs change, quantized weights/scales are shared untouched."""
    from yolov3_tpu.quant import bias_correct, calibrate_tensors

    g, params, x = setup
    scales = calibrate_tensors(g, params, [x], precision=None)
    q = quantize_weights(g, params)
    qc = bias_correct(g, params, q, scales, [x], carrier="int8",
                      precision=None)
    assert qc is not q
    for i, qp in q.items():
        if "wq" in qp:
            assert qc[i]["wq"] is qp["wq"] and qc[i]["sw"] is qp["sw"]
            assert not np.allclose(np.asarray(qc[i]["b"]),
                                   np.asarray(qp["b"]))
        else:  # unquantized convs pass through by identity
            assert qc[i] is qp


@pytest.mark.parametrize("method,pct", [("absmax", 99.9),
                                        ("percentile", 99.0)])
def test_bias_correct_channel_mean_exactness(setup, method, pct):
    """Defining property (DFQ §4): after correction, the int8 conv's
    per-channel pre-activation MEAN matches fp32's on the calibration set —
    up to the spatially-constant-mean approximation (edge taps), measured
    ≤1% of the uncorrected shift at 416² (ratio ~0.006 both methods)."""
    from jax import lax

    from yolov3_tpu.quant import (_calibration_walk, bias_correct,
                                  calibrate_tensors)

    g, params, x = setup
    scales = calibrate_tensors(g, params, [x], precision=None,
                               method=method, percentile=pct)
    q = quantize_weights(g, params)
    qc = bias_correct(g, params, q, scales, [x], carrier="int8",
                      precision=None)

    store = {}
    _calibration_walk(g, params, x, None,
                      lambda node, inp, out:
                      store.__setitem__("x", inp) if node.index == 2
                      else None)
    x2 = store["x"].astype(jnp.float32)
    node = g.nodes[2]
    pad = node.size // 2
    dn = ("NHWC", "HWIO", "NHWC")
    y32 = lax.conv_general_dilated(
        x2, params[2]["w"].astype(jnp.float32), (1, 1),
        [(pad, pad), (pad, pad)], dimension_numbers=dn) \
        + params[2]["b"].astype(jnp.float32)
    s = scales[node.inputs[0]]
    xq = jnp.clip(jnp.round(x2 / s), -127, 127) * s
    yq = lax.conv_general_dilated(
        xq, q[2]["wq"].astype(jnp.float32) * q[2]["sw"], (1, 1),
        [(pad, pad), (pad, pad)], dimension_numbers=dn)
    m32 = np.asarray(y32.mean(axis=(0, 1, 2)), np.float64)
    mq = np.asarray(yq.mean(axis=(0, 1, 2)), np.float64)
    err_un = np.abs(mq + np.asarray(q[2]["b"]) - m32).mean()
    err_co = np.abs(mq + np.asarray(qc[2]["b"]) - m32).mean()
    assert err_co < 0.05 * err_un, (err_co, err_un)


def test_bias_correct_carrier_prenms_parity(setup):
    """Default-on regression guard: the corrected int8 carrier pipeline
    holds the same pre-NMS bars vs fp32 as the uncorrected one
    (tests above) — correction must never WORSEN absmax parity."""
    from yolov3_tpu.model import forward_compact
    from yolov3_tpu.quant import bias_correct, calibrate_tensors

    g, params, x = setup
    scales = calibrate_tensors(g, params, [x], precision=None)
    q = bias_correct(g, params, quantize_weights(g, params), scales, [x],
                     carrier="int8", precision=None)
    b32, s32, c32 = forward_compact(g, params, x)
    bq, sq, cq = forward_compact_int8(g, q, scales, x, precision=None,
                                      carrier="int8")
    s32n, sqn = np.asarray(s32), np.asarray(sq)
    b32n, bqn = np.asarray(b32), np.asarray(bq)
    c32n, cqn = np.asarray(c32), np.asarray(cq)
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - sqn[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - bqn[i][top]).max() <= 0.5
        assert (c32n[i][top] == cqn[i][top]).all()


def test_quantize_int8_bias_correct_plumbing(setup, cfg_paths, tmp_path):
    """Darknet.quantize_int8 applies bias correction BY DEFAULT;
    bias_correct=False opts out (different biases, same wq)."""
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import random_raw, write_weights

    g, _, _ = setup
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=3))
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (4, 240, 320, 3), dtype=np.uint8)

    nets = {}
    for bc in (True, False):
        net = Darknet(cfg_paths["yolov3-tiny"], precision=None)
        net.load_weights(wpath)
        net.quantize_int8(calib, net_hw=(160, 160), bias_correct=bc)
        nets[bc] = net
    i = next(i for i, qp in nets[True].qparams.items() if "wq" in qp)
    assert np.array_equal(np.asarray(nets[True].qparams[i]["wq"]),
                          np.asarray(nets[False].qparams[i]["wq"]))
    assert not np.allclose(np.asarray(nets[True].qparams[i]["b"]),
                           np.asarray(nets[False].qparams[i]["b"]))

def test_quant_state_save_load_roundtrip(setup, cfg_paths, tmp_path):
    """save_quantized/load_quantized: a restart reconstructs the EXACT
    quantization state (qparams arrays, activation scales, carrier) without
    recalibrating; wrong-architecture state files fail loudly."""
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import random_raw, write_weights

    g, _, _ = setup
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=3))
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (4, 240, 320, 3), dtype=np.uint8)

    src = Darknet(cfg_paths["yolov3-tiny"], precision=None)
    src.load_weights(wpath)
    with pytest.raises(RuntimeError, match="quantize_int8"):
        src.save_quantized(tmp_path / "q.npz")
    src.quantize_int8(calib, net_hw=(160, 160))
    src.save_quantized(tmp_path / "q.npz")

    dst = Darknet(cfg_paths["yolov3-tiny"], precision=None)
    dst.load_weights(wpath)
    dst.load_quantized(tmp_path / "q.npz")
    assert dst.quantized and dst.qcarrier == src.qcarrier
    assert dst.act_scales == src.act_scales
    assert set(dst.qparams) == set(src.qparams)
    for i, qp in src.qparams.items():
        assert set(dst.qparams[i]) == set(qp)
        for name, a in qp.items():
            got = dst.qparams[i][name]
            assert got.dtype == a.dtype
            assert np.array_equal(np.asarray(got), np.asarray(a))

    other = Darknet(cfg_paths["yolov3"], precision=None)
    with pytest.raises(ValueError, match="saved for graph"):
        other.load_quantized(tmp_path / "q.npz")

    # bf16 nets (the serving default): unquantized-conv params are
    # bfloat16, which npz stores as opaque void unless bit-tagged — the
    # roundtrip must restore the exact dtype AND bits (caught live on the
    # serve --quant-state restart path, 2026-08-21)
    src16 = Darknet(cfg_paths["yolov3-tiny"], precision="bf16")
    src16.load_weights(wpath)
    src16.quantize_int8(calib, net_hw=(160, 160))
    src16.save_quantized(tmp_path / "q16.npz")
    dst16 = Darknet(cfg_paths["yolov3-tiny"], precision="bf16")
    dst16.load_weights(wpath)
    dst16.load_quantized(tmp_path / "q16.npz")
    for i, qp in src16.qparams.items():
        for name, a in qp.items():
            got = dst16.qparams[i][name]
            assert got.dtype == a.dtype
            assert np.array_equal(np.asarray(got, np.float32),
                                  np.asarray(a, np.float32))

def test_affine_calibration_properties(setup):
    """calibrate_tensors_affine: ranges cover every node, zero is exactly
    representable (q = z dequantizes to exactly 0.0), and one-sided leaky
    outputs get strongly negative zero-points (the scheme's whole point)."""
    from yolov3_tpu.quant import (_dequantize_affine, calibrate_tensors,
                                  calibrate_tensors_affine)

    g, params, x = setup
    scales, zeros = calibrate_tensors_affine(g, params, [x], precision=None)
    ssym = calibrate_tensors(g, params, [x], precision=None)
    assert set(scales) == set(zeros) == set(ssym)
    for i in scales:
        assert scales[i] > 0 and -127 <= zeros[i] <= 127
        z = jnp.asarray(zeros[i], jnp.int8)
        assert float(_dequantize_affine(z, scales[i], zeros[i])) == 0.0
        # affine range never needs a coarser step than symmetric's 2·max/254
        assert scales[i] <= ssym[i] * (254.0 / 254.0) + 1e-12
    # leaky outputs are one-sided → most zero-points are far from 0
    assert sum(1 for z in zeros.values() if z < -64) > len(zeros) // 2


@pytest.mark.parametrize("cfg_name,pick", [
    ("yolov3-tiny", "s1"),   # 3×3 stride-1: all four border strips + corners
    ("yolov3", "s2"),        # 3×3 stride-2 downsample: top/left deficits only
])
def test_asymmetric_conv_core_algebra(setup, cfg_paths, cfg_name, pick):
    """_conv_int8_core's zero-point fold: conv on the affine carrier must
    equal the real-arithmetic conv of the DEQUANTIZED input with the
    dequantized weights — the z·Σwq epilogue constant and the border-ring
    strip repair (_zp_border_repair) are an identity, not an
    approximation, at both darknet conv geometries (stride 1 and the
    stride-2 downsamples)."""
    from jax import lax

    from yolov3_tpu.quant import (_conv_int8_core, _dequantize_affine,
                                  _quantize_affine)

    g = load_graph(cfg_paths[cfg_name])
    params = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, seed=3)))
    want_stride = 1 if pick == "s1" else 2
    node = [n for n in g.conv_nodes
            if eligible(g, n) and n.size == 3 and n.stride == want_stride][0]
    q = quantize_weights(g, params)
    qp = q[node.index]
    rng = np.random.default_rng(5)
    c_in = g.nodes[node.inputs[0]].out_channels
    xf = jnp.asarray(rng.uniform(-0.2, 2.0, (2, 16, 16, c_in))
                     .astype(np.float32))
    s, z = 2.2 / 254.0, -104
    xq = _quantize_affine(xf, s, z)

    got = _conv_int8_core(xq, node, qp, s, prequantized=True, zx=z)
    w_dq = qp["wq"].astype(jnp.float32) * qp["sw"]
    pad = node.size // 2
    want = lax.conv_general_dilated(
        _dequantize_affine(xq, s, z), w_dq, (node.stride, node.stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + qp["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_asymmetric_carrier_prenms_parity(setup):
    """act_scheme='asymmetric': same pre-NMS gates as the symmetric
    carrier, and the mean top-200 score error must not exceed the
    symmetric scheme's (the measured gain is ~25-30% — BASELINE.md
    round-5)."""
    from yolov3_tpu.quant import (calibrate_tensors,
                                  calibrate_tensors_affine)

    g, params, x = setup
    q = quantize_weights(g, params)
    b32, s32, c32 = forward_compact(g, params, x)
    s32n = np.asarray(s32)

    ssym = calibrate_tensors(g, params, [x], precision=None)
    saff, zaff = calibrate_tensors_affine(g, params, [x], precision=None)
    _, s_sym, _ = forward_compact_int8(g, q, ssym, x, precision=None,
                                       carrier="int8")
    ba, s_asym, ca = forward_compact_int8(g, q, saff, x, precision=None,
                                          carrier="int8", zeros=zaff)
    b32n, ban = np.asarray(b32), np.asarray(ba)
    c32n, can = np.asarray(c32), np.asarray(ca)
    err_sym, err_asym = [], []
    for i in range(x.shape[0]):
        top = np.argsort(s32n[i])[::-1][:200]
        assert np.abs(s32n[i][top] - np.asarray(s_asym)[i][top]).max() <= 0.01
        assert np.abs(b32n[i][top] - ban[i][top]).max() <= 0.5
        assert (c32n[i][top] == can[i][top]).all()
        err_sym.append(np.abs(s32n[i][top]
                              - np.asarray(s_sym)[i][top]).mean())
        err_asym.append(np.abs(s32n[i][top]
                               - np.asarray(s_asym)[i][top]).mean())
    assert np.mean(err_asym) <= np.mean(err_sym)


def test_quantize_int8_act_scheme_plumbing(setup, cfg_paths, tmp_path):
    """Darknet.quantize_int8(act_scheme=...): asymmetric populates
    act_zeros and roundtrips through the quant-state cache; invalid
    scheme and bf16-carrier combinations fail loudly."""
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import random_raw, write_weights

    g, _, _ = setup
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=3))
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (4, 240, 320, 3), dtype=np.uint8)

    net = Darknet(cfg_paths["yolov3-tiny"], precision=None)
    net.load_weights(wpath)
    with pytest.raises(ValueError, match="act_scheme"):
        net.quantize_int8(calib, net_hw=(160, 160), act_scheme="bogus")
    with pytest.raises(ValueError, match="int8 .*carrier|carrier"):
        net.quantize_int8(calib, net_hw=(160, 160), carrier="bf16",
                          act_scheme="asymmetric")
    net.quantize_int8(calib, net_hw=(160, 160), act_scheme="asymmetric")
    assert net.act_zeros and any(z != 0 for z in net.act_zeros.values())

    net.save_quantized(tmp_path / "q.npz")
    dst = Darknet(cfg_paths["yolov3-tiny"], precision=None)
    dst.load_weights(wpath)
    dst.load_quantized(tmp_path / "q.npz")
    assert dst.act_zeros == net.act_zeros
    assert dst.act_scales == net.act_scales

    # symmetric state files load with act_zeros = None
    net.quantize_int8(calib, net_hw=(160, 160))
    assert net.act_zeros is None
    net.save_quantized(tmp_path / "q2.npz")
    dst.load_quantized(tmp_path / "q2.npz")
    assert dst.act_zeros is None


def test_detector_asymmetric_integration(setup, cfg_paths, tmp_path):
    """End-to-end Detector over an asymmetric-quantized net: the pipeline
    closes over act_zeros (inference.py plumbing) and produces detections
    matching the direct forward's survivor set."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import random_raw, write_weights

    g, _, _ = setup
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=3))
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 256, (4, 160, 160, 3), dtype=np.uint8)

    nets = {}
    for scheme in ("symmetric", "asymmetric"):
        net = Darknet(cfg_paths["yolov3-tiny"], precision=None)
        net.load_weights(wpath)
        net.quantize_int8(calib, net_hw=(160, 160), act_scheme=scheme,
                          bias_correct=False)
        nets[scheme] = net
    frames = rng.integers(0, 256, (2, 160, 160, 3), dtype=np.uint8)
    det_a = Detector(nets["asymmetric"], prob_thresh=0.3, net_hw=(160, 160))
    det_s = Detector(nets["symmetric"], prob_thresh=0.3, net_hw=(160, 160))
    res_a = det_a.detect_batch(frames)
    res_s = det_s.detect_batch(frames)
    assert len(res_a) == 2
    # the schemes must actually differ (zeros reached the pipeline) while
    # agreeing on the rough survivor count on identical inputs
    total_a = sum(len(r.bbox_tlbr) for r in res_a)
    total_s = sum(len(r.bbox_tlbr) for r in res_s)
    assert total_a > 0
    scores_a = np.concatenate([r.class_prob for r in res_a])
    scores_s = np.concatenate([r.class_prob for r in res_s])
    assert (scores_a.shape != scores_s.shape
            or not np.allclose(scores_a, scores_s))
    assert 0.5 <= (total_a + 1) / (total_s + 1) <= 2.0
