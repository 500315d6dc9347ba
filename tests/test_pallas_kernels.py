"""Pallas kernels vs jnp references (SURVEY.md §4.3) — interpret mode on CPU;
compiled TPU execution is exercised by bench.py / tools/tpu_check.py.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

MODELS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "models")

from yolov3_tpu.ops.decode import decode_head
from yolov3_tpu.ops.nms import batched_nms
from yolov3_tpu.ops.pallas_decode import decode_head_pallas

ANCHORS = ((10.0, 13.0), (33.0, 23.0), (116.0, 90.0))


@pytest.mark.parametrize("b,g,stride", [(1, 13, 32), (2, 26, 16), (1, 19, 32)])
def test_pallas_decode_matches_jnp(rng, b, g, stride):
    feat = jnp.asarray(rng.normal(0, 1, (b, g, g, 3 * 85)).astype(np.float32))
    ref = decode_head(feat, ANCHORS, stride, 80)
    out = decode_head_pallas(feat, ANCHORS, stride, 80, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_decode_nonsquare_grid(rng):
    feat = jnp.asarray(rng.normal(0, 1, (1, 10, 20, 3 * 85)).astype(np.float32))
    ref = decode_head(feat, ANCHORS, 32, 80)
    out = decode_head_pallas(feat, ANCHORS, 32, 80, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_decode_small_classes(rng):
    anchors = ((10.0, 14.0), (23.0, 27.0))
    feat = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 2 * 6)).astype(np.float32))
    ref = decode_head(feat, anchors, 16, 1)
    out = decode_head_pallas(feat, anchors, 16, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_decode_exp_clamp(rng):
    """Large tw/th hit the same clamp as the jnp reference."""
    feat = np.zeros((1, 4, 4, 3 * 85), dtype=np.float32)
    feat[..., 2] = 100.0  # tw far past the clamp
    ref = decode_head(jnp.asarray(feat), ANCHORS, 32, 80)
    out = decode_head_pallas(jnp.asarray(feat), ANCHORS, 32, 80, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


@pytest.mark.parametrize("shape", [
    (2, 8, 10, 128, 256),   # non-8-multiple W
    (1, 19, 19, 256, 128),  # odd grid (608-stride-32 head size)
    (1, 13, 13, 128, 384),  # c_out needing a non-256 tile
])
def test_pallas_conv_matches_xla(rng, shape):
    from jax import lax

    from yolov3_tpu.ops.pallas_conv import conv3x3_fused

    b_, h, w_dim, ci, co = shape
    x = jnp.asarray(rng.normal(0, 1, (b_, h, w_dim, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, ci, co)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST) + bias
    ref = jnp.where(ref > 0, ref, 0.1 * ref)
    out = conv3x3_fused(x, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("shape", [
    (2, 8, 10, 128, 256),
    (1, 19, 19, 256, 128),
])
def test_pallas_conv_roll_variant_matches_xla(rng, shape):
    from jax import lax

    from yolov3_tpu.ops.pallas_conv import conv3x3_fused_roll

    b_, h, w_dim, ci, co = shape
    x = jnp.asarray(rng.normal(0, 1, (b_, h, w_dim, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, ci, co)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST) + bias
    ref = jnp.where(ref > 0, ref, 0.1 * ref)
    out = conv3x3_fused_roll(x, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("shape", [
    (2, 8, 10, 128, 256),
    (1, 19, 19, 256, 128),
    (1, 38, 38, 128, 64),   # divisor row tile (th=38 path) + tc=64
])
def test_pallas_conv_roll2_variant_matches_xla(rng, shape):
    """Interpret-mode coverage for the PRODUCTION conv_impl='pallas' kernel
    (round-2 review: roll2 had on-chip validation but no CPU test, so its
    DMA double-buffering/tap-cache logic never ran in the suite)."""
    from jax import lax

    from yolov3_tpu.ops.pallas_conv import conv3x3_fused_roll2

    b_, h, w_dim, ci, co = shape
    x = jnp.asarray(rng.normal(0, 1, (b_, h, w_dim, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, ci, co)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST) + bias
    ref = jnp.where(ref > 0, ref, 0.1 * ref)
    out = conv3x3_fused_roll2(x, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_pallas_conv_linear_activation(rng):
    from jax import lax

    from yolov3_tpu.ops.pallas_conv import conv3x3_fused

    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 128, 128)).astype(np.float32))
    bias = jnp.zeros((128,), jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    out = conv3x3_fused(x, w, bias, activation="linear", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_pallas_conv_eligibility_gate():
    from yolov3_tpu.ops.pallas_conv import supported

    assert supported(3, 1, 256, "leaky")
    assert not supported(1, 1, 256, "leaky")   # 1x1
    assert not supported(3, 2, 256, "leaky")   # stride 2
    assert not supported(3, 1, 3, "leaky")     # stem (Cin=3)
    assert not supported(3, 1, 32, "leaky")    # Cin not 128-mult
    assert not supported(3, 1, 256, "mish")


def _rand_det(rng, n=300, classes=8):
    cx = rng.uniform(0, 416, (n, 1))
    cy = rng.uniform(0, 416, (n, 1))
    wh = rng.uniform(8, 120, (n, 2))
    obj = rng.uniform(0, 1, (n, 1))
    cls = rng.uniform(0, 1, (n, classes))
    return np.concatenate([cx, cy, wh, obj, cls], 1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_nms_matches_xla(seed):
    rng = np.random.default_rng(seed)
    det = jnp.asarray(np.stack([_rand_det(rng), _rand_det(rng)]))
    ref = batched_nms(det, prob_thresh=0.2, iou_thresh=0.4, top_k=64,
                      impl="xla")
    out = batched_nms(det, prob_thresh=0.2, iou_thresh=0.4, top_k=64,
                      impl="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(out.classes),
                                  np.asarray(ref.classes))
    np.testing.assert_allclose(np.asarray(out.boxes), np.asarray(ref.boxes),
                               rtol=1e-6)


def test_pallas_nms_empty_and_full():
    rng = np.random.default_rng(5)
    det = _rand_det(rng, n=128)
    det[:, 4] = 0.0001  # nothing passes
    out = batched_nms(jnp.asarray(det[None]), prob_thresh=0.5, top_k=32,
                      impl="pallas", interpret=True)
    assert not np.asarray(out.valid).any()

    det2 = _rand_det(rng, n=128)
    det2[:, 4] = 0.99
    ref = batched_nms(jnp.asarray(det2[None]), prob_thresh=0.01,
                      iou_thresh=0.45, top_k=32, impl="xla")
    out2 = batched_nms(jnp.asarray(det2[None]), prob_thresh=0.01,
                       iou_thresh=0.45, top_k=32, impl="pallas",
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(out2.valid),
                                  np.asarray(ref.valid))


def test_pallas_compact_decode_matches_reference():
    """decode_compact_pallas is bit-exact vs the XLA compact decode modulo
    the documented anchor-major candidate reorder (VERDICT.md round-1 #4)."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.ops.decode import decode_compact_head
    from yolov3_tpu.ops.pallas_decode import decode_compact_head_pallas

    graph = load_graph(os.path.join(MODELS, "yolov3.cfg"))
    anchors = [n.anchors for n in graph.yolo_nodes]
    strides = list(graph.head_strides())
    rng = np.random.default_rng(3)
    for (g, an, st) in zip((76, 38, 19), anchors, strides):
        f = jnp.asarray(rng.normal(0, 2, (2, g, g, 255)), jnp.float32)
        bx0, sc0, cl0 = decode_compact_head(f, an, st, 80)
        bx1, sc1, cl1 = decode_compact_head_pallas(f, an, st, 80,
                                                   interpret=True)
        n = g * g * 3

        def reorder(x):  # cell-major -> anchor-major
            x = np.asarray(x)
            return (x.reshape(2, g * g, 3, *x.shape[2:]).swapaxes(1, 2)
                    .reshape(x.shape[0], n, *x.shape[2:]))

        np.testing.assert_array_equal(reorder(bx0), np.asarray(bx1))
        np.testing.assert_array_equal(reorder(sc0), np.asarray(sc1))
        np.testing.assert_array_equal(reorder(cl0), np.asarray(cl1))


def test_pallas_compact_decode_threshold_and_padding():
    """In-kernel score threshold zeroes sub-threshold candidates; padded
    rows (n_rows not a multiple of the tile) never leak fake candidates."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.ops.decode import decode_compact_head
    from yolov3_tpu.ops.pallas_decode import decode_compact_head_pallas

    graph = load_graph(os.path.join(MODELS, "yolov3-tiny.cfg"))
    an = graph.yolo_nodes[0].anchors
    st = list(graph.head_strides())[0]
    rng = np.random.default_rng(4)
    # 13x13 grid, batch 3 -> 507 rows: far from any row-tile multiple
    f = jnp.asarray(rng.normal(0, 2, (3, 13, 13, 255)), jnp.float32)
    bx0, sc0, cl0 = decode_compact_head(f, an, st, 80)
    bx1, sc1, cl1 = decode_compact_head_pallas(f, an, st, 80,
                                               prob_thresh=0.3,
                                               interpret=True)
    sc0r = (np.asarray(sc0).reshape(3, 169, 3).swapaxes(1, 2)
            .reshape(3, 507))
    want = np.where(sc0r >= 0.3, sc0r, 0.0)
    np.testing.assert_array_equal(want, np.asarray(sc1))
    assert np.asarray(sc1).shape == (3, 507)


def test_packed_decode_variant_kernels_bit_identical():
    """The documented-negative packed-decode variants — the transpose-free
    noT kernel and the out_rows back-transposing form — stay bit-identical
    to the shipped transposing kernel. Both are exported library surface
    (kept as measured negative results, bench_decode_kernel.py) and must
    not rot unnoticed (CLAUDE.md: every Pallas kernel needs an
    interpret-mode test)."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.ops.pallas_decode import (decode_packed_head_pallas,
                                              decode_packed_head_pallas_noT)

    graph = load_graph(os.path.join(MODELS, "yolov3-tiny.cfg"))
    an = graph.yolo_nodes[0].anchors
    st = list(graph.head_strides())[0]
    rng = np.random.default_rng(11)
    # 13x13 grid, batch 3 -> 507 rows: exercises the row-tile padding path
    # of every variant; nonzero head_offset pins the candidate-index lane
    f = jnp.asarray(rng.normal(0, 2, (3, 13, 13, 255)), jnp.float32)
    p0, s0 = decode_packed_head_pallas(f, an, st, 80, prob_thresh=0.25,
                                       head_offset=100, interpret=True)
    p1, s1 = decode_packed_head_pallas(f, an, st, 80, prob_thresh=0.25,
                                       head_offset=100, out_rows=True,
                                       interpret=True)
    p2, s2 = decode_packed_head_pallas_noT(f, an, st, 80, prob_thresh=0.25,
                                           head_offset=100, interpret=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s2))


def test_pallas_compact_decode_e2e_same_detections(cfg_paths):
    """Full pipeline detection sets identical under decode_impl xla/pallas."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import fold_raw, random_raw
    from yolov3_tpu.graph import load_graph

    g = load_graph(cfg_paths["yolov3-tiny"])
    params = fold_raw(random_raw(g, seed=12))
    net_x = Darknet(cfg_paths["yolov3-tiny"]).set_params(params)
    net_p = Darknet(cfg_paths["yolov3-tiny"]).set_params(params)
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (2, 240, 320, 3), dtype=np.uint8)
    det_x = Detector(net_x, prob_thresh=0.3, net_hw=(160, 160),
                     decode_impl="xla")
    det_p = Detector(net_p, prob_thresh=0.3, net_hw=(160, 160),
                     decode_impl="pallas")
    rx = det_x.detect_batch(frames)
    rp = det_p.detect_batch(frames)
    for a, b in zip(rx, rp):
        sa = {(tuple(np.round(bb, 3)), int(c), round(float(s), 5))
              for bb, s, c in zip(a.bbox_tlbr, a.class_prob, a.class_idx)}
        sb = {(tuple(np.round(bb, 3)), int(c), round(float(s), 5))
              for bb, s, c in zip(b.bbox_tlbr, b.class_prob, b.class_idx)}
        assert sa == sb


def test_fused_head_decode_matches_packed(cfg_paths):
    """Head-conv-fused packed decode ≈ XLA head conv + packed decode.

    fp32 `highest` on both sides: the only numeric difference is the
    accumulation order of the 1×1 projection (XLA conv vs in-kernel MXU
    dot), so payload/scores agree to float tolerance with IDENTICAL
    candidate order."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.model import (forward_packed, forward_packed_fused,
                                  fused_heads_eligible)
    from yolov3_tpu.weights import fold_raw, random_raw

    g = load_graph(cfg_paths["yolov3-tiny"])
    assert fused_heads_eligible(g)
    params = fold_raw(random_raw(g, seed=21))
    params = {k: {n: jnp.asarray(a) for n, a in v.items()}
              for k, v in params.items()}
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((2, 160, 160, 3)), jnp.float32)
    p0, s0 = forward_packed(g, params, x, prob_thresh=0.2,
                            precision="highest")
    p1, s1 = forward_packed_fused(g, params, x, prob_thresh=0.2,
                                  precision="highest")
    assert p0.shape == p1.shape and s0.shape == s1.shape
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               atol=1e-5, rtol=1e-4)
    # boxes only meaningful where a candidate survived the threshold
    m = (np.asarray(s0) > 0) & (np.asarray(s1) > 0)
    np.testing.assert_allclose(np.asarray(p0)[m], np.asarray(p1)[m],
                               atol=5e-3, rtol=1e-4)
    # candidate-index lane rides through bit-exact (it is data-independent)
    np.testing.assert_array_equal(np.asarray(p0)[..., 6],
                                  np.asarray(p1)[..., 6])


def test_fused_head_decode_e2e_same_detections(cfg_paths):
    """Full pipeline detections under decode_impl pallas vs pallas-fused
    agree to float tolerance (score-sorted match, same classes/counts)."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import fold_raw, random_raw
    from yolov3_tpu.graph import load_graph

    g = load_graph(cfg_paths["yolov3"])
    params = fold_raw(random_raw(g, seed=13))
    net_p = Darknet(cfg_paths["yolov3"],
                    precision="highest").set_params(params)
    net_f = Darknet(cfg_paths["yolov3"],
                    precision="highest").set_params(params)
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, (2, 240, 320, 3), dtype=np.uint8)
    det_p = Detector(net_p, prob_thresh=0.3, net_hw=(128, 128),
                     decode_impl="pallas")
    det_f = Detector(net_f, prob_thresh=0.3, net_hw=(128, 128),
                     decode_impl="pallas-fused")
    rp = det_p.detect_batch(frames)
    rf = det_f.detect_batch(frames)
    for a, b in zip(rp, rf):
        assert len(a.class_prob) == len(b.class_prob)
        oa = np.argsort(-a.class_prob, kind="stable")
        ob = np.argsort(-b.class_prob, kind="stable")
        np.testing.assert_allclose(a.class_prob[oa], b.class_prob[ob],
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_array_equal(a.class_idx[oa], b.class_idx[ob])
        np.testing.assert_allclose(a.bbox_tlbr[oa], b.bbox_tlbr[ob],
                                   atol=5e-3, rtol=1e-3)


def test_fused_heads_eligibility_gate(cfg_paths):
    """All published variants are fused-eligible; a non-linear head conv or
    a non-lane-aligned Cin disqualifies (and the Detector falls back)."""
    import dataclasses

    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.model import fused_heads_eligible

    for name in ("yolov3", "yolov3-tiny", "yolov3-spp"):
        assert fused_heads_eligible(load_graph(cfg_paths[name])), name

    g = load_graph(cfg_paths["yolov3-tiny"])
    hc = g.yolo_nodes[0].inputs[0]
    nodes = list(g.nodes)
    nodes[hc] = dataclasses.replace(nodes[hc], activation="leaky")
    g_bad = dataclasses.replace(g, nodes=tuple(nodes))
    assert not fused_heads_eligible(g_bad)


def test_fused_head_decode_rejects_bad_shapes():
    """decode_packed_head_fused_pallas raises on non-aligned Cin rather than
    emitting a wrong-layout kernel."""
    from yolov3_tpu.ops.pallas_decode import decode_packed_head_fused_pallas

    x = jnp.zeros((1, 4, 4, 96), jnp.float32)  # 96 % 128 != 0
    w = jnp.zeros((96, 128), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    with pytest.raises(ValueError):
        decode_packed_head_fused_pallas(x, w, b, ANCHORS, 32, 80)
