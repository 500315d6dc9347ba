"""Fused int8 residual-block kernel (ops/pallas_block.py) vs the unfused
int8-carrier walk — interpret mode on CPU; the on-chip compiled gate lives in
tools/tpu_check.py.

The kernel mimics the unfused walk op for op (integer convs exact, every
intermediate quantization reproduced), so fused-vs-unfused differences are
confined to requantization TIES flipped by float-contraction (FMA)
differences between the two compiled programs — measured ≤1 quantization
step on ~0.04% of elements (see the kernel's numerics contract). Tests
assert that bound at the block output, near-total exact equality at the
heads, and the standard pre-NMS parity bars through decode.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from yolov3_tpu.config import parse_config_text
from yolov3_tpu.graph import lower
from yolov3_tpu.ops.pallas_block import (DEFAULT_MAX_CIN, fused_block_plan,
                                         plan_geometry)
from yolov3_tpu.quant import (calibrate_tensors, forward_compact_int8,
                              forward_features_int8_carrier, quantize_weights)

_NET = """
[net]
width={w}
height={h}
channels=3
"""

_STEM = """
[convolutional]
batch_normalize=1
filters={cin}
size=3
stride=2
pad=1
activation=leaky
"""

_BLOCK = """
[convolutional]
batch_normalize=1
filters={cmid}
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters={cin}
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear
"""

_TAIL = """
[convolutional]
batch_normalize=1
filters=256
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=27
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=4
num=3
"""


def _graph(net_hw=(48, 48), cin=128, cmid=64, blocks=2, tail=_TAIL):
    cfg = (_NET.format(h=net_hw[0], w=net_hw[1])
           + _STEM.format(cin=cin)
           + _BLOCK.format(cin=cin, cmid=cmid) * blocks
           + tail)
    return lower(parse_config_text(cfg))


def _random_params(g, seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    for n in g.conv_nodes:
        c_in = g.nodes[n.inputs[0]].out_channels if n.inputs[0] >= 0 else 3
        params[n.index] = {
            "w": jnp.asarray(rng.normal(0, 0.1,
                                        (n.size, n.size, c_in,
                                         n.out_channels)), jnp.float32),
            "b": jnp.asarray(rng.normal(0, 0.05, (n.out_channels,)),
                             jnp.float32)}
    return params


def _quantized(g, seed=0, batch=2):
    params = _random_params(g, seed)
    rng = np.random.default_rng(seed + 1)
    x = jnp.asarray(rng.uniform(0, 1, (batch,) + (g.in_height, g.in_width)
                                + (3,)), jnp.float32)
    scales = calibrate_tensors(g, params, [x], precision="bf16")
    return quantize_weights(g, params), scales, x


def _assert_heads_close(g, qp, scales, x, frac: float = 0.1):
    """Fused vs unfused head maps: a requant-tie flip at the block output
    (≤1 step on ~0.04% of elements — the tight bound lives in
    test_block_output_quant_step_contract) SPREADS through downstream convs
    (one flipped element touches 9·C outputs per 3×3), so the head-level
    check bounds magnitude, not spread: most elements exactly equal, none
    beyond a few quantization steps."""
    h_xla = forward_features_int8_carrier(g, qp, scales, x, "bf16",
                                          block_impl="xla")
    h_pal = forward_features_int8_carrier(g, qp, scales, x, "bf16",
                                          block_impl="pallas")
    assert len(h_xla) == len(h_pal)
    smax = max(scales.values())
    for a, b in zip(h_xla, h_pal):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        assert (d == 0).mean() >= 1 - frac, f"{(d > 0).mean():.4%} differ"
        assert d.max() <= 10 * smax, f"max diff {d.max()} vs scale {smax}"


def test_plan_detects_residual_blocks():
    g = _graph(blocks=2)
    qp, scales, _ = _quantized(g)
    plan = fused_block_plan(g, qp, scales)
    assert set(plan) == {1, 4}
    assert plan[1] == {"cin": 128, "cmid": 64, "cout": 128, "cp": 128}


def test_plan_rejects_unaligned_and_oversized_channels():
    g64 = _graph(cin=64, cmid=32)  # cin % 128 != 0
    qp, scales, _ = _quantized(g64)
    assert fused_block_plan(g64, qp, scales) == {}
    g = _graph(blocks=1)
    qp, scales, _ = _quantized(g)
    assert fused_block_plan(g, qp, scales, max_cin=64) == {}


def test_chain_of_two_blocks():
    g = _graph(blocks=2)
    qp, scales, x = _quantized(g)
    _assert_heads_close(g, qp, scales, x)


def test_block_output_quant_step_contract():
    # compare the fused block's OUTPUT tensor (upto = shortcut + 1) against
    # the unfused walk: differences must be confined to single requant-tie
    # steps on a tiny fraction of elements
    g = _graph(cin=128, cmid=128, blocks=1)
    qp, scales, x = _quantized(g)
    s_out = scales[3]
    a = forward_features_int8_carrier(g, qp, scales, x, "bf16", upto=4,
                                      block_impl="xla")[-1]
    b = forward_features_int8_carrier(g, qp, scales, x, "bf16", upto=4,
                                      block_impl="pallas")[-1]
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    assert (d == 0).mean() >= 0.995, f"{(d > 0).mean():.4%} differ"
    assert d.max() <= 1.05 * s_out, f"max {d.max()} vs one step {s_out}"


def test_cmid_at_lane_boundary():
    # cmid=128 == cp: no lane padding path
    g = _graph(cin=128, cmid=128, blocks=1)
    qp, scales, x = _quantized(g)
    assert fused_block_plan(g, qp, scales)
    _assert_heads_close(g, qp, scales, x)


def test_odd_spatial_geometry():
    # 38-input → 19×19 blocks: h == th (single row tile), ws > w — the
    # bottom/right masks and the roll wrap-around all exercise
    g = _graph(net_hw=(38, 38), blocks=1)
    qp, scales, x = _quantized(g)
    assert fused_block_plan(g, qp, scales)
    _assert_heads_close(g, qp, scales, x)


def test_non_divisor_rows():
    # 40-input → 20×20: th=20 divides, but check a second odd size too
    g = _graph(net_hw=(40, 56), blocks=1)
    qp, scales, x = _quantized(g)
    _assert_heads_close(g, qp, scales, x)


def test_emit_carrier_when_consumer_not_quantized():
    # block output feeds the (unquantized) head conv directly → want_q is
    # False and the kernel emits the carrier dtype instead of int8
    tail = """
[convolutional]
size=1
stride=1
pad=1
filters=27
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=4
num=3
"""
    g = _graph(blocks=1, tail=tail)
    qp, scales, x = _quantized(g)
    assert fused_block_plan(g, qp, scales)
    _assert_heads_close(g, qp, scales, x)


def test_route_tap_mid_chain_preserved():
    # a later route reads the FIRST block's shortcut output: the fused chain
    # must cache the sliced view so the route sees the exact tensor
    tail = """
[convolutional]
batch_normalize=1
filters=128
size=3
stride=2
pad=1
activation=leaky

[route]
layers=-1

[convolutional]
size=1
stride=1
pad=1
filters=27
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=4
num=3

[route]
layers=3

[convolutional]
size=1
stride=1
pad=1
filters=27
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=4
num=3
"""
    g = _graph(blocks=2, tail=tail)
    qp, scales, x = _quantized(g)
    assert 3 in g.needed_outputs  # first block's shortcut feeds the route
    assert set(fused_block_plan(g, qp, scales)) == {1, 4}
    _assert_heads_close(g, qp, scales, x)


def test_upto_mid_block_falls_back_unfused():
    g = _graph(blocks=2)
    qp, scales, x = _quantized(g)
    # cut inside the first block: nothing may fuse, result identical
    for upto in (2, 3):
        a = forward_features_int8_carrier(g, qp, scales, x, "bf16",
                                          upto=upto, block_impl="xla")
        b = forward_features_int8_carrier(g, qp, scales, x, "bf16",
                                          upto=upto, block_impl="pallas")
        for u, v in zip(a, b):
            np.testing.assert_array_equal(np.asarray(u, np.float32),
                                          np.asarray(v, np.float32))


def test_compact_forward_prenms_parity_through_decode():
    # fused vs unfused through decode: the standard pre-NMS bars
    # (|Δscore| ≤ 0.01, |Δbox| ≤ 0.5 px, same class on the top-200) —
    # the fused-vs-unfused delta is far inside the int8-vs-fp32 delta that
    # test_quant.py holds to the same bars
    g = _graph(blocks=2)
    qp, scales, x = _quantized(g)
    out_x = forward_compact_int8(g, qp, scales, x, "bf16",
                                 decode_impl="xla", carrier="int8",
                                 block_impl="xla")
    out_p = forward_compact_int8(g, qp, scales, x, "bf16",
                                 decode_impl="xla", carrier="int8",
                                 block_impl="pallas")
    bx, sx, cx = (np.asarray(t, np.float32) for t in out_x)
    bp, sp, cp_ = (np.asarray(t, np.float32) for t in out_p)
    for i in range(sx.shape[0]):
        top = np.argsort(-sx[i])[:200]
        assert np.abs(sx[i][top] - sp[i][top]).max() <= 0.01
        assert np.abs(bx[i][top] - bp[i][top]).max() <= 0.5
        assert (cx[i][top] == cp_[i][top]).all()


def test_plan_geometry_vmem_guard():
    assert plan_geometry(76, 76, 256, 128, 256) is not None
    assert plan_geometry(76, 76, 192, 128, 192) is None  # cin % 128
    assert plan_geometry(76, 76, 256, 128, 512) is None  # cout != cin
    # enormous channels blow the VMEM budget at any tile
    assert plan_geometry(608, 608, 8192, 4096, 8192) is None
    assert DEFAULT_MAX_CIN == 256


def test_detector_end_to_end_parity(tmp_path):
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    cfg = (_NET.format(h=48, w=48) + _STEM.format(cin=128)
           + _BLOCK.format(cin=128, cmid=64) * 2 + _TAIL)
    path = tmp_path / "micro.cfg"
    path.write_text(cfg)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8)

    dets = []
    for impl in ("xla", "pallas"):
        net = Darknet(str(path), precision="bf16")
        net.set_params(_random_params(lower(parse_config_text(cfg)), seed=7))
        net.quantize_int8(frames)
        det = Detector(net, prob_thresh=0.0, top_k=32, max_results=16,
                       bgr=False, block_impl=impl)
        dets.append(det.detect_batch(frames))
    for da, db in zip(*dets):
        # top-1 detection must agree to the pre-NMS bars; lower ranks can
        # legally reshuffle under a requant-tie flip
        assert len(da.class_prob) and len(db.class_prob)
        assert abs(da.class_prob[0] - db.class_prob[0]) <= 0.01
        assert np.abs(da.bbox_tlbr[0] - db.bbox_tlbr[0]).max() <= 0.5
        assert da.class_idx[0] == db.class_idx[0]


def test_detector_rejects_unknown_block_impl(tmp_path):
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    cfg = (_NET.format(h=48, w=48) + _STEM.format(cin=128)
           + _BLOCK.format(cin=128, cmid=64) + _TAIL)
    path = tmp_path / "micro.cfg"
    path.write_text(cfg)
    net = Darknet(str(path), precision="bf16")
    with pytest.raises(ValueError, match="block_impl"):
        Detector(net, block_impl="nope")
