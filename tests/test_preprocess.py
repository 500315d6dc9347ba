"""On-device preprocessing tests: letterbox geometry, normalization, parity
with the cv2 host implementation, stretch mode, and box-coordinate inversion.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from yolov3_tpu.ops.preprocess import PAD_FLOAT, preprocess, preprocess_host
from yolov3_tpu.utils.boxes import (
    cxywh_to_tlbr, letterbox_params, tlbr_to_cxywh, unletterbox_tlbr,
    unstretch_tlbr,
)


def test_letterbox_geometry_landscape():
    # 720x1280 -> 416: scale=0.325, new=(234, 416), pad_top=(416-234)//2=91
    scale, pad_top, pad_left = letterbox_params((720, 1280), (416, 416))
    assert scale == pytest.approx(416 / 1280)
    assert (pad_top, pad_left) == (91, 0)

    img = np.full((1, 720, 1280, 3), 255, dtype=np.uint8)
    out = np.asarray(preprocess(jnp.asarray(img), (416, 416)))
    assert out.shape == (1, 416, 416, 3)
    # pad rows are gray 128/255 (one uint8-exact contract across
    # device/C++/cv2 paths), content rows are 1.0
    assert np.allclose(out[0, :91], PAD_FLOAT)
    assert np.allclose(out[0, 91 + 234:], PAD_FLOAT)
    assert np.allclose(out[0, 91:91 + 234], 1.0)


def test_letterbox_geometry_portrait():
    scale, pad_top, pad_left = letterbox_params((1280, 720), (608, 608))
    assert scale == pytest.approx(608 / 1280)
    assert pad_top == 0 and pad_left == (608 - 342) // 2

    img = np.zeros((2, 1280, 720, 3), dtype=np.uint8)
    out = np.asarray(preprocess(jnp.asarray(img), (608, 608)))
    assert out.shape == (2, 608, 608, 3)
    assert np.allclose(out[:, :, :pad_left], PAD_FLOAT)


def test_half_pixel_rounding_device_and_host():
    """Regression (ADVICE.md round 1): 832x501→416 hits an exact .5 resize
    (250.5 rows). Device preprocess, cv2 host fallback, and
    letterbox_geometry must all place content on the same rows — a
    banker's-round in one of them shifts geometry by 1px and breaks
    unletterbox_tlbr's exact-inverse contract."""
    from yolov3_tpu.utils.boxes import letterbox_geometry

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (1, 501, 832, 3), dtype=np.uint8)
    # content sized by round-half-up: floor(250.5+0.5)=251 rows, not 250
    _, pad_top, pad_left, new_h, new_w = letterbox_geometry((501, 832),
                                                            (416, 416))
    assert (new_h, new_w) == (251, 416)
    for out in (np.asarray(preprocess(jnp.asarray(img), (416, 416))),
                preprocess_host(img, (416, 416))):
        assert np.allclose(out[0, :pad_top], PAD_FLOAT)
        assert np.allclose(out[0, pad_top + new_h:], PAD_FLOAT)
        assert not np.allclose(out[0, pad_top], PAD_FLOAT)
        assert not np.allclose(out[0, pad_top + new_h - 1], PAD_FLOAT)


def test_square_input_no_padding():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (1, 832, 832, 3), dtype=np.uint8)
    out = np.asarray(preprocess(jnp.asarray(img), (416, 416)))
    assert out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, PAD_FLOAT)


def test_device_matches_host_cv2():
    """On-device resize ≈ cv2.INTER_LINEAR (cv2 rounds in fixed point)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (1, 480, 640, 3), dtype=np.uint8)
    dev = np.asarray(preprocess(jnp.asarray(img), (416, 416)))
    host = preprocess_host(img, (416, 416))
    assert np.abs(dev - host).max() < 0.02  # cv2 fixed-point tolerance
    # identical pad placement
    assert (np.array_equal(dev == PAD_FLOAT, host == PAD_FLOAT)
            or np.abs(dev - host).max() < 0.02)


def test_stretch_mode_matches_cv2():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (1, 300, 500, 3), dtype=np.uint8)
    dev = np.asarray(preprocess(jnp.asarray(img), (416, 416), mode="stretch"))
    host = preprocess_host(img, (416, 416), mode="stretch")
    assert np.abs(dev - host).max() < 0.02


def test_identity_resize_is_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (1, 416, 416, 3), dtype=np.uint8)
    out = np.asarray(preprocess(jnp.asarray(img), (416, 416)))
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)


def test_unletterbox_roundtrip():
    """net-pixel box of a known image feature maps back to source coords."""
    src_hw, net_hw = (720, 1280), (416, 416)
    scale, pad_top, pad_left = letterbox_params(src_hw, net_hw)
    src_box = np.array([[100.0, 200.0, 500.0, 600.0]])  # tlbr in source px
    net_box = src_box * scale
    net_box[:, [0, 2]] += pad_left
    net_box[:, [1, 3]] += pad_top
    back = unletterbox_tlbr(net_box, src_hw, net_hw)
    np.testing.assert_allclose(back, src_box, atol=1e-4)


def test_unstretch_roundtrip():
    src_hw, net_hw = (300, 500), (416, 416)
    src_box = np.array([[10.0, 20.0, 450.0, 250.0]])
    net_box = src_box * np.array([416 / 500, 416 / 300, 416 / 500, 416 / 300])
    back = unstretch_tlbr(net_box, src_hw, net_hw)
    np.testing.assert_allclose(back, src_box, atol=1e-4)


def test_unletterbox_clips_to_image():
    out = unletterbox_tlbr(np.array([[-50.0, -50.0, 10000.0, 10000.0]]),
                           (720, 1280), (416, 416))
    assert out[0, 0] >= 0 and out[0, 1] >= 0
    assert out[0, 2] <= 1280 and out[0, 3] <= 720


def test_box_format_roundtrip():
    rng = np.random.default_rng(4)
    cxywh = rng.uniform(10, 400, (32, 4)).astype(np.float32)
    np.testing.assert_allclose(tlbr_to_cxywh(cxywh_to_tlbr(cxywh)), cxywh,
                               rtol=1e-5)
