"""Weights serialization tests (SURVEY.md §4.2): synthetic .weights round-trip,
bit-exact placement, header variants, stream-census errors, and the BN-fold
algebra (folded conv ≡ conv + BN on random input).
"""
import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from yolov3_tpu.graph import load_graph, lower
from yolov3_tpu.config import parse_config_text
from yolov3_tpu.weights import (
    BN_EPS, fold_raw, load_weights, param_count, random_raw, read_raw,
    write_weights,
)

TINY_CFG = """
[net]
width=32
height=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=4
size=1
stride=1
pad=1
activation=linear
"""


@pytest.fixture()
def tiny_graph():
    return lower(parse_config_text(TINY_CFG))


def test_roundtrip_bit_exact(tmp_path, tiny_graph):
    raw = random_raw(tiny_graph, seed=7)
    path = tmp_path / "t.weights"
    write_weights(path, tiny_graph, raw, header=(0, 2, 0, 1234))
    got, header = read_raw(path, tiny_graph)
    assert header == {"major": 0, "minor": 2, "revision": 0, "seen": 1234}
    for idx in raw:
        for key in raw[idx]:
            np.testing.assert_array_equal(raw[idx][key], got[idx][key])


def test_header_v1_int32_seen(tmp_path, tiny_graph):
    raw = random_raw(tiny_graph, seed=3)
    path = tmp_path / "v1.weights"
    write_weights(path, tiny_graph, raw, header=(0, 1, 0, 77))
    got, header = read_raw(path, tiny_graph)
    assert header["seen"] == 77
    # v1 header is 16 bytes, v2 is 20
    assert path.stat().st_size == 16 + 4 * param_count(tiny_graph)
    np.testing.assert_array_equal(raw[0]["weight"], got[0]["weight"])


def test_param_count_yolov3(cfg_paths):
    g = load_graph(cfg_paths["yolov3"])
    # published yolov3.weights: 62001757 floats + 20-byte header = 248007048 B
    assert param_count(g) == 62001757
    gt = load_graph(cfg_paths["yolov3-tiny"])
    assert param_count(gt) == 8858734  # published yolov3-tiny.weights
    gs = load_graph(cfg_paths["yolov3-spp"])
    # yolov3 + the post-SPP 512←2048 1x1 conv (512*2048 w + 4*512 bn) = 240.5MB
    assert param_count(gs) == 62001757 + 512 * 2048 + 4 * 512


def test_truncated_and_oversize_streams_rejected(tmp_path, tiny_graph):
    raw = random_raw(tiny_graph)
    path = tmp_path / "t.weights"
    write_weights(path, tiny_graph, raw)
    data = path.read_bytes()
    with pytest.raises(ValueError, match="exhausted"):
        read_raw(data[:-8], tiny_graph)
    with pytest.raises(ValueError, match="mismatch"):
        read_raw(data + b"\x00" * 8, tiny_graph)


def test_bn_fold_algebra(tiny_graph, rng):
    """Folded conv output ≡ unfolded conv→BN output (SURVEY.md §4.2)."""
    raw = random_raw(tiny_graph, seed=11)
    folded = fold_raw(raw)

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    node = tiny_graph.nodes[0]
    p = raw[node.index]

    # unfolded: conv (no bias) then batchnorm, torch semantics (eps inside sqrt)
    w_hwio = jnp.asarray(p["weight"].transpose(2, 3, 1, 0))
    y = lax.conv_general_dilated(
        x, w_hwio, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    y_bn = (y - p["bn_mean"]) / np.sqrt(p["bn_var"] + BN_EPS) * p["bn_gamma"] + p["bn_beta"]

    y_folded = lax.conv_general_dilated(
        x, jnp.asarray(folded[node.index]["w"]), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    ) + folded[node.index]["b"]

    np.testing.assert_allclose(np.asarray(y_bn), np.asarray(y_folded),
                               atol=2e-6, rtol=1e-5)


def test_fold_transpose_layout(tiny_graph):
    """OIHW→HWIO transpose places elements where the conv expects them."""
    raw = random_raw(tiny_graph, seed=5)
    folded = fold_raw(raw)
    node = tiny_graph.nodes[0]
    w_oihw = raw[node.index]["weight"]
    scale = raw[node.index]["bn_gamma"] / np.sqrt(raw[node.index]["bn_var"] + BN_EPS)
    # spot-check a single tap: folded[h,w,i,o] == raw[o,i,h,w] * scale[o]
    np.testing.assert_allclose(
        folded[node.index]["w"][2, 0, 1, 3],
        w_oihw[3, 1, 2, 0] * scale[3], rtol=1e-6)


def test_param_cache_roundtrip(tmp_path, tiny_graph):
    from yolov3_tpu.weights import load_weights_cached

    raw = random_raw(tiny_graph, seed=9)
    wpath = tmp_path / "c.weights"
    write_weights(wpath, tiny_graph, raw)

    first = load_weights_cached(wpath, tiny_graph, cache_dir=tmp_path / "cache")
    cache_files = list((tmp_path / "cache").glob("*.npz"))
    assert len(cache_files) == 1
    second = load_weights_cached(wpath, tiny_graph, cache_dir=tmp_path / "cache")
    for idx in first:
        np.testing.assert_array_equal(first[idx]["w"], second[idx]["w"])
        np.testing.assert_array_equal(first[idx]["b"], second[idx]["b"])

    # rewriting the weights file invalidates the cache key
    write_weights(wpath, tiny_graph, random_raw(tiny_graph, seed=10))
    import os
    os.utime(wpath, (os.path.getatime(wpath), os.path.getmtime(wpath) + 5))
    third = load_weights_cached(wpath, tiny_graph, cache_dir=tmp_path / "cache")
    assert not np.array_equal(first[0]["w"], third[0]["w"])


def test_load_weights_full_graphs(tmp_path, cfg_paths):
    """End-to-end load on the real tiny cfg: census exact, shapes HWIO."""
    g = load_graph(cfg_paths["yolov3-tiny"])
    raw = random_raw(g, seed=1)
    path = tmp_path / "tiny.weights"
    write_weights(path, g, raw)
    assert path.stat().st_size == 20 + 4 * param_count(g)
    params = load_weights(path, g)
    assert set(params.keys()) == {n.index for n in g.conv_nodes}
    # first conv: 3x3x3x16 HWIO
    assert params[0]["w"].shape == (3, 3, 3, 16)
    assert params[0]["b"].shape == (16,)
    # last head conv: 1x1x256x255
    assert params[22]["w"].shape == (1, 1, 256, 255)
