"""Spatial (halo-exchange) partitioning tests on the virtual 8-device mesh:
halo convs/pools are exact vs their full-map forms; the planned crossover
lands where the arithmetic says; the full row-sharded pipeline reproduces
the single-device detection sets; the compiled HLO exchanges halos with
collective-permute (not per-conv all-gathers).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from yolov3_tpu.graph import Node, load_graph
from yolov3_tpu.model import _conv, _maxpool, forward_compact, forward_features
from yolov3_tpu.ops.nms import batched_nms_compact
from yolov3_tpu.ops.preprocess import preprocess
from yolov3_tpu.parallel.sharding import replicate, shard_map
from yolov3_tpu.parallel.spatial import (SPACE_AXIS, _conv_sharded,
                                         _maxpool_sharded,
                                         forward_features_spatial,
                                         make_spatial_mesh, plan_spatial,
                                         spatial_pipeline)
from yolov3_tpu.weights import fold_raw, random_raw


def _run_banded(mesh, fn, x, *args):
    """shard_map helper: slice x into row bands, apply fn per shard, gather."""
    n = mesh.size
    local_h = x.shape[1] // n

    def body(x):
        row0 = lax.axis_index(SPACE_AXIS) * local_h
        xl = lax.dynamic_slice_in_dim(x, row0, local_h, axis=1)
        return fn(xl)

    out = shard_map(body, mesh=mesh, in_specs=(P(),),
                    out_specs=P(None, SPACE_AXIS), check_rep=False)(x)
    return out


def test_plan_crossover_tracks_mesh_size(cfg_paths):
    g = load_graph(cfg_paths["yolov3"])
    plans = {n: plan_spatial(g, n, (608, 608)) for n in (2, 4, 8)}
    # the crossover is the downsample conv whose INPUT band goes odd:
    # n=2 → into the 19-row stage, n=4 → into 38, n=8 → into 76
    assert g.nodes[plans[2].crossover].downsample == 32
    assert g.nodes[plans[4].crossover].downsample == 16
    assert g.nodes[plans[8].crossover].downsample == 8
    # more shards → earlier crossover → smaller sharded FLOP fraction
    assert (plans[2].sharded_flop_frac > plans[4].sharded_flop_frac
            > plans[8].sharded_flop_frac > 0.10)
    assert plans[2].sharded_flop_frac > 0.6
    # the channel-pair tail shards the deep stages the rows cannot reach
    for p in plans.values():
        assert p.total_sharded_flop_frac > 0.9


def test_channel_roles_are_valid_pairs(cfg_paths):
    """Every col conv's sole consumer is the row conv that closes it; row
    convs follow col convs; widths divide the mesh."""
    g = load_graph(cfg_paths["yolov3"])
    plan = plan_spatial(g, 4, (608, 608))
    roles = dict(plan.roles)
    assert roles, "no channel pairs planned"
    for idx, role in roles.items():
        node = g.nodes[idx]
        assert node.kind == "convolutional" and idx >= plan.crossover
        if role == "col":
            assert node.out_channels % 4 == 0
            assert roles.get(idx + 1) == "row"  # convs consume prev only
            assert idx not in g.needed_outputs  # never route/shortcut-tapped
        else:
            assert roles.get(idx - 1) == "col"


def test_plan_rejects_bad_configs(cfg_paths):
    g = load_graph(cfg_paths["yolov3"])
    with pytest.raises(ValueError, match="not divisible"):
        plan_spatial(g, 5, (608, 608))
    with pytest.raises(ValueError, match=">= 2 devices"):
        plan_spatial(g, 1, (608, 608))


def test_feasibility_rejects_low_padded_pool():
    """A stride==size pool with a LOW vertical pad row cannot run on bands
    (the sharded form drops vertical padding); darknet's size-2 pool
    (padding=1 → lo=0) can."""
    from yolov3_tpu.parallel.spatial import _node_feasible

    ok = Node(index=0, kind="maxpool", inputs=(-1,), out_channels=4,
              downsample=2, size=2, stride=2, padding=1)
    bad = Node(index=0, kind="maxpool", inputs=(-1,), out_channels=4,
               downsample=4, size=4, stride=4, padding=3)  # lo = 1
    assert _node_feasible(ok, 32, 4)
    assert not _node_feasible(bad, 32, 4)


@pytest.mark.parametrize("stride", [1, 2])
def test_halo_conv_exact(stride):
    mesh = make_spatial_mesh(4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    node = Node(index=0, kind="convolutional", inputs=(-1,), out_channels=8,
                downsample=stride, filters=8, size=3, stride=stride, pad=1,
                activation="leaky")
    ref = _conv(x, w, b, node, lax.Precision.HIGHEST)
    out = _run_banded(mesh, lambda xl: _conv_sharded(
        xl, w, b, node, lax.Precision.HIGHEST, mesh.size), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("size,stride,padding", [(2, 1, 1), (2, 2, 1),
                                                 (3, 1, 2)])
def test_halo_maxpool_exact(size, stride, padding):
    mesh = make_spatial_mesh(4)
    rng = np.random.default_rng(1)
    # negative values matter: the -inf edge masking must beat ppermute's
    # zero fill (zeros would win the max over an all-negative border)
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 4)) - 2.0, jnp.float32)
    node = Node(index=0, kind="maxpool", inputs=(-1,), out_channels=4,
                downsample=stride, size=size, stride=stride, padding=padding)
    ref = _maxpool(x, node)
    out = _run_banded(mesh, lambda xl: _maxpool_sharded(
        xl, node, mesh.size), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


@pytest.mark.parametrize("cfg,n,tail", [("yolov3-tiny", 4, "replicated"),
                                        ("yolov3-tiny", 4, "channel"),
                                        ("yolov3", 2, "channel")])
def test_spatial_features_match_full_walk(cfg_paths, cfg, n, tail):
    """Head maps from the banded walk == the plain forward_features walk
    (exercises halo convs, the crossover gather, boundary-crossing
    route/shortcut fetches, and the channel-pair tail on the real graphs)."""
    g = load_graph(cfg_paths[cfg])
    params = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, seed=2)))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 160, 160, 3)), jnp.float32)
    ref = forward_features(g, params, x, precision="highest")

    mesh = make_spatial_mesh(n)
    plan = plan_spatial(g, n, (160, 160))
    assert 0 < plan.crossover < len(g.nodes)
    local_h = 160 // n
    roles = dict(plan.roles) if tail == "channel" else None

    def body(params, x):
        row0 = lax.axis_index(SPACE_AXIS) * local_h
        xl = lax.dynamic_slice_in_dim(x, row0, local_h, axis=1)
        return tuple(forward_features_spatial(
            g, params, xl, n_shards=n, crossover=plan.crossover,
            precision="highest", channel_roles=roles))

    heads = shard_map(body, mesh=mesh, in_specs=(P(), P()),
                      out_specs=P(), check_rep=False)(params, x)
    assert len(heads) == len(ref)
    for h, r in zip(heads, ref):
        np.testing.assert_allclose(np.asarray(h), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("n,tail", [(2, "channel"), (4, "channel"),
                                    (4, "replicated"), (8, "channel")])
def test_spatial_pipeline_matches_single_device(cfg_paths, n, tail):
    g = load_graph(cfg_paths["yolov3-tiny"])
    params = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, seed=4)))
    frames = np.random.default_rng(5).integers(
        0, 256, (2, 96, 128, 3), dtype=np.uint8)

    mesh = make_spatial_mesh(n)
    run = spatial_pipeline(g, mesh, net_hw=(160, 160), prob_thresh=0.2,
                           top_k=32, precision="highest", tail=tail)
    res = run(params, jnp.asarray(frames))

    def ref_step(params, frames_u8):
        x = preprocess(frames_u8[..., ::-1], (160, 160))
        boxes, scores, classes = forward_compact(
            g, params, x, precision="highest", decode_impl="pallas")
        return batched_nms_compact(boxes, scores, classes, prob_thresh=0.2,
                                   iou_thresh=0.3, top_k=32)

    ref = jax.jit(ref_step)(params, jnp.asarray(frames))
    np.testing.assert_array_equal(np.asarray(res.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(res.classes),
                                  np.asarray(ref.classes))
    np.testing.assert_allclose(np.asarray(res.boxes), np.asarray(ref.boxes),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.scores), np.asarray(ref.scores),
                               atol=1e-4, rtol=1e-4)


def test_spatial_pipeline_output_replicated(cfg_paths):
    g = load_graph(cfg_paths["yolov3-tiny"])
    params = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, seed=4)))
    mesh = make_spatial_mesh(4)
    run = spatial_pipeline(g, mesh, net_hw=(160, 160), top_k=16)
    res = run(params, jnp.zeros((1, 96, 128, 3), jnp.uint8))
    assert res.boxes.sharding.is_equivalent_to(replicate(mesh),
                                               ndim=res.boxes.ndim)
    assert res.boxes.shape == (1, 16, 4)


def test_detector_spatial_partition(cfg_paths, tmp_path):
    """Detector(mesh=make_spatial_mesh(4), partition='spatial') matches the
    single-device detector bit-for-bit on detection sets."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.weights import random_raw, write_weights

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=7))

    net_s = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
    det_s = Detector(net_s, prob_thresh=0.3, net_hw=(160, 160),
                     mesh=make_spatial_mesh(4), partition="spatial")
    net_1 = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
    det_1 = Detector(net_1, prob_thresh=0.3, net_hw=(160, 160))

    frames = np.random.default_rng(8).integers(
        0, 256, (3, 96, 128, 3), dtype=np.uint8)  # no divisibility demand
    r_s = det_s.detect_batch(frames)
    r_1 = det_1.detect_batch(frames)
    assert len(r_s) == len(r_1) == 3
    for a, b in zip(r_s, r_1):
        np.testing.assert_array_equal(a.class_idx, b.class_idx)
        np.testing.assert_allclose(a.bbox_tlbr, b.bbox_tlbr, atol=1e-3)


def test_detector_spatial_rejects_bad_configs(cfg_paths, tmp_path):
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.parallel.sharding import make_mesh
    from yolov3_tpu.weights import random_raw, write_weights

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=7))
    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
    with pytest.raises(ValueError, match="make_spatial_mesh"):
        Detector(net, mesh=make_mesh(4), partition="spatial")
    with pytest.raises(ValueError, match="unknown partition"):
        Detector(net, mesh=make_spatial_mesh(4), partition="pipeline")

    calib = np.random.default_rng(9).integers(
        0, 256, (8, 96, 128, 3), dtype=np.uint8)
    net.quantize_int8(calib, net_hw=(160, 160))
    with pytest.raises(ValueError, match="out of scope"):
        Detector(net, mesh=make_spatial_mesh(4), partition="spatial")


def test_spatial_hlo_collective_schedule(cfg_paths):
    """Structural pin: halos travel by collective-permute (nearest-neighbor,
    ICI-friendly); all-gather appears only for the planned crossover and
    boundary-crossing route sources — NOT once per conv; all-reduce count
    equals the planned channel pairs exactly. A regression to GSPMD-style
    replication would show up as a collective population explosion here
    long before any behavioral test could notice on a virtual mesh."""
    g = load_graph(cfg_paths["yolov3-tiny"])
    params = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, seed=4)))
    mesh = make_spatial_mesh(4)
    plan = plan_spatial(g, 4, (160, 160))
    n_pairs = sum(1 for _, r in plan.roles if r == "row")

    def compile_hlo(tail):
        run = spatial_pipeline(g, mesh, net_hw=(160, 160), top_k=16,
                               tail=tail)
        return run.lower(
            params, jnp.zeros((1, 96, 128, 3), jnp.uint8)).compile().as_text()

    for tail in ("replicated", "channel"):
        hlo = compile_hlo(tail)
        assert "collective-permute" in hlo, "halo exchange disappeared"
        n_gather = hlo.count("all-gather(") + hlo.count("all-gather-start(")
        assert 1 <= n_gather <= 6, (
            f"{n_gather} all-gathers: expected one crossover gather plus "
            "boundary-crossing route fetches (parallel/spatial.py)")
        n_reduce = hlo.count("all-reduce(") + hlo.count("all-reduce-start(")
        if tail == "channel":
            # XLA may merge independent pair-psums into one all-reduce op,
            # so the op count is bounded by the planned pairs, not equal
            assert 1 <= n_reduce <= n_pairs, (
                f"{n_reduce} all-reduces for {n_pairs} planned pairs")
        else:
            assert n_reduce == 0, (
                f"replicated tail compiled {n_reduce} all-reduces")
