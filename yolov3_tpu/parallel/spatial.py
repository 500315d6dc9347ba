"""Spatial (halo-exchange) model parallelism for single-image latency.

Batch DP (``sharding.py``) scales *throughput*: N chips serve N× the
images, but one image is never faster than one chip. This module adds the
complementary TPU-native axis — **spatial partitioning**: the image's ROW
axis is sharded over the mesh so N chips cooperate on a single step, for
latency-bound serving (BASELINE.md batch-1 table; the reference, a
single-GPU script, has no equivalent — SURVEY.md §2.15 records "none").

Design (scaling-book recipe: pick a mesh, keep collectives on ICI):

* every conv/pool runs on its local row band; 3×3 convs exchange one-row
  halos with mesh neighbors via ``lax.ppermute`` — a nearest-neighbor
  collective that rides ICI (~µs per hop on real hardware, vs the ms-class
  conv stages it unblocks);
* ``ppermute``'s zero-fill for edge devices (a destination with no source
  receives zeros) IS the conv's zero padding — the global boundary
  condition falls out of the collective's semantics, no masking needed;
* the walk stays sharded while the arithmetic allows (rows divisible,
  stride-2 parity, halo ≤ band); at the first infeasible node — for
  yolov3@608 that is the downsample into the 19-row stage — ONE tiled
  ``all_gather`` (a few MB at batch 1) re-replicates the map;
* past that crossover the deep 1×1→3×3 conv chains run CHANNEL-sharded
  in Megatron-style col/row pairs (first conv splits output channels,
  second splits input channels, one ``psum`` per pair), so the deep
  stages — where yolov3's FLOPs actually concentrate — shard too;
  decode + NMS run replicated (identical results on every chip).

The planner (:func:`plan_spatial`) chooses the crossover and the pair
coloring statically from the graph, so the jitted program has a fixed
collective schedule. The FLOP-weighted sharded fraction it reports bounds
the Amdahl speedup: for yolov3@608 the two regimes together shard
0.96/0.94/0.92 of conv FLOPs at n=2/4/8 (row-sharding alone reaches only
0.61/0.37/0.13 — darknet53's cost sits in the /8–/32 stages).

int8 is out of scope here by measurement, not assertion: spatial
partitioning targets small-batch latency, and at latency-class batch
sizes int8 is *slower* than bf16 (79 vs 66 ms serving p50 at b≤14 —
BASELINE.md round-4 serving table: "the int8 tier is a throughput knob,
not a latency knob"); bf16 also keeps the halo dtype handling trivial.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import Graph, Node
from ..model import _PRECISIONS, _conv, _maxpool, _upsample_nearest
from .sharding import replicate, shard_map

SPACE_AXIS = "space"


def make_spatial_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the image-row axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} visible")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPACE_AXIS,))


@dataclass(frozen=True)
class SpatialPlan:
    """Static partition plan: nodes [0, crossover) run row-sharded; past
    the crossover, convs with a ``roles`` entry run channel-sharded
    (``"col"``: output channels split; ``"row"``: input channels split,
    one psum) and the rest replicated."""

    n_shards: int
    crossover: int            # first node index past the row-sharded prefix
    sharded_flop_frac: float  # conv-FLOP fraction inside the sharded prefix
    roles: Tuple[Tuple[int, str], ...] = ()  # (node index, "col"|"row")
    total_sharded_flop_frac: float = 0.0  # prefix + channel-sharded tail


def _node_feasible(node: Node, h_in: int, n: int) -> bool:
    """Can ``node`` run on row bands of h_in/n without global rows?"""
    if h_in % n:
        return False
    local = h_in // n
    if node.kind == "convolutional":
        if node.size == 1:
            return True
        if not node.pad or node.size % 2 == 0:
            return False
        if node.stride == 1:
            return node.size // 2 <= local  # halo within one neighbor hop
        if node.stride == 2 and node.size == 3:
            # stride-2 output rows split cleanly iff the band is even; the
            # darknet bottom pad row is never read for even global H
            return local % 2 == 0 and h_in % 2 == 0
        return False
    if node.kind == "maxpool":
        if node.stride == node.size:
            # non-overlapping windows; feasible only with no LOW vertical
            # pad (the sharded form drops vertical padding entirely — the
            # high pad row is unread for divisible H, but a low pad row
            # would shift every window). darknet's default padding=size-1
            # gives lo = (size-1)//2 = 0 exactly for size 2, the only
            # stride==size pool in the published cfgs.
            return local % node.size == 0 and node.padding // 2 == 0
        if node.stride == 1:
            lo = node.padding // 2
            hi = node.padding - lo
            return max(lo, hi) <= local
        return False
    if node.kind in ("upsample", "shortcut", "route"):
        return True
    return False  # yolo: decode needs global row indices — replicate


def plan_spatial(graph: Graph, n_shards: int, net_hw: Tuple[int, int]
                 ) -> SpatialPlan:
    """Walk the graph; shard every prefix node the arithmetic allows.

    The sharded region is a prefix by construction (once one node needs
    the full map, everything downstream consumes full maps), which keeps
    the runtime to exactly one planned gather plus on-demand gathers of
    route/shortcut sources that cross the boundary.
    """
    in_h, in_w = int(net_hw[0]), int(net_hw[1])
    if n_shards <= 1:
        raise ValueError("spatial partitioning needs a mesh of >= 2 devices")
    if in_h % n_shards:
        raise ValueError(
            f"net height {in_h} not divisible by {n_shards} shards")

    def h_of(idx: int) -> int:
        if idx < 0:
            return in_h
        d = graph.nodes[idx].downsample
        if in_h % d:
            raise ValueError(f"net height {in_h} not divisible by stride {d}")
        return in_h // d

    crossover = len(graph.nodes)
    for node in graph.nodes:
        h_in = h_of(node.inputs[0] if node.inputs else node.index - 1)
        if not _node_feasible(node, h_in, n_shards):
            crossover = node.index
            break

    roles = _plan_channel_roles(graph, crossover, n_shards)

    flops_in = flops_ch = flops_total = 0.0
    for node in graph.nodes:
        if node.kind != "convolutional":
            continue
        src = node.inputs[0]
        cin = graph.in_channels if src < 0 else graph.nodes[src].out_channels
        h_out = in_h // node.downsample
        w_out = in_w // node.downsample
        f = 2.0 * h_out * w_out * node.size * node.size * cin * node.out_channels
        flops_total += f
        if node.index < crossover:
            flops_in += f
        elif node.index in roles:
            flops_ch += f
    frac = flops_in / flops_total if flops_total else 0.0
    total = (flops_in + flops_ch) / flops_total if flops_total else 0.0
    return SpatialPlan(n_shards=n_shards, crossover=crossover,
                       sharded_flop_frac=frac,
                       roles=tuple(sorted(roles.items())),
                       total_sharded_flop_frac=total)


def _plan_channel_roles(graph: Graph, crossover: int, n: int
                        ) -> Dict[int, str]:
    """Megatron-style pair coloring for the replicated tail.

    Darknet's deep structure is chains of 1×1→3×3 convs (residual bodies,
    head branches): the first of each pair splits its OUTPUT channels
    ("col"), the second its INPUT channels ("row") with one psum — the
    pair's activations never replicate and the pair costs exactly one
    all-reduce of one (small, deep-stage) map. A conv may go "col" only
    when its sole consumer is the next conv (a tensor with a route/
    shortcut/yolo consumer must stay replicated) and its width divides the
    mesh; everything else stays replicated (downsample convs — their
    outputs also feed the residual add — and route-tapped 1×1s).
    """
    consumers: Dict[int, List[int]] = {}
    for node in graph.nodes:
        for i in node.inputs:
            if i >= 0:
                consumers.setdefault(i, []).append(node.index)

    roles: Dict[int, str] = {}
    state: Dict[int, str] = {}  # node index -> "rep" | "col"

    def in_state(idx: int) -> str:
        return state.get(idx, "rep") if idx >= 0 else "rep"

    for node in graph.nodes[crossover:]:
        src = node.inputs[0] if node.inputs else node.index - 1
        if node.kind == "convolutional":
            if in_state(src) == "col":
                roles[node.index] = "row"  # psum closes the pair
                state[node.index] = "rep"
                continue
            cs = consumers.get(node.index, [])
            nxt = graph.nodes[cs[0]] if len(cs) == 1 else None
            if (nxt is not None and nxt.kind == "convolutional"
                    and node.out_channels % n == 0
                    and nxt.index >= crossover):
                roles[node.index] = "col"
                state[node.index] = "col"
            else:
                state[node.index] = "rep"
        else:
            # non-conv nodes always see replicated inputs here: a "col"
            # output's sole consumer is by construction the paired conv
            state[node.index] = "rep"
    return roles


# --- halo primitives (inside shard_map) ----------------------------------

def _rows_from_above(x: jax.Array, k: int, n: int) -> jax.Array:
    """Last k rows of the band above (shard i-1); shard 0 receives zeros."""
    perm = [(i, i + 1) for i in range(n - 1)]
    return lax.ppermute(x[:, -k:], SPACE_AXIS, perm)


def _rows_from_below(x: jax.Array, k: int, n: int) -> jax.Array:
    """First k rows of the band below (shard i+1); the last shard gets zeros."""
    perm = [(i + 1, i) for i in range(n - 1)]
    return lax.ppermute(x[:, :k], SPACE_AXIS, perm)


def _activate(y: jax.Array, b: jax.Array, activation: str) -> jax.Array:
    y = y + b.astype(y.dtype)
    if activation == "leaky":
        return jnp.where(y > 0, y, 0.1 * y)
    if activation == "relu":
        return jnp.maximum(y, 0)
    return y


def _conv_sharded(x, w, b, node: Node, precision, n: int) -> jax.Array:
    """``model._conv`` on a row band: halo rows replace vertical padding."""
    if node.size == 1:
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(node.stride, node.stride),
            padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
        return _activate(y, b, node.activation)
    halo = node.size // 2
    if node.stride == 1:
        xx = jnp.concatenate([_rows_from_above(x, halo, n), x,
                              _rows_from_below(x, halo, n)], axis=1)
    else:  # stride 2, size 3 (planner-guaranteed): only the top row crosses
        xx = jnp.concatenate([_rows_from_above(x, 1, n), x], axis=1)
    y = lax.conv_general_dilated(
        xx, w.astype(x.dtype), window_strides=(node.stride, node.stride),
        padding=[(0, 0), (halo, halo)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return _activate(y, b, node.activation)


def _maxpool_sharded(x, node: Node, n: int) -> jax.Array:
    lo = node.padding // 2
    hi = node.padding - lo
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    if node.stride == node.size:
        vert = (0, 0)  # planner: band divisible; darknet hi pad unread
        xx = x
    else:  # stride 1: overlap rows come from neighbors; mesh edges pool -inf
        idx = lax.axis_index(SPACE_AXIS)
        parts = []
        if lo:
            up = _rows_from_above(x, lo, n)
            parts.append(jnp.where(idx == 0, jnp.full_like(up, neg_inf), up))
        parts.append(x)
        if hi:
            dn = _rows_from_below(x, hi, n)
            parts.append(jnp.where(idx == n - 1,
                                   jnp.full_like(dn, neg_inf), dn))
        xx = jnp.concatenate(parts, axis=1)
        vert = (0, 0)
    return lax.reduce_window(
        xx, neg_inf, lax.max,
        window_dimensions=(1, node.size, node.size, 1),
        window_strides=(1, node.stride, node.stride, 1),
        padding=((0, 0), vert, (lo, hi), (0, 0)))


def _conv_col(x, p, node: Node, precision, n: int) -> jax.Array:
    """Output-channel-sharded conv: this shard computes Cout/n channels.

    Weight/bias slicing happens in-jit from the replicated params (they are
    KB-scale at the depths this runs); bias and activation are channelwise,
    so they apply per-shard with no communication.
    """
    w, b = p["w"], p["b"]
    c = w.shape[3] // n
    i = lax.axis_index(SPACE_AXIS)
    wl = lax.dynamic_slice_in_dim(w, i * c, c, axis=3)
    bl = lax.dynamic_slice_in_dim(b, i * c, c, axis=0)
    pad = node.size // 2 if node.pad else 0
    y = lax.conv_general_dilated(
        x, wl.astype(x.dtype), window_strides=(node.stride, node.stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return _activate(y, bl, node.activation)


def _conv_row(x, p, node: Node, precision, n: int) -> jax.Array:
    """Input-channel-sharded conv closing a col/row pair: each shard
    contracts its Cin/n slice, one psum reduces the partial maps, then
    bias + activation run on the replicated result (bias must be added
    exactly once — after the reduction)."""
    w, b = p["w"], p["b"]
    c = w.shape[2] // n
    i = lax.axis_index(SPACE_AXIS)
    wl = lax.dynamic_slice_in_dim(w, i * c, c, axis=2)
    pad = node.size // 2 if node.pad else 0
    y = lax.conv_general_dilated(
        x, wl.astype(x.dtype), window_strides=(node.stride, node.stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    y = lax.psum(y, SPACE_AXIS)
    return _activate(y, b, node.activation)


def forward_features_spatial(
    graph: Graph,
    params: Dict[int, Dict[str, jax.Array]],
    x_local: jax.Array,
    *,
    n_shards: int,
    crossover: int,
    precision: Optional[str] = None,
    channel_roles: Optional[Dict[int, str]] = None,
) -> List[jax.Array]:
    """``model.forward_features`` on row bands, inside ``shard_map``.

    ``x_local``: this shard's (B, H/n, W, C) band. Nodes < ``crossover``
    run sharded with halo exchange; at the boundary the running tensor is
    all_gathered once, and cached route/shortcut sources that cross the
    boundary are gathered on first replicated use. Past the boundary,
    convs listed in ``channel_roles`` run channel-sharded (col/row pairs,
    one psum per pair). Returns the head maps, all replicated (the planner
    never shards a yolo node).
    """
    roles = dict(channel_roles or {})
    prec = _PRECISIONS[precision]
    needed = graph.needed_outputs
    cache: Dict[int, jax.Array] = {}
    local: Dict[int, bool] = {}
    heads: List[jax.Array] = []
    prev = x_local.astype(jnp.bfloat16) if precision == "bf16" else x_local
    prev_local = True

    def gather(t: jax.Array) -> jax.Array:
        return lax.all_gather(t, SPACE_AXIS, axis=1, tiled=True)

    def fetch(i: int, want_full: bool) -> jax.Array:
        t = cache[i]
        if want_full and local[i]:
            t = gather(t)
            cache[i], local[i] = t, False
        return t

    for node in graph.nodes:
        repl = node.index >= crossover
        if repl and prev_local:
            prev = gather(prev)
            prev_local = False
            if node.index - 1 in cache and local[node.index - 1]:
                cache[node.index - 1], local[node.index - 1] = prev, False
        if node.kind == "convolutional":
            p = params[node.index]
            role = roles.get(node.index) if repl else None
            if role == "col":
                out = _conv_col(prev, p, node, prec, n_shards)
            elif role == "row":
                out = _conv_row(prev, p, node, prec, n_shards)
            elif repl:
                out = _conv(prev, p["w"], p["b"], node, prec)
            else:
                out = _conv_sharded(prev, p["w"], p["b"], node, prec,
                                    n_shards)
        elif node.kind == "maxpool":
            out = (_maxpool(prev, node) if repl else
                   _maxpool_sharded(prev, node, n_shards))
        elif node.kind == "upsample":
            out = _upsample_nearest(prev, node.stride)
        elif node.kind == "shortcut":
            out = prev + fetch(node.inputs[1], want_full=repl)
            if node.activation == "leaky":
                out = jnp.where(out > 0, out, 0.1 * out)
            elif node.activation == "relu":
                out = jnp.maximum(out, 0)
        elif node.kind == "route":
            srcs = [prev if i == node.index - 1 else fetch(i, want_full=repl)
                    for i in node.inputs]
            out = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
        elif node.kind == "yolo":
            heads.append(prev)
            out = prev
        else:  # pragma: no cover - lower() already validates kinds
            raise ValueError(node.kind)
        if node.index in needed:
            cache[node.index] = out
            local[node.index] = not repl
        prev = out
        prev_local = not repl
    return heads


def spatial_pipeline(graph: Graph, mesh: Mesh, net_hw: Tuple[int, int],
                     prob_thresh: float = 0.05, iou_thresh: float = 0.3,
                     top_k: int = 512, mode: str = "letterbox",
                     precision: Optional[str] = None, bgr: bool = True,
                     nms_impl: str = "xla", decode_impl: str = "pallas",
                     max_results: int = 0, tail: str = "channel",
                     select_group: int = 2):
    """Build the row-sharded end-to-end detect step, jitted over ``mesh``.

    Returns ``run(params, frames_u8)``: uint8 (B, H, W, 3), replicated →
    NMSResult, replicated. ``tail`` picks the strategy past the row
    crossover: ``"channel"`` (default) runs the deep 1×1→3×3 pairs
    channel-sharded — for yolov3@608 that lifts the sharded FLOP fraction
    to 0.96/0.94/0.92 at n=2/4/8 (from 0.61/0.37/0.13 row-only, measured
    by the planner) at the cost of one small psum per pair —
    ``"replicated"`` runs the tail redundantly on every chip with zero
    extra communication. Decode + NMS always run replicated (identical
    results on every chip). Unlike ``sharded_pipeline`` there is no batch
    divisibility constraint; B=1 is the intended case.
    """
    if tail not in ("channel", "replicated"):
        raise ValueError(f"unknown tail strategy {tail!r}")
    from ..model import pad_head_params
    from ..ops.nms import batched_nms_compact
    from ..ops.pallas_decode import supported as _pallas_decode_ok
    from ..ops.preprocess import preprocess

    plan = plan_spatial(graph, mesh.size, net_hw)
    if plan.crossover == 0:
        raise ValueError(
            f"no node shardable over {mesh.size} rows at {net_hw} — "
            "use a smaller mesh or larger input")
    if (decode_impl == "pallas"
            and not _pallas_decode_ok([n.anchors for n in graph.yolo_nodes])):
        decode_impl = "xla"
    if decode_impl == "pallas":
        from ..ops.pallas_decode import decode_compact_pallas as _decode
    else:
        from ..ops.decode import decode_compact as _decode

    yolo_nodes = graph.yolo_nodes
    anchors = [n.anchors for n in yolo_nodes]
    strides = list(graph.head_strides())
    n = mesh.size
    local_h = net_hw[0] // n

    def step(params, frames_u8):
        if bgr:
            frames_u8 = frames_u8[..., ::-1]
        if decode_impl == "pallas":
            params = pad_head_params(graph, params)
        # replicated preprocess (~0.25 ms/frame, BASELINE.md) — each shard
        # then slices its own row band; rows never cross the wire twice
        x = preprocess(frames_u8, net_hw, mode=mode)
        row0 = lax.axis_index(SPACE_AXIS) * local_h
        x_local = lax.dynamic_slice_in_dim(x, row0, local_h, axis=1)
        heads = forward_features_spatial(
            graph, params, x_local, n_shards=n,
            crossover=plan.crossover, precision=precision,
            channel_roles=dict(plan.roles) if tail == "channel" else None)
        boxes, scores, classes = _decode(
            heads, anchors, strides, yolo_nodes[0].classes)
        return batched_nms_compact(boxes, scores, classes,
                                   prob_thresh=prob_thresh,
                                   iou_thresh=iou_thresh, top_k=top_k,
                                   impl=nms_impl, max_results=max_results,
                                   select_group=select_group)

    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_rep=False,  # outputs ARE replicated (identical tail math)
    )
    rep = replicate(mesh)
    from ..ops.nms import NMSResult

    return jax.jit(
        mapped,
        in_shardings=(rep, rep),
        out_shardings=jax.tree.map(
            lambda _: rep, NMSResult(boxes=0, scores=0, classes=0, valid=0)),
    )
