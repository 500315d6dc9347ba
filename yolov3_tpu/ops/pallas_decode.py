"""Pallas TPU kernel: fused YOLO head decode (north star, SURVEY.md §2.14).

One VMEM pass over the raw head map applies the whole decode — sigmoid +
grid-cell offset + stride scale for xy, clamped exp × anchor for wh, sigmoid
for objectness/classes — with the per-channel selection done by precomputed
channel-constant vectors instead of branches (VPU-friendly: three fused
elementwise expressions and two selects).

Layout: the NHWC head map (B, gy, gx, A*(5+C)) is viewed as rows of
A*(5+C) channels — one row per grid cell. Rows tile the sublane axis; the
channel axis pads to the 128-lane boundary. Grid-cell (col, row) offsets are
derived in-kernel from the global row index (``program_id`` × tile + iota),
so the kernel needs no offset tables.

The jnp reference implementation lives in ``decode.py``; parity is tested in
interpret mode on CPU and compiled on TPU.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROW_TILE = 256  # grid cells per kernel instance (sublane tile)
MAX_ANCHORS = 4  # compact/packed kernels emit 8 rows per anchor into a
                 # 32-row block; more anchors per head need the XLA decode


def supported(anchors_per_head) -> bool:
    """Compact/packed kernel eligibility: ≤4 anchors per head (every
    published yolov3 variant has 3). Callers fall back to the XLA decode
    otherwise instead of hitting an opaque in-kernel shape error
    (round-2 review)."""
    return all(len(a) <= MAX_ANCHORS for a in anchors_per_head)


def _channel_constants(anchors, stride, num_classes, c_pad):
    """Per-channel constant vectors driving the fused select.

    kind: 0=x, 1=y, 2=w, 3=h, 4+=conf. Returns (is_xy, is_wh, anchor, pad_mask)
    each of length c_pad (padded channels marked pad).
    """
    a, c = len(anchors), num_classes
    per = 5 + c
    ch = np.arange(c_pad)
    k = ch % per
    in_range = ch < a * per
    is_x = (k == 0) & in_range
    is_y = (k == 1) & in_range
    is_w = (k == 2) & in_range
    is_h = (k == 3) & in_range
    anchor_vec = np.zeros(c_pad, np.float32)
    for ai, (aw, ah) in enumerate(anchors):
        anchor_vec[ai * per + 2] = aw
        anchor_vec[ai * per + 3] = ah
    # one (8, c_pad) block (sublane-padded): rows = is_xy, is_wh, is_x, is_y,
    # anchor; constants must be kernel *inputs* (pallas can't close over
    # traced arrays)
    consts = np.zeros((8, c_pad), np.float32)
    consts[0] = (is_x | is_y).astype(np.float32)
    consts[1] = (is_w | is_h).astype(np.float32)
    consts[2] = is_x.astype(np.float32)
    consts[3] = is_y.astype(np.float32)
    consts[4] = anchor_vec
    return jnp.asarray(consts)


def _decode_kernel(consts_ref, f_ref, o_ref, *, gx, gy, stride):
    rows = f_ref.shape[0]
    is_xy = consts_ref[0:1, :]
    is_wh = consts_ref[1:2, :]
    is_x = consts_ref[2:3, :]
    is_y = consts_ref[3:4, :]
    anchor_vec = consts_ref[4:5, :]

    tile = pl.program_id(0)
    # global grid-cell index for each row of this tile
    cell = (tile * rows
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0))  # (rows, 1)
    cell = cell % (gx * gy)  # strip the batch component
    col = (cell % gx).astype(jnp.float32)
    row = (cell // gx).astype(jnp.float32)

    f = f_ref[:]
    sig = jax.nn.sigmoid(f)
    expo = jnp.exp(jnp.minimum(f, 60.0))

    # xy: (sigmoid + cell offset) * stride ; offset is col for x-ch, row for y-ch
    offset = col * is_x + row * is_y  # (rows, C) via broadcast
    xy = (sig + offset) * jnp.float32(stride)
    wh = expo * anchor_vec
    out = jnp.where(is_xy > 0, xy, jnp.where(is_wh > 0, wh, sig))
    o_ref[:] = out


def decode_head_pallas(
    feat: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    stride: int,
    num_classes: int,
    interpret: bool = False,
) -> jax.Array:
    """Pallas fused decode of one head: (B, gy, gx, A*(5+C)) → (B, g²A, 5+C).

    Bit-compatible with :func:`yolov3_tpu.ops.decode.decode_head`.
    """
    b, gy, gx, c = feat.shape
    a = len(anchors)
    per = 5 + num_classes
    assert c == a * per

    c_pad = ((c + LANES - 1) // LANES) * LANES
    n_rows = b * gy * gx
    rows_tile = min(ROW_TILE, n_rows)
    # row count must tile evenly; pad rows to a multiple
    n_rows_pad = ((n_rows + rows_tile - 1) // rows_tile) * rows_tile

    flat = feat.reshape(n_rows, c)
    flat = jnp.pad(flat, ((0, n_rows_pad - n_rows), (0, c_pad - c)))

    consts = _channel_constants(anchors, stride, num_classes, c_pad)

    kernel = partial(_decode_kernel, gx=gx, gy=gy, stride=stride)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, c_pad), jnp.float32),
        grid=(n_rows_pad // rows_tile,),
        in_specs=[
            pl.BlockSpec((8, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_tile, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(consts, flat.astype(jnp.float32))

    out = out[:n_rows, :c].reshape(b, gy * gx * a, per)
    return out


def _decode_compact_kernel(f_ref, o_ref, *, gx, gy, n_rows, rows_tile,
                           anchors, stride, num_classes, prob_thresh,
                           head_offset=None):
    """Fused compact decode of one row-tile of grid cells.

    Consumes the head map in its NATIVE lane layout — (cells, A·(5+C) pad
    128) — transposes the tile in-register (channels → sublanes, where any
    static offset is sliceable), and emits per-anchor (tlbr, thresholded
    score, class) as an already-transposed (32, cells) block. The XLA
    alternative must relayout the full map to an 85-lane minor dim, which
    measures 3.4 ms at 608/b128 for the 76² head alone — the relayout IS
    the decode cost (sigmoid+exp on the native layout is 0.77 ms).
    """
    per = 5 + num_classes
    tile = pl.program_id(0)

    ft = f_ref[:].astype(jnp.float32).T  # (C_pad, rows): channel = sublane
    rows = ft.shape[1]

    # global cell index per lane-position; batch component stripped
    gcell = (tile * rows_tile
             + jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1))
    valid = gcell < n_rows
    cell = gcell % (gx * gy)
    col = (cell % gx).astype(jnp.float32)
    row = (cell // gx).astype(jnp.float32)
    # tpu.iota is integer-only; cast after
    cls_iota = jax.lax.broadcasted_iota(
        jnp.int32, (num_classes, rows), 0).astype(jnp.float32)

    outs = []
    for ai, (aw, ah) in enumerate(anchors):
        base = ai * per
        tx = ft[base + 0:base + 1, :]
        ty = ft[base + 1:base + 2, :]
        tw = ft[base + 2:base + 3, :]
        th = ft[base + 3:base + 4, :]
        obj = ft[base + 4:base + 5, :]
        cls = ft[base + 5:base + per, :]          # (C, rows) sublane slice

        cx = (jax.nn.sigmoid(tx) + col) * jnp.float32(stride)
        cy = (jax.nn.sigmoid(ty) + row) * jnp.float32(stride)
        w = jnp.exp(jnp.minimum(tw, 60.0)) * jnp.float32(aw)
        h = jnp.exp(jnp.minimum(th, 60.0)) * jnp.float32(ah)

        m = jnp.max(cls, axis=0, keepdims=True)
        # first-argmax (reference semantics): min class index attaining m
        idx = jnp.min(jnp.where(cls >= m, cls_iota, jnp.float32(3e5)),
                      axis=0, keepdims=True)
        score = jax.nn.sigmoid(obj) * jax.nn.sigmoid(m)
        score = jnp.where((score >= prob_thresh) & valid, score, 0.0)

        if head_offset is None:
            cand = score * 0  # spare lane
        else:
            # global candidate index (anchor-major across heads): the sort
            # tie-break key of the packed-payload selection path; exact in
            # f32 (N < 2^24 for every supported resolution)
            cand = (cell.astype(jnp.float32)
                    + jnp.float32(head_offset + ai * gx * gy))
            cand = jnp.broadcast_to(cand, score.shape)
        outs.extend([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5,
                     score, idx, cand, score * 0])  # 8 rows per anchor
    outs.extend([outs[4] * 0] * (o_ref.shape[0] - len(outs)))
    o_ref[:] = jnp.concatenate(outs, axis=0)


def decode_packed_head_pallas(
    feat: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    stride: int,
    num_classes: int,
    prob_thresh: float = 0.0,
    head_offset: int = 0,
    rows_tile: int = 4096,
    interpret: bool = False,
):
    """Packed-payload variant of :func:`decode_compact_head_pallas`:
    → (payload (B, a·g², 8) f32, scores (B, a·g²) f32).

    Payload lanes are exactly the candidate record the pair-max NMS
    selection consumes (ops/nms.py::_select_pairmax): [x0, y0, x1, y1,
    thresholded score, class, global candidate index, 0]. The index rides
    lane 6 straight from the kernel (``head_offset`` + anchor-major local
    index), so the selection needs NO per-plane gathers, payload concat, or
    iota — one (g², A) transpose per head builds the whole record."""
    b, gy, gx, c = feat.shape
    a = len(anchors)
    if a > MAX_ANCHORS:
        raise ValueError(
            f"pallas packed decode supports <= {MAX_ANCHORS} anchors/head, "
            f"got {a} — use decode_impl='xla'")
    per = 5 + num_classes
    assert c == a * per
    interpret = interpret or jax.default_backend() == "cpu"
    c_pad = ((c + LANES - 1) // LANES) * LANES

    n_rows = b * gy * gx
    rows_tile = min(rows_tile, ((n_rows + 127) // 128) * 128)
    n_rows_pad = ((n_rows + rows_tile - 1) // rows_tile) * rows_tile
    flat = feat.reshape(n_rows, c)
    flat = jnp.pad(flat, ((0, n_rows_pad - n_rows), (0, c_pad - c)))

    kernel = partial(_decode_compact_kernel, gx=gx, gy=gy, n_rows=n_rows,
                     rows_tile=rows_tile, anchors=tuple(anchors),
                     stride=stride, num_classes=num_classes,
                     prob_thresh=float(prob_thresh),
                     head_offset=int(head_offset))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, n_rows_pad), jnp.float32),
        grid=(n_rows_pad // rows_tile,),
        in_specs=[pl.BlockSpec((rows_tile, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, rows_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat)

    recs = out[:, :n_rows]                     # (32, B·g²)
    # (B·g², 32) → (B, g², 4, 8) → anchor-major (B, 4, g², 8): ONE transpose
    payload = (recs.T.reshape(b, gy * gx, 4, 8).transpose(0, 2, 1, 3)
               .reshape(b, 4 * gy * gx, 8)[:, :a * gy * gx])
    scores = jnp.stack([out[8 * ai + 4, :n_rows] for ai in range(a)])
    scores = scores.reshape(a, b, gy * gx).transpose(1, 0, 2).reshape(b, -1)
    return payload, scores


def decode_packed_pallas(
    feats: Sequence[jax.Array],
    anchors_per_head,
    strides: Sequence[int],
    num_classes: int,
    prob_thresh: float = 0.0,
    interpret: bool = False,
):
    """Packed decode of every head → (payload (B, N, 8), scores (B, N)),
    candidate order identical to :func:`decode_compact_pallas` and encoded
    in payload lane 6 for exact selection tie-breaks."""
    parts = []
    off = 0
    for f, a, s in zip(feats, anchors_per_head, strides):
        parts.append(decode_packed_head_pallas(
            f, a, s, num_classes, prob_thresh=prob_thresh, head_offset=off,
            interpret=interpret))
        off += len(a) * f.shape[1] * f.shape[2]
    payload = jnp.concatenate([p[0] for p in parts], axis=1)
    scores = jnp.concatenate([p[1] for p in parts], axis=1)
    return payload, scores


def decode_compact_head_pallas(
    feat: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    stride: int,
    num_classes: int,
    prob_thresh: float = 0.0,
    rows_tile: int = 4096,
    interpret: bool = False,
):
    """Pallas fused compact decode of one head (VERDICT.md round-1 #4).

    (B, gy, gx, A*(5+C)) → (boxes (B, n, 4) f32, scores (B, n), classes
    (B, n) int32) with **anchor-major** candidate order n = a·g² + cell
    (NMS is order-agnostic: selection is by score). Scores below
    ``prob_thresh`` are zeroed in-kernel (the fused decode+threshold path).
    """
    b, gy, gx, c = feat.shape
    a = len(anchors)
    if a > MAX_ANCHORS:
        raise ValueError(
            f"pallas compact decode supports <= {MAX_ANCHORS} anchors/head, "
            f"got {a} — use decode_impl='xla'")
    per = 5 + num_classes
    assert c == a * per
    # Pallas compiles for TPU only; on the CPU backend (tests, virtual
    # meshes) the same kernel runs in interpret mode so every environment
    # exercises one code path.
    interpret = interpret or jax.default_backend() == "cpu"
    c_pad = ((c + LANES - 1) // LANES) * LANES

    n_rows = b * gy * gx
    rows_tile = min(rows_tile, ((n_rows + 127) // 128) * 128)
    n_rows_pad = ((n_rows + rows_tile - 1) // rows_tile) * rows_tile
    flat = feat.reshape(n_rows, c)
    flat = jnp.pad(flat, ((0, n_rows_pad - n_rows), (0, c_pad - c)))

    kernel = partial(_decode_compact_kernel, gx=gx, gy=gy, n_rows=n_rows,
                     rows_tile=rows_tile, anchors=tuple(anchors),
                     stride=stride, num_classes=num_classes,
                     prob_thresh=float(prob_thresh))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, n_rows_pad), jnp.float32),
        grid=(n_rows_pad // rows_tile,),
        in_specs=[pl.BlockSpec((rows_tile, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, rows_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat)

    out = out[:, :n_rows]
    boxes = jnp.stack([out[8 * ai:8 * ai + 4, :] for ai in range(a)])
    boxes = boxes.transpose(0, 2, 1).reshape(a, b, gy * gx, 4)
    boxes = boxes.transpose(1, 0, 2, 3).reshape(b, a * gy * gx, 4)
    scores = jnp.stack([out[8 * ai + 4, :] for ai in range(a)])
    scores = scores.reshape(a, b, gy * gx).transpose(1, 0, 2).reshape(b, -1)
    classes = jnp.stack([out[8 * ai + 5, :] for ai in range(a)])
    classes = (classes.reshape(a, b, gy * gx).transpose(1, 0, 2)
               .reshape(b, -1).astype(jnp.int32))
    return boxes, scores, classes


def decode_compact_pallas(
    feats: Sequence[jax.Array],
    anchors_per_head,
    strides: Sequence[int],
    num_classes: int,
    prob_thresh: float = 0.0,
    interpret: bool = False,
):
    """Pallas compact decode of every head → concatenated (boxes, scores,
    classes). Candidate order differs from :func:`decode.decode_compact`
    (anchor-major within each head) — NMS selection is order-independent,
    so detection SETS are identical; per-head blocks stay in head order."""
    parts = [
        decode_compact_head_pallas(f, a, s, num_classes,
                                   prob_thresh=prob_thresh,
                                   interpret=interpret)
        for f, a, s in zip(feats, anchors_per_head, strides)
    ]
    boxes = jnp.concatenate([p[0] for p in parts], axis=1)
    scores = jnp.concatenate([p[1] for p in parts], axis=1)
    classes = jnp.concatenate([p[2] for p in parts], axis=1)
    return boxes, scores, classes


def decode_all_pallas(
    feats: Sequence[jax.Array],
    anchors_per_head,
    strides: Sequence[int],
    num_classes: int,
    interpret: bool = False,
) -> jax.Array:
    """Pallas decode of every head, concatenated (B, N, 5+C)."""
    decoded = [
        decode_head_pallas(f, a, s, num_classes, interpret=interpret)
        for f, a, s in zip(feats, anchors_per_head, strides)
    ]
    return jnp.concatenate(decoded, axis=1)
