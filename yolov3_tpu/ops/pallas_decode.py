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
from typing import Optional, Sequence, Tuple

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


def _divisor_rows_tile(n_rows: int, cap: int = 4096) -> int:
    """Largest multiple-of-128 divisor of ``n_rows`` up to ``cap``.

    A divisor tile means the kernel input is a pure reshape — ``jnp.pad``
    on a non-divisor row count materializes a full copy of the head map
    (659 MB for the 76² head at b128@608, ~1.6 ms of pure pad traffic)
    because custom-call operands cannot fuse the pad away. b·g² for the
    yolov3 heads is always 2^k·361-shaped, so a divisor ≤4096 exists at
    every serving batch; fall back to the padded path otherwise."""
    best = 0
    t = 128
    while t <= min(cap, n_rows):
        if n_rows % t == 0:
            best = t
        t += 128
    return best


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


def _decode_ft_records(ft, *, gx, gy, n_rows, rows_tile, anchors, stride,
                       num_classes, prob_thresh, head_offset, n_out):
    """Decode one transposed f32 tile ``ft`` (C_pad, rows) — channel =
    sublane — into the (n_out, rows) record block. Shared body of the
    compact/packed kernel (which transposes the head map in-register) and
    the head-fused kernel (which produces ``ft`` straight from an in-kernel
    MXU projection of the pre-head activation)."""
    per = 5 + num_classes
    tile = pl.program_id(0)
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
    outs.extend([outs[4] * 0] * (n_out - len(outs)))
    return jnp.concatenate(outs, axis=0)           # (n_out, rows)


def _decode_compact_kernel(f_ref, o_ref, *, gx, gy, n_rows, rows_tile,
                           anchors, stride, num_classes, prob_thresh,
                           head_offset=None, out_rows=False):
    """Fused compact decode of one row-tile of grid cells.

    Consumes the head map in its NATIVE lane layout — (cells, A·(5+C) pad
    128) — transposes the tile in-register (channels → sublanes, where any
    static offset is sliceable), and emits per-anchor (tlbr, thresholded
    score, class) as an already-transposed (32, cells) block. The XLA
    alternative must relayout the full map to an 85-lane minor dim, which
    measures 3.4 ms at 608/b128 for the 76² head alone — the relayout IS
    the decode cost (sigmoid+exp on the native layout is 0.77 ms).
    """
    ft = f_ref[:].astype(jnp.float32).T  # (C_pad, rows): channel = sublane
    n_out = 32 if out_rows else o_ref.shape[0]
    res = _decode_ft_records(
        ft, gx=gx, gy=gy, n_rows=n_rows, rows_tile=rows_tile,
        anchors=anchors, stride=stride, num_classes=num_classes,
        prob_thresh=prob_thresh, head_offset=head_offset, n_out=n_out)
    if out_rows:
        # back-transpose the small record block in-register: the record
        # emits natively as (cells, 32) and the XLA-side payload build
        # becomes a reshape instead of a (32, N) relayout
        o_ref[:] = res.T
    else:
        o_ref[:] = res


def _projection_matrix(anchors, num_classes, c_pad):
    """(c_pad, 32) one-hot: head channel [tx,ty,tw,th,obj] of anchor ai →
    output lane 8·ai+k. One MXU dot extracts all 15 box/objectness channels
    from the native-layout tile — exact (one-hot times bf16 input keeps the
    input bits; f32 accumulation of a single term)."""
    per = 5 + num_classes
    p = np.zeros((c_pad, 32), np.float32)
    for ai in range(len(anchors)):
        for k in range(5):
            p[ai * per + k, 8 * ai + k] = 1.0
    return jnp.asarray(p)


def _decode_packed_kernel_noT(f_ref, proj_ref, o_ref, *, gx, gy, n_rows,
                              rows_tile, anchors, stride, num_classes,
                              prob_thresh, head_offset):
    """Transpose-free packed decode (round 3).

    The original kernel (:func:`_decode_compact_kernel`) transposes the full
    (rows, 384)-lane tile so channels become sublanes — the transpose and
    the (32, cells) output it forces (plus the XLA-side re-transpose of the
    record) measure ~5-7 ms/step at 608/b128 (tools/probe_decode.py). Here
    the tile stays in its NATIVE layout end to end:

    * one one-hot MXU projection pulls the 15 box/obj channels into an
      anchor-blocked 32-lane tile (lane 8·ai+k) — no lane slicing needed;
    * class max/argmax per anchor are masked LANE reductions over the raw
      tile (sigmoid is monotone: reduce logits, sigmoid the max);
    * box corner math crosses lanes via two static ``pltpu.roll``s
      (cx,cy ± w,h/2 land on lanes 8·ai+{0..3});
    * the record emits natively as (cells, 32) — payload build on the XLA
      side becomes a reshape instead of a (32, N) transpose.

    Bit-compatible with the transposing kernel (same math, same order).
    """
    per = 5 + num_classes
    tile = pl.program_id(0)
    f = f_ref[:]                       # (rows, c_pad) bf16/f32, native layout
    rows = f.shape[0]
    c_pad = f.shape[1]

    # channel-lane metadata at FULL tile shape: Mosaic cannot relayout an
    # i1 compare result against a (1, c_pad) sublane-replicated mask
    # ("non-singleton logical dimension is replicated in destination"), so
    # every mask that meets a (rows, c_pad) value is built at (rows, c_pad)
    ch = jax.lax.broadcasted_iota(jnp.int32, (rows, c_pad), 1)
    k = ch % per
    a = len(anchors)

    # per-cell geometry, (rows, 1)
    gcell = (tile * rows_tile
             + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0))
    valid = gcell < n_rows
    cell = gcell % (gx * gy)
    col = (cell % gx).astype(jnp.float32)
    row = (cell // gx).astype(jnp.float32)

    # [tx,ty,tw,th,obj] per anchor → lanes 8ai+0..4 (one exact MXU dot).
    # precision=HIGHEST is required for exactness on f32 inputs: Mosaic's
    # default lowers the dot through ONE bf16 pass, which truncates the
    # input mantissa (caught compiled on-chip by tools/tpu_check.py's
    # variant gate — interpret mode computes the dot exactly and hid it).
    # HIGHEST decomposes each f32 operand into bf16 limbs, and a one-hot
    # row picks up every limb of exactly one element with f32
    # accumulation, so the input bits survive; bf16 inputs are exact in
    # a single pass either way.
    sel = jax.lax.dot_general(
        f, proj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)     # (rows, 32)

    lane32 = jax.lax.broadcasted_iota(jnp.int32, (rows, 32), 1)
    k32 = lane32 % 8
    a32 = lane32 // 8
    is_anchor = a32 < a
    is_x, is_y = (k32 == 0) & is_anchor, (k32 == 1) & is_anchor
    is_w, is_h = (k32 == 2) & is_anchor, (k32 == 3) & is_anchor
    is_score = (k32 == 4) & is_anchor
    is_cls, is_cand = (k32 == 5) & is_anchor, (k32 == 6) & is_anchor

    sig = jax.nn.sigmoid(sel)
    expo = jnp.exp(jnp.minimum(sel, 60.0))
    anchor_vec = jnp.zeros((1, 32), jnp.float32)
    for ai, (aw, ah) in enumerate(anchors):
        one_w = (lane32[:1] == 8 * ai + 2).astype(jnp.float32)
        one_h = (lane32[:1] == 8 * ai + 3).astype(jnp.float32)
        anchor_vec = anchor_vec + jnp.float32(aw) * one_w \
            + jnp.float32(ah) * one_h
    offs = col * (is_x.astype(jnp.float32)) + row * (is_y.astype(jnp.float32))
    cxy = (sig + offs) * jnp.float32(stride)     # valid on xy lanes
    wh = expo * anchor_vec                       # valid on wh lanes

    # class max + first-argmax per anchor: masked lane reductions on logits
    score_fac = jnp.zeros((rows, 32), jnp.float32)
    cls_term = jnp.zeros((rows, 32), jnp.float32)
    cand_term = jnp.zeros((rows, 32), jnp.float32)
    cls_lane_iota = (k - 5).astype(jnp.float32)  # class id per head lane
    # f32 working copy for the class reductions: bf16 compares against a
    # broadcast max hit a Mosaic relayout hole ("non-singleton logical
    # dimension is replicated in destination but not in source" on the i1
    # ge result) in every formulation tried; the f32 form compiles. The
    # cast is exact, so results are identical — rows_tile=1024 keeps the
    # resulting scoped-vmem stack under Mosaic's 16M limit.
    ff = f.astype(jnp.float32)
    for ai in range(a):
        m_cls = (ch >= ai * per + 5) & (ch < (ai + 1) * per)
        masked = jnp.where(m_cls, ff, -jnp.inf)        # (rows, c_pad) f32
        m = jnp.max(masked, axis=1, keepdims=True)
        # masked ≥ m folds the class mask in (non-class lanes are -inf and
        # cannot attain the max); both compare operands are full-shape
        idx = jnp.min(jnp.where(masked >= jnp.broadcast_to(m, masked.shape),
                                cls_lane_iota, jnp.float32(3e5)),
                      axis=1, keepdims=True)
        one_sc = (lane32 == 8 * ai + 4).astype(jnp.float32)
        one_cl = (lane32 == 8 * ai + 5).astype(jnp.float32)
        one_cd = (lane32 == 8 * ai + 6).astype(jnp.float32)
        score_fac = score_fac + jax.nn.sigmoid(m) * one_sc
        cls_term = cls_term + idx * one_cl
        cand_term = cand_term + (
            cell.astype(jnp.float32)
            + jnp.float32(head_offset + ai * gx * gy)) * one_cd

    score = sig * score_fac                      # sig(obj)·sig(max cls)
    score = jnp.where((score >= prob_thresh) & valid, score, 0.0)

    # corner math across lanes: two static rolls align w,h under cx,cy
    half_wh = wh * 0.5
    wh_at_xy = pltpu.roll(half_wh, shift=30, axis=1)   # w,h → lanes 8ai+0,1
    # (roll shift must be non-negative: -2 ≡ +30 mod 32 lanes)
    cxy_at_wh = pltpu.roll(cxy, shift=2, axis=1)       # cx,cy → lanes 8ai+2,3
    x0y0 = (cxy - wh_at_xy) * (is_x | is_y).astype(jnp.float32)
    x1y1 = (cxy_at_wh + half_wh) * (is_w | is_h).astype(jnp.float32)

    out = (x0y0 + x1y1
           + score * is_score.astype(jnp.float32)
           + cls_term * is_cls.astype(jnp.float32)
           + cand_term * is_cand.astype(jnp.float32))
    o_ref[:] = out


def decode_packed_head_pallas_noT(
    feat: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    stride: int,
    num_classes: int,
    prob_thresh: float = 0.0,
    head_offset: int = 0,
    rows_tile: int = 1024,
    interpret: bool = False,
):
    """Transpose-free packed decode of one head → (payload (B, a·g², 8) f32,
    scores (B, a·g²) f32). Same record contract as
    :func:`decode_packed_head_pallas`; candidate order identical; validated
    bit-exact against it compiled on-chip.

    **Measured SLOWER than the transposing kernel** (9.92 vs 4.08 ms for
    all three heads at b128@608, tools/bench_decode_kernel.py): the six
    full-tile masked lane reductions + the f32 working copy outweigh the
    transpose they replace, and the 1024-row tile (forced by Mosaic's 16M
    scoped-vmem limit on those temporaries) quadruples grid steps. Kept as
    a documented negative result; the shipped decode win is the zero-copy
    kernel FEED instead (``model.pad_head_params`` + divisor row tiles)."""
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
    proj = _projection_matrix(anchors, num_classes, c_pad).astype(flat.dtype)

    kernel = partial(_decode_packed_kernel_noT, gx=gx, gy=gy, n_rows=n_rows,
                     rows_tile=rows_tile, anchors=tuple(anchors),
                     stride=stride, num_classes=num_classes,
                     prob_thresh=float(prob_thresh),
                     head_offset=int(head_offset))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, 32), jnp.float32),
        grid=(n_rows_pad // rows_tile,),
        in_specs=[
            pl.BlockSpec((rows_tile, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_tile, 32), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, proj)

    recs = out[:n_rows]                           # (B·g², 32) — native layout
    payload = (recs.reshape(b, gy * gx, 4, 8).transpose(0, 2, 1, 3)
               .reshape(b, 4 * gy * gx, 8)[:, :a * gy * gx])
    scores = payload[:, :, 4]
    return payload, scores


def _payload_from_cols(out, b, gy, gx, a, n_rows):
    """(32, n_rows_pad) kernel output → (payload (B, a·g², 8), scores
    (B, a·g²)) in anchor-major candidate order. Shared by the packed and
    head-fused kernels."""
    recs = out[:, :n_rows]                     # (32, B·g²)
    # (B·g², 32) → (B, g², 4, 8) → anchor-major (B, 4, g², 8): ONE transpose
    payload = (recs.T.reshape(b, gy * gx, 4, 8).transpose(0, 2, 1, 3)
               .reshape(b, 4 * gy * gx, 8)[:, :a * gy * gx])
    scores = jnp.stack([out[8 * ai + 4, :n_rows] for ai in range(a)])
    scores = scores.reshape(a, b, gy * gx).transpose(1, 0, 2).reshape(b, -1)
    return payload, scores


def _decode_packed_fused_kernel(x_ref, w_ref, b_ref, o_ref, *, gx, gy,
                                n_rows, rows_tile, anchors, stride,
                                num_classes, prob_thresh, head_offset,
                                dot_precision):
    """Head-conv-FUSED packed decode (round 3).

    Consumes the PRE-head activation tile (rows, Cin) and the head conv's
    1×1 weights (Cin, C_pad): the head projection runs as one in-kernel MXU
    dot with f32 accumulation, bias adds in-register, and the result feeds
    the shared decode body already transposed — the (B, g, g, C_pad) head
    map (745 MB/step at 608/b128 across the three heads) never exists in
    HBM. Without fusion that map is written by the XLA conv and immediately
    re-read by the opaque decode custom call — ~1.8 ms/step of round-trip
    traffic no kernel tuning can remove (tools/probe_decode.py).
    """
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision)                   # (rows, C_pad) f32
    acc = acc + b_ref[0:1, :].astype(jnp.float32)  # head conv bias (no BN)
    ft = acc.T                                     # channel = sublane
    o_ref[:] = _decode_ft_records(
        ft, gx=gx, gy=gy, n_rows=n_rows, rows_tile=rows_tile,
        anchors=anchors, stride=stride, num_classes=num_classes,
        prob_thresh=prob_thresh, head_offset=head_offset,
        n_out=o_ref.shape[0])


def fused_head_supported(cin: int, anchors) -> bool:
    """Head-fusion eligibility: the pre-head channel count must already sit
    on the lane boundary (no way to pad the activation without the full-map
    copy fusion exists to avoid) and the anchor count must fit the record
    block. True for every published yolov3 variant (Cin 256/512/1024)."""
    return cin % LANES == 0 and len(anchors) <= MAX_ANCHORS


def decode_packed_head_fused_pallas(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    stride: int,
    num_classes: int,
    prob_thresh: float = 0.0,
    head_offset: int = 0,
    interpret: bool = False,
    precision: Optional[str] = None,
):
    """Packed decode of one head FUSED with its 1×1 head conv.

    ``x``: pre-head activation (B, gy, gx, Cin), Cin % 128 == 0;
    ``w``: head conv weights (Cin, C_pad) with C_pad lane-aligned and the
    channels ≥ a·(5+C) zero (``model.pad_head_params`` form, reshaped);
    ``bias``: (C_pad,). Record contract identical to
    :func:`decode_packed_head_pallas` (same candidate order, same
    thresholding); numerics differ from the unfused bf16 path only by the
    head projection accumulating in f32 without an intermediate bf16
    rounding of the head map.
    """
    b, gy, gx, cin = x.shape
    a = len(anchors)
    if not fused_head_supported(cin, anchors):
        raise ValueError(
            f"fused packed decode needs Cin % {LANES} == 0 and <= "
            f"{MAX_ANCHORS} anchors/head, got Cin={cin}, {a} anchors")
    per = 5 + num_classes
    c_pad = w.shape[1]
    assert w.shape[0] == cin and c_pad % LANES == 0 and c_pad >= a * per, \
        f"head weights {w.shape} vs Cin={cin}, need lane-padded >= {a * per}"
    interpret = interpret or jax.default_backend() == "cpu"

    n_rows = b * gy * gx
    # VMEM-aware row tile: the x tile is double-buffered across grid steps
    # and the dot result + its transpose are both live → budget
    # rows · (2·Cin·itemsize + 2·C_pad·4) ≲ 13 MB (Mosaic's scoped-vmem
    # ceiling is 16 MB; headroom for masks/temporaries)
    per_row = 2 * cin * x.dtype.itemsize + 2 * c_pad * 4
    cap = max(128, min(4096, int(13e6 / per_row) // 128 * 128))
    div = _divisor_rows_tile(n_rows, cap)
    rows_tile = div if div >= 512 else min(cap, ((n_rows + 127) // 128) * 128)
    n_rows_pad = ((n_rows + rows_tile - 1) // rows_tile) * rows_tile
    flat = x.reshape(n_rows, cin)
    if n_rows_pad != n_rows:
        # non-divisor fallback (deep heads at large Cin): the pad copies the
        # PRE-head activation (≤ ~95 MB at b128@608 head-2) — still far
        # cheaper than the full head map the unfused path round-trips
        flat = jnp.pad(flat, ((0, n_rows_pad - n_rows), (0, 0)))

    # bias as an (8, C_pad) sublane-aligned block, row 0 live
    bias_blk = jnp.zeros((8, c_pad), jnp.float32).at[0].set(
        bias.astype(jnp.float32))

    # the in-kernel projection matches the unfused path's conv numerics:
    # default precision for the bf16 serving tiers (one MXU pass, same as
    # the XLA bf16 conv), HIGHEST for fp32 parity runs (Mosaic's default
    # on f32 operands is a single truncating bf16 pass — far below the
    # fp32-`highest` conv the unfused comparison path runs)
    dot_precision = (jax.lax.Precision.HIGHEST
                     if precision == "highest" else None)
    kernel = partial(_decode_packed_fused_kernel, gx=gx, gy=gy,
                     n_rows=n_rows, rows_tile=rows_tile,
                     anchors=tuple(anchors), stride=stride,
                     num_classes=num_classes, prob_thresh=float(prob_thresh),
                     head_offset=int(head_offset),
                     dot_precision=dot_precision)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, n_rows_pad), jnp.float32),
        grid=(n_rows_pad // rows_tile,),
        in_specs=[
            pl.BlockSpec((rows_tile, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, rows_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, w.astype(x.dtype), bias_blk)

    return _payload_from_cols(out, b, gy, gx, a, n_rows)


def decode_packed_fused_pallas(
    pre_heads: Sequence[jax.Array],
    head_weights: Sequence[jax.Array],
    head_biases: Sequence[jax.Array],
    anchors_per_head,
    strides: Sequence[int],
    num_classes: int,
    prob_thresh: float = 0.0,
    interpret: bool = False,
    precision: Optional[str] = None,
):
    """Head-fused packed decode of every head → (payload (B, N, 8), scores
    (B, N)); candidate order identical to :func:`decode_packed_pallas`."""
    parts = []
    off = 0
    for x, w, bias, a, s in zip(pre_heads, head_weights, head_biases,
                                anchors_per_head, strides):
        parts.append(decode_packed_head_fused_pallas(
            x, w, bias, a, s, num_classes, prob_thresh=prob_thresh,
            head_offset=off, interpret=interpret, precision=precision))
        off += len(a) * x.shape[1] * x.shape[2]
    payload = jnp.concatenate([p[0] for p in parts], axis=1)
    scores = jnp.concatenate([p[1] for p in parts], axis=1)
    return payload, scores


def decode_packed_head_pallas(
    feat: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    stride: int,
    num_classes: int,
    prob_thresh: float = 0.0,
    head_offset: int = 0,
    rows_tile: int = 4096,
    interpret: bool = False,
    out_rows: bool = False,
):
    """Packed-payload variant of :func:`decode_compact_head_pallas`:
    → (payload (B, a·g², 8) f32, scores (B, a·g²) f32).

    ``out_rows=True`` back-transposes the 32-row record block in-register
    and emits (cells, 32) so the XLA-side payload build is a pure reshape —
    **measured SLOWER** (5.29 vs 4.02 ms all-heads at b128@608,
    tools/bench_decode_kernel.py: the in-register back-transpose costs more
    than the XLA relayout it saves). Kept as a documented negative result;
    default stays the (32, cells) form.

    Payload lanes are exactly the candidate record the pair-max NMS
    selection consumes (ops/nms.py::_select_pairmax): [x0, y0, x1, y1,
    thresholded score, class, global candidate index, 0]. The index rides
    lane 6 straight from the kernel (``head_offset`` + anchor-major local
    index), so the selection needs NO per-plane gathers, payload concat, or
    iota — one (g², A) transpose per head builds the whole record.

    ``feat`` may arrive with its channel dim already padded to the lane
    boundary (c = 128k ≥ a·(5+C), zero-filled — see
    ``model.pad_head_params``): together with a divisor row tile this makes
    the kernel input a PURE RESHAPE of the head conv's output instead of a
    full-map pad copy (round 3; ~2 ms/step at 608/b128)."""
    b, gy, gx, c = feat.shape
    a = len(anchors)
    if a > MAX_ANCHORS:
        raise ValueError(
            f"pallas packed decode supports <= {MAX_ANCHORS} anchors/head, "
            f"got {a} — use decode_impl='xla'")
    per = 5 + num_classes
    assert c == a * per or (c % LANES == 0 and c >= a * per), \
        f"head channels {c} != {a}*{per} (or lane-padded)"
    interpret = interpret or jax.default_backend() == "cpu"
    c_pad = ((c + LANES - 1) // LANES) * LANES

    n_rows = b * gy * gx
    div = _divisor_rows_tile(n_rows, rows_tile)
    rows_tile = div or min(rows_tile, ((n_rows + 127) // 128) * 128)
    n_rows_pad = ((n_rows + rows_tile - 1) // rows_tile) * rows_tile
    flat = feat.reshape(n_rows, c)
    if n_rows_pad != n_rows or c_pad != c:
        flat = jnp.pad(flat, ((0, n_rows_pad - n_rows), (0, c_pad - c)))

    kernel = partial(_decode_compact_kernel, gx=gx, gy=gy, n_rows=n_rows,
                     rows_tile=rows_tile, anchors=tuple(anchors),
                     stride=stride, num_classes=num_classes,
                     prob_thresh=float(prob_thresh),
                     head_offset=int(head_offset), out_rows=out_rows)
    out_shape = ((n_rows_pad, 32) if out_rows else (32, n_rows_pad))
    out_spec = (pl.BlockSpec((rows_tile, 32), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) if out_rows
                else pl.BlockSpec((32, rows_tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(n_rows_pad // rows_tile,),
        in_specs=[pl.BlockSpec((rows_tile, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        interpret=interpret,
    )(flat)

    if out_rows:
        recs = out[:n_rows]                    # (B·g², 32) — native layout
        payload = (recs.reshape(b, gy * gx, 4, 8).transpose(0, 2, 1, 3)
                   .reshape(b, 4 * gy * gx, 8)[:, :a * gy * gx])
        scores = payload[:, :, 4]
        return payload, scores
    return _payload_from_cols(out, b, gy, gx, a, n_rows)


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
    assert c == a * per or (c % LANES == 0 and c >= a * per), \
        f"head channels {c} != {a}*{per} (or lane-padded)"
    # Pallas compiles for TPU only; on the CPU backend (tests, virtual
    # meshes) the same kernel runs in interpret mode so every environment
    # exercises one code path.
    interpret = interpret or jax.default_backend() == "cpu"
    c_pad = ((c + LANES - 1) // LANES) * LANES

    n_rows = b * gy * gx
    div = _divisor_rows_tile(n_rows, rows_tile)
    rows_tile = div or min(rows_tile, ((n_rows + 127) // 128) * 128)
    n_rows_pad = ((n_rows + rows_tile - 1) // rows_tile) * rows_tile
    flat = feat.reshape(n_rows, c)
    if n_rows_pad != n_rows or c_pad != c:
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
