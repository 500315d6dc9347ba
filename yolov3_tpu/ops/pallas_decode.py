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
