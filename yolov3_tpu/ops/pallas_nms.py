"""Pallas TPU kernel: IoU matrix + greedy class-aware suppression in VMEM.

Replaces the two densest stages of ``ops/nms.py`` (the K×K IoU matrix and the
sequential greedy scan) with a single kernel instance per image: candidate
boxes/classes load into VMEM once, the conflict matrix materializes in a VMEM
scratch (K=512 → 1 MB fp32), and the greedy pass runs as a ``fori_loop`` of
fully vectorized (1, K) row updates over that scratch — no HBM round-trip
between the stages and no dynamic lane indexing (the keep-vector update is a
lane-mask select). Score thresholding and top-k stay in XLA (they fuse with
decode).

Grid: one program per batch image. Semantics identical to
``ops.nms._greedy_suppress`` (exact greedy in score-desc order).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, cls_valid_ref, keep_ref, conflict_scratch,
                kept_scratch, *, iou_thresh):
    k = boxes_ref.shape[0]
    x1 = boxes_ref[:, 0:1]
    y1 = boxes_ref[:, 1:2]
    x2 = boxes_ref[:, 2:3]
    y2 = boxes_ref[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (K, 1)

    # row 0: class ids (as f32), row 1: valid mask — both (1, K) lane-major
    cls_row = cls_valid_ref[0:1, :]
    valid_row = cls_valid_ref[1:2, :]

    ix1 = jnp.maximum(x1, x1.reshape(1, k))
    iy1 = jnp.maximum(y1, y1.reshape(1, k))
    ix2 = jnp.minimum(x2, x2.reshape(1, k))
    iy2 = jnp.minimum(y2, y2.reshape(1, k))
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area + area.reshape(1, k) - inter
    iou = inter / jnp.maximum(union, 1e-9)

    same_class = cls_row.reshape(k, 1) == cls_row  # (K, K)
    conflict_scratch[:] = jnp.where((iou > iou_thresh) & same_class, 1.0, 0.0)

    kept_scratch[:] = jnp.zeros_like(kept_scratch)
    lane = lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        row = conflict_scratch[pl.ds(i, 1), :]        # (1, K) conflicts of i
        kept = kept_scratch[0:1, :]                   # (1, K)
        suppressed = jnp.sum(row * kept) > 0.0
        new_val = jnp.where(suppressed, 0.0, 1.0) * valid_row
        kept_scratch[0:1, :] = jnp.where(lane == i, new_val, kept)
        return 0

    lax.fori_loop(0, k, body, 0)
    keep_ref[:] = kept_scratch[:]


def pallas_suppress(boxes: jax.Array, classes: jax.Array, valid: jax.Array,
                    iou_thresh: float, interpret: bool = False) -> jax.Array:
    """Greedy class-aware suppression.

    boxes: (B, K, 4) tlbr, score-desc sorted; classes: (B, K) int32;
    valid: (B, K) bool. Returns keep mask (B, K) bool.
    """
    b, k, _ = boxes.shape
    # boxes: lane-pad 4 → 128 (sublane dim K is the tall axis)
    boxes_p = jnp.pad(boxes.astype(jnp.float32), ((0, 0), (0, 0), (0, 124)))
    # classes+valid: two (1, K) rows, sublane-padded to the 8-row minimum tile
    cls_valid = jnp.stack([classes.astype(jnp.float32),
                           valid.astype(jnp.float32)], axis=1)  # (B, 2, K)
    cls_valid = jnp.pad(cls_valid, ((0, 0), (0, 6), (0, 0)))     # (B, 8, K)

    kernel = partial(_nms_kernel, iou_thresh=iou_thresh)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 8, k), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k, k), jnp.float32),
            pltpu.VMEM((8, k), jnp.float32),
        ],
        interpret=interpret,
    )(boxes_p, cls_valid)
    return keep[:, 0, :] > 0.5
