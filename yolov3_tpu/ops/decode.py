"""YOLO head decode: raw conv feature map → (cx, cy, w, h, obj, class...) boxes.

Reference behavior (SURVEY.md §2.6, ``yolov3/darknet.py`` yolo decode): per
head, view the ``(B, A*(5+C), g, g)`` map per-anchor, apply
``sigmoid(tx, ty)`` plus the cell's grid offset and multiply by the detection
stride, ``exp(tw, th) * anchor`` (anchors are in network-input pixels), and
``sigmoid`` on objectness and class scores. Output coordinates are center-xywh
in network-input pixel space; heads concatenate to ``(B, ΣA·g², 5+C)``.

TPU design: our feature maps are NHWC ``(B, g, g, A*(5+C))`` so the reshape to
``(B, g, g, A, 5+C)`` is free (last-axis split). The whole decode is a single
fused elementwise pass over the map — XLA fuses it into the producing conv's
epilogue. A Pallas fused-decode kernel (``impl="pallas"``) covers the case
where we want decode + score-threshold fused in one VMEM pass (see
``ops/pallas_decode.py``).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def decode_head(
    feat: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    stride: int,
    num_classes: int,
) -> jax.Array:
    """Decode one head's raw NHWC map to ``(B, g*g*A, 5+C)`` net-pixel boxes.

    ``feat``: (B, gy, gx, A*(5+C)) raw conv output.
    ``stride``: net-input pixels per grid cell (net_size / g).
    """
    b, gy, gx, _ = feat.shape
    a = len(anchors)
    c = num_classes
    f = feat.reshape(b, gy, gx, a, 5 + c)

    # grid cell offsets — broadcasted iota keeps everything ≥2D for TPU
    col = jax.lax.broadcasted_iota(f.dtype, (gy, gx, a), 1)
    row = jax.lax.broadcasted_iota(f.dtype, (gy, gx, a), 0)

    anchor_wh = jnp.asarray(anchors, dtype=f.dtype)  # (A, 2), net-input px

    xy = (jax.nn.sigmoid(f[..., 0:2])
          + jnp.stack([col, row], axis=-1)) * jnp.asarray(stride, f.dtype)
    # clamp exp argument: fp32 exp overflows past ~88 and bf16 far earlier
    # (SURVEY.md §7 hazard 2); 60 preserves ordering for any real weight file
    wh = jnp.exp(jnp.minimum(f[..., 2:4], 60.0)) * anchor_wh
    conf = jax.nn.sigmoid(f[..., 4:])  # objectness + classes in one sigmoid

    out = jnp.concatenate([xy, wh, conf], axis=-1)
    return out.reshape(b, gy * gx * a, 5 + c)


def decode_all(
    feats: Sequence[jax.Array],
    anchors_per_head: Sequence[Tuple[Tuple[float, float], ...]],
    strides: Sequence[int],
    num_classes: int,
) -> jax.Array:
    """Decode every head and concatenate to ``(B, N, 5+C)`` (reference layout)."""
    decoded = [
        decode_head(f, a, s, num_classes)
        for f, a, s in zip(feats, anchors_per_head, strides)
    ]
    return jnp.concatenate(decoded, axis=1)


def decode_compact_head(
    feat: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    stride: int,
    num_classes: int,
):
    """Decode + per-anchor score/class reduction in one fused pass.

    Emits only what NMS consumes — tlbr boxes, score = sigmoid(obj) ×
    max(sigmoid(cls)), argmax class — so the serving pipeline never
    materializes the (B, N, 5+C) tensor in HBM (6/85ths of the write
    bandwidth at C=80; ~15 ms/step saved at 608/batch-32 on v5e). The
    class reduction runs on logits (sigmoid is monotonic), then a single
    sigmoid on the max.

    Decode math runs fp32 regardless of the conv compute dtype — exp/sigmoid
    on bf16 logits would cost box accuracy for no bandwidth win.
    """
    b, gy, gx, _ = feat.shape
    a = len(anchors)
    c = num_classes
    f = feat.reshape(b, gy, gx, a, 5 + c).astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.float32, (gy, gx, a), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (gy, gx, a), 0)
    anchor_wh = jnp.asarray(anchors, dtype=jnp.float32)

    xy = (jax.nn.sigmoid(f[..., 0:2])
          + jnp.stack([col, row], axis=-1)) * jnp.float32(stride)
    wh = jnp.exp(jnp.minimum(f[..., 2:4], 60.0)) * anchor_wh
    half = wh * 0.5
    boxes = jnp.concatenate([xy - half, xy + half], axis=-1)  # tlbr

    obj = jax.nn.sigmoid(f[..., 4])
    cls_logit_max = jnp.max(f[..., 5:], axis=-1)
    cls_idx = jnp.argmax(f[..., 5:], axis=-1).astype(jnp.int32)
    score = obj * jax.nn.sigmoid(cls_logit_max)

    n = gy * gx * a
    return (boxes.reshape(b, n, 4), score.reshape(b, n),
            cls_idx.reshape(b, n))


def decode_compact(
    feats: Sequence[jax.Array],
    anchors_per_head: Sequence[Tuple[Tuple[float, float], ...]],
    strides: Sequence[int],
    num_classes: int,
):
    """Compact decode of every head → (boxes (B,N,4), scores (B,N),
    classes (B,N)) concatenated in reference head order."""
    parts = [
        decode_compact_head(f, a, s, num_classes)
        for f, a, s in zip(feats, anchors_per_head, strides)
    ]
    boxes = jnp.concatenate([p[0] for p in parts], axis=1)
    scores = jnp.concatenate([p[1] for p in parts], axis=1)
    classes = jnp.concatenate([p[2] for p in parts], axis=1)
    return boxes, scores, classes
