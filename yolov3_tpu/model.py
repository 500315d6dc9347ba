"""Functional NHWC forward pass: one graph walk → one jitted XLA computation.

The reference's ``Darknet.forward`` (SURVEY.md §3.4) iterates ~106 ``nn.Module``
objects per step in Python, caching *every* layer output for route/shortcut.
Here the lowered :class:`~yolov3_tpu.graph.Graph` is walked **once at trace
time** by a pure function; XLA sees a single static computation with:

* convs as ``lax.conv_general_dilated`` NHWC/HWIO (MXU-tiled by XLA), bias and
  LeakyReLU fused into the conv epilogue by XLA;
* BN already folded into conv weights at load (``weights.py``) — no BN ops;
* route = channel concat, shortcut = elementwise add, upsample = nearest ×2
  via ``jnp.repeat`` (bit-identical to ``nn.Upsample(mode="nearest")``);
* only outputs on a route/shortcut/head edge are kept live (``Graph.
  needed_outputs``) — the rest are free for XLA to schedule/fuse away.

Precision: TPU matmul/conv default passes use bf16 multiplies, which breaks
the IoU>0.99 parity contract (SURVEY.md §7 phase 2). ``precision="highest"``
pins fp32 convs for parity; ``precision=None`` (default) lets XLA pick the
fast path for throughput.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .graph import Graph, Node
from .ops.decode import decode_all

_PRECISIONS = {
    None: None,
    "default": None,
    "bf16": None,  # compute dtype switch, not an XLA precision level
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def _conv(x: jax.Array, w: jax.Array, b: jax.Array, node: Node,
          precision, conv_impl: str = "xla") -> jax.Array:
    if conv_impl == "pallas":
        # pipelined roll variant: slab reused across cout tiles, DMA
        # double-buffered across grid steps, divisor row tiles
        # (tools/bench_pallas_conv.py; 0.68-0.79x XLA's conv at b128 under
        # the hardened round-2 harness - XLA's conv runs at 150-198 TF/s,
        # 76-100% of v5e bf16 peak, on these shapes)
        from .ops.pallas_conv import conv3x3_fused_roll2, supported

        if node.pad and supported(node.size, node.stride, w.shape[2],
                                  node.activation):
            return conv3x3_fused_roll2(x, w.astype(x.dtype), b,
                                       activation=node.activation)
    pad = node.size // 2 if node.pad else 0
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(node.stride, node.stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    y = y + b.astype(y.dtype)
    if node.activation == "leaky":
        y = jnp.where(y > 0, y, 0.1 * y)
    elif node.activation == "relu":
        y = jnp.maximum(y, 0)
    elif node.activation != "linear":
        raise ValueError(f"unsupported activation {node.activation!r}")
    return y


def _maxpool(x: jax.Array, node: Node) -> jax.Array:
    # darknet rule: total pad = node.padding (default size-1), low = pad//2.
    lo = node.padding // 2
    hi = node.padding - lo
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, node.size, node.size, 1),
        window_strides=(1, node.stride, node.stride, 1),
        padding=((0, 0), (lo, hi), (lo, hi), (0, 0)),
    )


def _upsample_nearest(x: jax.Array, stride: int) -> jax.Array:
    return jnp.repeat(jnp.repeat(x, stride, axis=1), stride, axis=2)


def forward_features(
    graph: Graph,
    params: Dict[int, Dict[str, jax.Array]],
    x: jax.Array,
    precision: Optional[str] = None,
    conv_impl: str = "xla",
    stop_before_heads: bool = False,
) -> List[jax.Array]:
    """Walk the graph; return the raw NHWC feature map feeding each yolo head.

    ``x``: (B, H, W, C) float input in [0, 1]. ``conv_impl="pallas"`` routes
    eligible 3×3/s1 convs through the fused Pallas kernel (ops/pallas_conv).
    ``stop_before_heads=True`` returns the PRE-head activations instead —
    the 1×1 head convs are skipped entirely (their projection runs inside
    the fused Pallas decode kernel, ``forward_packed_fused``); callers must
    gate on :func:`fused_heads_eligible` first.
    """
    prec = _PRECISIONS[precision]
    needed = graph.needed_outputs
    head_convs = ({yn.inputs[0] for yn in graph.yolo_nodes}
                  if stop_before_heads else frozenset())
    cache: Dict[int, jax.Array] = {}
    heads: List[jax.Array] = []
    # "bf16": convs run fully in bfloat16 (weights cast per-conv, activations
    # bf16 end-to-end) — ~1.4× over the default fp32-in/bf16-pass path on
    # v5e; head decode still runs fp32 (see decode_compact_head docstring)
    prev: jax.Array = x.astype(jnp.bfloat16) if precision == "bf16" else x
    for node in graph.nodes:
        if node.index in head_convs:
            # head branch ends here: capture the pre-head activation; the
            # skipped conv's only consumer is its yolo node (eligibility-
            # gated), so the pass-through output is never consumed
            heads.append(prev)
            out = prev
        elif node.kind == "convolutional":
            p = params[node.index]
            out = _conv(prev, p["w"], p["b"], node, prec, conv_impl)
        elif node.kind == "maxpool":
            out = _maxpool(prev, node)
        elif node.kind == "upsample":
            out = _upsample_nearest(prev, node.stride)
        elif node.kind == "shortcut":
            out = prev + cache[node.inputs[1]]
            if node.activation == "leaky":  # darknet applies it post-add
                out = jnp.where(out > 0, out, 0.1 * out)
            elif node.activation == "relu":
                out = jnp.maximum(out, 0)
        elif node.kind == "route":
            srcs = [prev if i == node.index - 1 else cache[i] for i in node.inputs]
            out = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
        elif node.kind == "yolo":
            if not stop_before_heads:
                heads.append(prev)
            out = prev
        else:  # pragma: no cover - lower() already validates kinds
            raise ValueError(node.kind)
        if node.index in needed:
            cache[node.index] = out
        prev = out
    return heads


def forward(
    graph: Graph,
    params: Dict[int, Dict[str, jax.Array]],
    x: jax.Array,
    precision: Optional[str] = None,
    conv_impl: str = "xla",
) -> jax.Array:
    """Full decoded forward: (B, H, W, C) → (B, N, 5+C) net-pixel detections.

    Matches the reference ``Darknet.forward`` output contract
    (SURVEY.md §2.4): center-xywh in network-input pixels, sigmoid objectness
    and class scores, heads concatenated coarse→fine in cfg order.
    """
    heads = forward_features(graph, params, x, precision, conv_impl)
    heads = [h.astype(jnp.float32) for h in heads]  # decode math is fp32
    yolo_nodes = graph.yolo_nodes
    return decode_all(
        heads,
        [n.anchors for n in yolo_nodes],
        list(graph.head_strides()),
        yolo_nodes[0].classes,
    )


def _consumer_counts(graph: Graph) -> Dict[int, int]:
    """node index → number of graph nodes consuming its output (the single
    source for 'is this head conv's only consumer its yolo node' gates —
    keep pad_head_params and fused_heads_eligible on this one count)."""
    consumers: Dict[int, int] = {}
    for n in graph.nodes:
        for i in n.inputs:
            if i >= 0:
                consumers[i] = consumers.get(i, 0) + 1
    return consumers


def pad_head_params(graph: Graph, params, lanes: int = 128):
    """Zero-pad each head conv's output channels to the lane boundary.

    The Pallas decode kernels need the head map's channel dim padded to a
    multiple of 128 lanes; padding the (tiny) conv WEIGHTS instead of the
    (huge) conv OUTPUT makes the conv itself emit the aligned map — the
    decode custom call then consumes a pure reshape instead of a full-map
    ``jnp.pad`` copy (659 MB for the 76² head at b128@608, ~2 ms/step of
    pure pad traffic across the three heads, round-3 measurement). The
    padded channels are exactly zero (zero weights, zero bias, linear
    activation) and the kernels mask all lanes ≥ a·(5+C).

    Only applied when the head conv's sole consumer is its yolo node (true
    for every published yolov3 variant); returns ``params`` untouched
    otherwise. Handles both float ({"w","b"}) and int8 ({"wq","sw","b"})
    param forms.
    """
    consumers = _consumer_counts(graph)
    out = dict(params)
    for yn in graph.yolo_nodes:
        hc = yn.inputs[0]
        node = graph.nodes[hc]
        if node.kind != "convolutional" or consumers.get(hc, 0) != 1:
            return params
        p = dict(params[hc])
        wkey = "wq" if "wq" in p else "w"
        c = p[wkey].shape[3]
        cp = -(-c // lanes) * lanes
        if cp == c:
            continue
        p[wkey] = jnp.pad(p[wkey], ((0, 0), (0, 0), (0, 0), (0, cp - c)))
        p["b"] = jnp.pad(p["b"], (0, cp - c))
        if "sw" in p:
            p["sw"] = jnp.pad(p["sw"], (0, cp - c), constant_values=1.0)
        out[hc] = p
    return out


def forward_compact(
    graph: Graph,
    params: Dict[int, Dict[str, jax.Array]],
    x: jax.Array,
    precision: Optional[str] = None,
    conv_impl: str = "xla",
    decode_impl: str = "xla",
):
    """Serving-path forward: (B, H, W, C) → (boxes (B,N,4) tlbr, scores (B,N),
    classes (B,N)). Skips materializing the (B, N, 5+C) tensor entirely —
    decode and the per-anchor score/class reduction fuse into one pass
    (see ``ops.decode.decode_compact``). ``decode_impl="pallas"`` runs the
    fused Pallas kernel instead (native head layout; anchor-major candidate
    order — same detection sets, see ``ops.pallas_decode``)."""
    if decode_impl == "pallas":
        params = pad_head_params(graph, params)
    heads = forward_features(graph, params, x, precision, conv_impl)
    yolo_nodes = graph.yolo_nodes
    if decode_impl == "pallas":
        from .ops.pallas_decode import decode_compact_pallas as _decode
    else:
        from .ops.decode import decode_compact as _decode
    return _decode(
        heads,
        [n.anchors for n in yolo_nodes],
        list(graph.head_strides()),
        yolo_nodes[0].classes,
    )


def forward_packed(
    graph: Graph,
    params: Dict[int, Dict[str, jax.Array]],
    x: jax.Array,
    prob_thresh: float,
    precision: Optional[str] = None,
    conv_impl: str = "xla",
):
    """Fused serving forward → (payload (B, N, 8), scores (B, N)) for
    ``ops.nms.batched_nms_packed``: decode, score threshold, and the
    candidate record (boxes/score/class/index) all emitted by the Pallas
    decode kernel — no per-plane relayouts between decode and NMS
    selection. ``prob_thresh`` must be the serving threshold (the NMS
    applies none on this path)."""
    from .ops.pallas_decode import decode_packed_pallas

    heads = forward_features(graph, pad_head_params(graph, params), x,
                             precision, conv_impl)
    yolo_nodes = graph.yolo_nodes
    return decode_packed_pallas(
        heads, [n.anchors for n in yolo_nodes], list(graph.head_strides()),
        yolo_nodes[0].classes, prob_thresh=prob_thresh)


def fused_heads_eligible(graph: Graph) -> bool:
    """Gate for the head-conv-fused decode (``forward_packed_fused``).

    Every head branch must end in a 1×1/s1 linear conv whose ONLY consumer
    is its yolo node (so skipping it changes nothing downstream), whose
    input channel count sits on the 128-lane boundary (the in-kernel MXU
    dot's contraction dim), and whose yolo node's pass-through output feeds
    nothing. True for yolov3/tiny/spp (Cin 256/384/512/768/1024).

    The shape half of the gate (lane-aligned Cin, anchor count) is the
    kernel's own ``ops.pallas_decode.fused_head_supported`` — this wrapper
    adds only the graph-structure conditions, so the Detector gate and the
    kernel's own eligibility check can never disagree.
    """
    from .ops.pallas_decode import fused_head_supported

    consumers = _consumer_counts(graph)
    for yn in graph.yolo_nodes:
        hc = yn.inputs[0]
        node = graph.nodes[hc]
        cin = (graph.nodes[node.inputs[0]].out_channels
               if node.inputs[0] >= 0 else graph.in_channels)
        if not (node.kind == "convolutional" and node.size == 1
                and node.stride == 1 and node.activation == "linear"
                and consumers.get(hc, 0) == 1
                and consumers.get(yn.index, 0) == 0
                and fused_head_supported(cin, yn.anchors)):
            return False
    return True


def forward_packed_fused(
    graph: Graph,
    params: Dict[int, Dict[str, jax.Array]],
    x: jax.Array,
    prob_thresh: float,
    precision: Optional[str] = None,
    conv_impl: str = "xla",
):
    """``forward_packed`` with the 1×1 head convs FUSED into the decode
    kernel (``ops.pallas_decode.decode_packed_head_fused_pallas``): the
    graph walk stops at each pre-head activation and the head projection
    runs as an in-kernel MXU dot — the (B, g, g, C_pad) head maps never
    round-trip HBM. Same record contract as ``forward_packed``; numerics
    differ only by the head projection accumulating in f32 without an
    intermediate bf16 head-map rounding. Callers gate on
    :func:`fused_heads_eligible`."""
    from .ops.pallas_decode import decode_packed_fused_pallas

    params = pad_head_params(graph, params)
    pre = forward_features(graph, params, x, precision, conv_impl,
                           stop_before_heads=True)
    yolo_nodes = graph.yolo_nodes
    ws, bs = [], []
    for yn in yolo_nodes:
        p = params[yn.inputs[0]]
        w = p["w"]  # (1, 1, Cin, C_pad) HWIO
        ws.append(w.reshape(w.shape[2], w.shape[3]))
        bs.append(p["b"])
    return decode_packed_fused_pallas(
        pre, ws, bs, [n.anchors for n in yolo_nodes],
        list(graph.head_strides()), yolo_nodes[0].classes,
        prob_thresh=prob_thresh, precision=precision)


class Darknet:
    """Thin stateful wrapper mirroring the reference's ``Darknet`` API
    (``yolov3/darknet.py::Darknet``, SURVEY.md §2.4): construct from a cfg
    path, ``load_weights()``, call on a batch. Jitted executables are cached
    per (input shape, dtype) — multi-resolution support (320/416/608) falls
    out of re-jit + cache (SURVEY.md §5.7)."""

    def __init__(self, cfg_path, precision: Optional[str] = None,
                 param_dtype=None, conv_impl: str = "xla"):
        from .graph import load_graph

        self.graph = load_graph(cfg_path)
        self.precision = precision
        self.conv_impl = conv_impl
        if param_dtype is None:
            param_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        self.param_dtype = jnp.dtype(param_dtype)
        self.params: Optional[Dict[int, Dict[str, jax.Array]]] = None
        self.qparams = None  # int8 path (quantize_int8)
        self.act_scales = None
        self.act_zeros = None  # asymmetric scheme only (act_scheme)
        self.qcarrier = "int8"  # activation carrier of the int8 path
        self._jitted = {}

    @property
    def quantized(self) -> bool:
        return self.qparams is not None

    def quantize_int8(self, calibration_frames, net_hw=None,
                      mode: str = "letterbox", carrier: str = "int8",
                      quantize_heads: bool = False,
                      quantize_stem: bool = False,
                      calib_method: str = "absmax",
                      calib_percentile: float = 99.9,
                      bias_correct: bool = True,
                      act_scheme: str = "symmetric") -> "Darknet":
        """Post-training int8 quantization (see ``quant.py``).

        ``calibration_frames``: (N, H, W, 3) uint8 RGB frames (a few dozen
        representative images); they are letterboxed to the net input size
        and used to calibrate activation scales. ``carrier="int8"``
        (default) keeps activations int8 BETWEEN ops — quantization fused
        into producer epilogues, half the inter-op traffic (quant.py,
        ``forward_features_int8_carrier``); ``carrier="bf16"`` quantizes at
        each conv input (round-1 scheme). Both hold the same parity gates
        (tests/test_quant.py). ``quantize_heads=True`` also quantizes the
        no-BN head projections; ``quantize_stem=True`` quantizes the Cin=3
        stem conv via the exact-u8 input scheme (see ``quant.eligible``).

        ``calib_method``: ``"absmax"`` (default) or ``"percentile"`` with
        ``calib_percentile`` (default 99.9) — the standard PTQ outlier
        guard; see ``quant._make_stat_fn`` for the exact semantics and the
        saturation contract that makes it safe.

        ``bias_correct`` (default True) applies DFQ-style bias correction
        after weight quantization (``quant.bias_correct``): the expected
        per-channel pre-activation shift introduced by weight/activation
        rounding is measured on the SAME calibration batches (one extra
        jitted pass) and folded into each quantized conv's bias — zero
        runtime cost. Measured on the pinned synthetic eval (BASELINE.md
        round-5): absmax mAP50_95 0.9032 → 0.9146; heavy percentile
        clipping (q=99.0) +7 mAP50 points; q=99.9 slightly negative
        (−0.018 mAP50) — pass ``bias_correct=False`` there.

        ``act_scheme="asymmetric"`` (int8 carrier only) quantizes
        activations with per-tensor zero-points (``x = s·(q − z)``,
        ``quant.calibrate_tensors_affine``): one-sided LeakyReLU
        activations nearly double their int8 resolution, and the
        zero-point terms fold into conv epilogues as per-channel constants
        (``quant._conv_int8_core``) — the round-5 error budget measured
        activation rounding as the dominant int8 error source
        (BASELINE.md). ``calib_method`` maps to the affine calibrator:
        absmax → exact minmax range, percentile → two-sided (100−q, q)."""
        from .ops.preprocess import preprocess
        from .quant import (bias_correct as _bias_correct, calibrate,
                            calibrate_tensors, calibrate_tensors_affine,
                            quantize_weights)

        if self.params is None:
            raise RuntimeError("load_weights() before quantize_int8()")
        net_hw = tuple(net_hw) if net_hw else self.net_size
        if len(calibration_frames) == 0:
            # an empty calibration set would quietly produce an empty/garbage
            # scale dict that breaks every subsequent detect with a KeyError
            # — and, worse, could silently destroy accuracy if it didn't
            raise ValueError("quantize_int8 needs at least one calibration "
                             "frame (a few dozen representative images)")
        def _u8(f):
            # same contract as the detect entry points: a float frame would
            # be silently truncated to uint8 (all-zero image) and the
            # resulting scales would quietly destroy accuracy
            a = np.ascontiguousarray(f)
            if a.dtype != np.uint8:
                raise TypeError(f"calibration frames must be uint8 (got "
                                f"{a.dtype}); pass raw cv2/camera frames")
            return a

        if isinstance(calibration_frames, (list, tuple)):
            # variable-size calibration images: preprocess each individually
            batches = [preprocess(jnp.asarray(_u8(f))[None], net_hw,
                                  mode=mode)
                       for f in calibration_frames]
        else:
            frames = jnp.asarray(_u8(calibration_frames))
            batches = [preprocess(frames[i:i + 8], net_hw, mode=mode)
                       for i in range(0, frames.shape[0], 8)]
        if act_scheme not in ("symmetric", "asymmetric"):
            raise ValueError(f"unknown act_scheme {act_scheme!r} "
                             "(expected 'symmetric' or 'asymmetric')")
        if act_scheme == "asymmetric" and carrier != "int8":
            raise ValueError("act_scheme='asymmetric' needs the int8 "
                             "activation carrier (carrier='int8')")
        self.act_zeros = None
        if act_scheme == "asymmetric":
            self.act_scales, self.act_zeros = calibrate_tensors_affine(
                self.graph, self.params, batches,
                precision=self.precision or "bf16",
                method={"absmax": "minmax"}.get(calib_method, calib_method),
                percentile=calib_percentile)
        elif carrier == "int8":
            self.act_scales = calibrate_tensors(
                self.graph, self.params, batches,
                precision=self.precision or "bf16",
                method=calib_method, percentile=calib_percentile)
        else:
            self.act_scales = calibrate(
                self.graph, self.params, batches,
                precision=self.precision or "bf16",
                include_heads=quantize_heads,
                method=calib_method, percentile=calib_percentile)
        self.qcarrier = carrier
        self.qparams = quantize_weights(self.graph, self.params,
                                        include_heads=quantize_heads,
                                        include_stem=quantize_stem)
        if bias_correct:
            self.qparams = _bias_correct(
                self.graph, self.params, self.qparams, self.act_scales,
                batches, carrier=carrier,
                precision=self.precision or "bf16",
                zeros=self.act_zeros)
        return self

    def save_quantized(self, path) -> "Darknet":
        """Persist the int8 quantization state (qparams + activation scales
        + carrier) as one npz so a serving restart skips calibration
        entirely (``load_quantized``). The file is keyed to the
        architecture (graph name + param count) — NOT to the weight file:
        qparams fully determine the int8 forward, so the float weights only
        matter for the fp32 fallback path."""
        from pathlib import Path

        from .weights import param_count

        if not self.quantized:
            raise RuntimeError("quantize_int8() before save_quantized()")
        flat = {
            "__meta__.graph": np.asarray(self.graph.name),
            "__meta__.nparams": np.asarray(param_count(self.graph)),
            "__meta__.carrier": np.asarray(self.qcarrier),
            "__meta__.scale_idx": np.asarray(sorted(self.act_scales),
                                             np.int64),
            "__meta__.scale_val": np.asarray(
                [self.act_scales[i] for i in sorted(self.act_scales)],
                np.float64),
        }
        if self.act_zeros is not None:  # asymmetric activation scheme
            flat["__meta__.zero_idx"] = np.asarray(sorted(self.act_zeros),
                                                   np.int64)
            flat["__meta__.zero_val"] = np.asarray(
                [self.act_zeros[i] for i in sorted(self.act_zeros)],
                np.int64)
        for i, qp in self.qparams.items():
            for name, a in qp.items():
                a = np.asarray(a)
                if a.dtype == jnp.bfloat16.dtype:
                    # np.savez stores bfloat16 as opaque void ("|V2") that
                    # np.load can't hand back to JAX — persist the raw bits
                    # with a dtype tag instead (exact roundtrip)
                    flat[f"{i}.{name}:bf16"] = a.view(np.uint16)
                else:
                    flat[f"{i}.{name}"] = a
        path = Path(path)
        tmp = path.with_suffix(path.suffix + ".tmp")
        with open(tmp, "wb") as f:  # file handle: savez won't append .npz
            np.savez(f, **flat)
        tmp.replace(path)
        return self

    def load_quantized(self, path) -> "Darknet":
        """Restore int8 quantization state saved by ``save_quantized``.
        Validates the architecture key (graph name + param count) so a
        state file from a different cfg fails loudly, not with garbage
        detections."""
        from .weights import param_count

        with np.load(path) as z:
            name = str(z["__meta__.graph"])
            nparams = int(z["__meta__.nparams"])
            if (name, nparams) != (self.graph.name,
                                   param_count(self.graph)):
                raise ValueError(
                    f"quantized state {path} was saved for graph "
                    f"{name!r} ({nparams} params); this net is "
                    f"{self.graph.name!r} ({param_count(self.graph)})")
            self.qcarrier = str(z["__meta__.carrier"])
            idx = z["__meta__.scale_idx"]
            val = z["__meta__.scale_val"]
            self.act_scales = {int(i): float(s) for i, s in zip(idx, val)}
            self.act_zeros = None
            if "__meta__.zero_idx" in z.files:
                self.act_zeros = {int(i): int(v) for i, v in
                                  zip(z["__meta__.zero_idx"],
                                      z["__meta__.zero_val"])}
            qparams: Dict[int, Dict[str, jax.Array]] = {}
            for file in z.files:
                if file.startswith("__meta__"):
                    continue
                i, field = file.split(".", 1)
                a = z[file]
                if field.endswith(":bf16"):
                    field = field[:-len(":bf16")]
                    a = a.view(jnp.bfloat16.dtype)
                qparams.setdefault(int(i), {})[field] = jnp.asarray(a)
            self.qparams = qparams
        return self

    @property
    def num_classes(self) -> int:
        return self.graph.yolo_nodes[0].classes

    @property
    def net_size(self) -> Tuple[int, int]:
        return (self.graph.in_height, self.graph.in_width)

    def load_weights(self, weights_path, cache: bool = False) -> "Darknet":
        """Load a darknet ``.weights`` file (folded, HWIO). ``cache=True``
        keeps an npz of the converted params next to the file (SURVEY §5.4)."""
        from .weights import load_weights, load_weights_cached

        if cache:
            host = load_weights_cached(weights_path, self.graph)
        else:
            host = load_weights(weights_path, self.graph)
        self.params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype=self.param_dtype), host
        )
        return self

    def set_params(self, params) -> "Darknet":
        self.params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype=self.param_dtype), params
        )
        return self

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.params is None:
            raise RuntimeError("call load_weights()/set_params() first")
        if not self._jitted:
            # one jit object; jax caches traces per input shape/dtype itself
            self._jitted["fn"] = jax.jit(
                partial(forward, self.graph, precision=self.precision,
                        conv_impl=self.conv_impl))
        return self._jitted["fn"](self.params, x)
