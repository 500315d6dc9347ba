"""Post-training int8 quantization — the v5e speed tier above bf16.

v5e's MXU does 2× the int8 OPS of bf16 (measured 73 vs 38 TOPS on yolov3's
hot conv shape through this stack). Scheme (conservative PTQ, designed so a
bad calibration can degrade accuracy but never correctness):

* **weights**: per-output-channel symmetric int8 (``w_q = round(w/s_w[o])``),
  folded-BN weights quantized directly;
* **activations**: per-conv-input per-tensor symmetric int8 with scales
  calibrated from real batches (abs-max over the calibration set);
* **carrier precision**: activations travel between ops in bf16; each
  eligible conv quantizes its input on the fly (fused VPU round/clip),
  convolves int8×int8→int32 on the MXU, and dequantizes in the epilogue
  (scale·bias·LeakyReLU) — route/shortcut/upsample/maxpool never deal with
  mismatched scales;
* **exclusions** (both opt-in since round 3): the no-BN linear head convs
  quantize under ``include_heads`` (gated: same pre-NMS parity bars as the
  backbone); the 3-channel stem quantizes under ``include_stem`` via the
  exact-u8 input representation (``q = u8 − 128``, scale 1/255 — zero input
  quantization error; see :func:`_conv_stem_int8`).

Usage::

    net = Darknet(cfg, precision="bf16").load_weights(w)
    net.quantize_int8(calibration_frames)   # frames: (N, H, W, 3) uint8 RGB
    Detector(net, ...)                      # pipeline picks the int8 path
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .graph import Graph, Node
from .model import _maxpool, _upsample_nearest, _PRECISIONS


def load_calibration_dir(path, cap: int = 32) -> List[np.ndarray]:
    """Load up to ``cap`` calibration images (RGB, native size) from a
    directory — the ONE loader behind both CLIs' ``--quantize-int8
    CALIB_DIR``. Filter-then-cap, not cap-then-filter: a directory whose
    listing leads with non-image files (labels/, README, sidecars) must
    not crowd out the calibration images (round-2 review). Raises
    SystemExit with a one-line message when none are readable (both CLIs
    treat that as user error, not a traceback)."""
    import cv2
    from pathlib import Path

    calib: List[np.ndarray] = []
    for p_img in sorted(Path(path).iterdir()):
        if not p_img.is_file():
            continue
        frame = cv2.imread(str(p_img))
        if frame is not None:
            calib.append(frame[..., ::-1])  # BGR→RGB, native size
        if len(calib) >= cap:
            break
    if not calib:
        raise SystemExit(f"no readable calibration images in {path}")
    return calib


def eligible(graph: Graph, node: Node, include_heads: bool = False,
             include_stem: bool = False) -> bool:
    """Quantize BN'd convs. ``include_heads=True`` additionally quantizes the
    no-BN linear head convs (the 1×1 projections feeding each yolo decode):
    their input quantizes per-tensor like every other conv and their f32
    output feeds decode directly (never requantized — yolo heads are not
    q-friendly), so the only added error is the weight/input rounding.
    Accuracy is gated by tests/test_quant.py::test_head_quantization_*.

    ``include_stem=True`` (round 3) quantizes the Cin=3 stem conv too. Its
    input is special: preprocessed pixels are exactly ``u8/255``, so
    ``q = u8 - 128`` is an EXACT int8 image (fixed scale 1/255, zero-point
    -128; zero padding ≡ q = -128) — the input quantizes with ZERO error and
    the only new rounding is the per-channel weight quantization every other
    conv already has. int8 MXU runs 2× bf16, so the conv0-is-bf16 exclusion
    (the old "layout-bound, buys nothing" judgment) left measurable time on
    the table at @608 b128; gated by tests/test_quant.py::test_stem_*."""
    src = node.inputs[0]
    if src < 0:  # stem conv: reads the network input directly
        return include_stem and node.batch_normalize
    c_in = graph.nodes[src].out_channels
    if not node.batch_normalize and not include_heads:
        return False
    return c_in >= 16


def quantize_weights(graph: Graph, params, include_heads: bool = False,
                     include_stem: bool = False
                     ) -> Dict[int, Dict[str, jax.Array]]:
    """Per-output-channel symmetric int8 quantization of folded conv weights.

    Returns qparams: eligible convs get {"wq" int8 HWIO, "sw" (C,) f32,
    "b" f32}; ineligible convs keep {"w", "b"} untouched. The stem conv
    (``include_stem``) additionally folds the exact-u8 zero-point correction
    into its bias: with x = (q + 128)/255 and zero padding carried as
    q = -128, conv(x) = (conv_int(q) + 128·Σ_taps wq)·sw/255 — the constant
    Σ term is per-output-channel and lands here.
    """
    q: Dict[int, Dict[str, jax.Array]] = {}
    for node in graph.conv_nodes:
        p = params[node.index]
        if not eligible(graph, node, include_heads, include_stem):
            q[node.index] = {"w": jnp.asarray(p["w"]),
                             "b": jnp.asarray(p["b"], jnp.float32)}
            continue
        w = np.asarray(p["w"], np.float32)  # HWIO
        sw = np.abs(w).reshape(-1, w.shape[3]).max(axis=0) / 127.0
        sw = np.maximum(sw, 1e-12).astype(np.float32)
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        b = np.asarray(p["b"], np.float32)
        if node.inputs[0] < 0:  # stem: fold the +128 zero-point term
            wsum = wq.reshape(-1, w.shape[3]).astype(np.int64).sum(axis=0)
            b = b + (128.0 / 255.0) * sw * wsum.astype(np.float32)
        q[node.index] = {"wq": jnp.asarray(wq), "sw": jnp.asarray(sw),
                         "b": jnp.asarray(b, jnp.float32)}
    return q


def _activate(y: jax.Array, activation: str) -> jax.Array:
    """Same activation contract as model._conv (raise on unknowns — a
    silently-skipped activation is wrong detections, not an error message)."""
    if activation == "leaky":
        return jnp.where(y > 0, y, 0.1 * y)
    if activation == "relu":
        return jnp.maximum(y, 0)
    if activation == "linear":
        return y
    raise ValueError(f"unsupported activation {activation!r}")


def _conv_bf16(x: jax.Array, node: Node, qp, precision) -> jax.Array:
    pad = node.size // 2 if node.pad else 0
    y = lax.conv_general_dilated(
        x, qp["w"].astype(x.dtype), (node.stride, node.stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    y = y + qp["b"].astype(y.dtype)
    return _activate(y, node.activation)


def chain_targets(graph: Graph, qparams) -> Dict[int, int]:
    """Conv indices whose output's SOLE consumer is the next quantized conv.

    These convs can emit int8 in the consumer's calibrated scale straight
    from their epilogue — the bf16 activation tensor never exists. In yolov3
    this covers every residual-bottleneck 1×1 (the consumer 3×3 feeds the
    shortcut, so it still emits bf16).

    Measured on v5e: throughput-neutral (1196 vs 1212 img/s @608 b128) —
    XLA's producer-consumer fusion already eliminates the dequant→requant
    round trip between adjacent convs. Kept because it also skips one bf16
    rounding per chained activation (strictly more accurate) and documents
    the dataflow explicitly.
    """
    needed = graph.needed_outputs
    targets: Dict[int, int] = {}
    for node in graph.nodes:
        nxt = node.index + 1
        if (node.kind == "convolutional" and "wq" in qparams.get(node.index, {})
                and node.index not in needed
                and nxt < len(graph.nodes)):
            nxt_node = graph.nodes[nxt]
            if (nxt_node.kind == "convolutional"
                    and nxt_node.inputs == (node.index,)
                    and "wq" in qparams.get(nxt, {})):
                targets[node.index] = nxt
    return targets


def _conv_int8_core(x_or_q, node: Node, qp, sx: float,
                    prequantized: bool, zx: int = 0) -> jax.Array:
    """int8 conv returning the fp32 pre-activation epilogue input.

    ``zx`` is the input tensor's zero-point (asymmetric activation scheme,
    ``act_scheme="asymmetric"``): the input represents ``x = sx·(q − zx)``,
    so with implicit zero padding

        conv(x)[p] = sx·(conv(q)[p] − zx·(Σ_all wq − deficit[p]))

    where ``deficit[p] = Σ_out-of-bounds-taps wq`` is nonzero only on the
    1-pixel pad-border ring (k ≤ 3, pad ≤ 1 in every darknet graph). The
    global ``zx·Σwq`` term is a per-channel vector fused into the
    epilogue for free; the ring is repaired with thin static-slice
    updates (4 strips built from per-channel deficit vectors — O((H+W)·C)
    elements, ~2% of the tensor at 152²). Cheaper formulations that
    touch the full tensor measure −26% e2e @608 (explicit ``q = zx``
    input pad 968.5 img/s, full deficit-map subtract 979.5 vs symmetric
    1315.8 — BASELINE.md round-5): qparams are traced jit arguments, so
    a (H, W, C) correction map is real per-step HBM traffic, not a
    foldable constant. ``zx = 0`` is the symmetric scheme, bit-identical
    to the historical path."""
    pad = node.size // 2 if node.pad else 0
    if prequantized:
        xq = x_or_q
    else:
        xq = _quantize_affine(x_or_q, sx, zx)
    dn = ("NHWC", "HWIO", "NHWC")
    wq = qp["wq"]
    y = lax.conv_general_dilated(
        xq, wq, (node.stride, node.stride), [(pad, pad), (pad, pad)],
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    y32 = y.astype(jnp.float32)
    scale = qp["sw"] * jnp.float32(sx)
    b = qp["b"]
    if zx:
        # fold z·Σwq into the BIAS vector (per-channel, same fused
        # epilogue shape as the symmetric path — an extra big-tensor
        # subtract instead measured −26% e2e, see the docstring)
        w32 = wq.astype(jnp.float32)
        z = jnp.float32(zx)
        b = b - z * scale * jnp.sum(w32, axis=(0, 1, 2))
        y32 = y32 + z * _zp_border_deficit(w32, node, pad,
                                           y32.shape[1], y32.shape[2],
                                           xq.shape[1], xq.shape[2])
    return y32 * scale + b


def _zp_border_deficit(w32: jax.Array, node: Node, pad: int,
                       hp: int, wp: int, h_in: int, w_in: int) -> jax.Array:
    """The ``deficit[p]`` map of _conv_int8_core as a FUSABLE broadcast
    expression: outer products of 1-D edge masks (iota comparisons) with
    per-channel tap-row sums, corners corrected by inclusion–exclusion.
    Nothing materializes — the whole map stays elementwise inside the conv
    epilogue fusion (thin static-slice ``.at[].add`` updates instead
    copied the full tensor per update: measured 823.6 vs symmetric
    1315.8 img/s @608; this form restores fusion).

    Per output row index i, tap row ``kh`` is out of bounds iff
    ``i·s − pad + kh`` falls outside the input; for the darknet geometry
    (k ≤ 3, pad ≤ 1, stride ≤ 2) only the first and last output rows/cols
    can be deficient — asserted, not assumed."""
    k, s = node.size, node.stride
    # first/last row|col must be distinct cells (1×1 outputs would apply
    # both edge fixes to the same cell) — no darknet shape gets near this
    assert k == 1 or (hp >= 2 and wp >= 2), (hp, wp)

    def miss(n_out: int, n_in: int, edge: str) -> np.ndarray:
        idx = 0 if edge == "lo" else n_out - 1
        out = [kk for kk in range(k)
               if not 0 <= idx * s - pad + kk < n_in]
        return np.asarray(out, np.int32)

    m_top, m_bot = miss(hp, h_in, "lo"), miss(hp, h_in, "hi")
    m_left, m_right = miss(wp, w_in, "lo"), miss(wp, w_in, "hi")
    # interior rows/cols must be complete (ring width 1); a graph
    # violating it must extend this repair, not silently skip it
    for n_out, n_in in ((hp, h_in), (wp, w_in)):
        for idx in range(1, n_out - 1):
            assert 0 <= idx * s - pad and idx * s - pad + k - 1 < n_in, \
                "zero-point border repair: ring wider than 1 output px"

    def edge_mask(n: int, at_end: bool) -> jax.Array:
        i = lax.iota(jnp.float32, n)
        return (i == (n - 1)).astype(jnp.float32) if at_end \
            else (i == 0).astype(jnp.float32)

    def kh_sum(m_kh) -> jax.Array:                      # (C,)
        return jnp.sum(w32[m_kh], axis=(0, 1, 2))

    def kw_sum(m_kw) -> jax.Array:
        return jnp.sum(w32[:, m_kw], axis=(0, 1, 2))

    def inter(m_kh, m_kw) -> jax.Array:
        return jnp.sum(w32[m_kh][:, m_kw], axis=(0, 1, 2))

    corr = jnp.zeros((1, 1, 1, w32.shape[3]), jnp.float32)
    rows = [(m_top, edge_mask(hp, False)), (m_bot, edge_mask(hp, True))]
    cols = [(m_left, edge_mask(wp, False)), (m_right, edge_mask(wp, True))]
    for m_kh, rmask in rows:
        if m_kh.size:
            corr = corr + rmask[None, :, None, None] * kh_sum(m_kh)
    for m_kw, cmask in cols:
        if m_kw.size:
            corr = corr + cmask[None, None, :, None] * kw_sum(m_kw)
    for m_kh, rmask in rows:
        for m_kw, cmask in cols:
            if m_kh.size and m_kw.size:
                corr = corr - (rmask[None, :, None, None]
                               * cmask[None, None, :, None]
                               * inter(m_kh, m_kw))
    return corr


def _conv_stem_int8(x: jax.Array, node: Node, qp) -> jax.Array:
    """int8 stem conv on the EXACT u8 input representation.

    ``x`` is the preprocessed network input in [0, 1] (values ``u8/255`` for
    identity-resize sources; resized sources add ≤0.5/255 input rounding —
    finer than any calibrated activation scale). ``q = round(255·x) − 128``
    spans [−128, 127]; zero padding must be carried as q = −128 (≡ x = 0),
    so the SAME pad happens explicitly in the quantized domain rather than
    inside the conv. The +128 zero-point term is already folded into
    ``qp["b"]`` (:func:`quantize_weights`). Returns the f32 pre-activation."""
    xq = (jnp.round(x.astype(jnp.float32) * 255.0) - 128.0).astype(jnp.int8)
    pad = node.size // 2 if node.pad else 0
    if pad:
        xq = jnp.pad(xq, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     constant_values=np.int8(-128))
    y = lax.conv_general_dilated(
        xq, qp["wq"], (node.stride, node.stride), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (qp["sw"] * jnp.float32(1.0 / 255.0)) \
        + qp["b"]


def consumers_of(graph: Graph) -> Dict[int, List[Node]]:
    """node index → nodes consuming its output (explicit input edges)."""
    out: Dict[int, List[Node]] = {n.index: [] for n in graph.nodes}
    for n in graph.nodes:
        for i in n.inputs:
            if i >= 0:
                out[i].append(n)
    return out


def _quantize_to(y: jax.Array, scale) -> jax.Array:
    return jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / scale)),
                    -127, 127).astype(jnp.int8)


def _quantize_affine(y: jax.Array, scale, zero: int = 0) -> jax.Array:
    """``q = clip(round(y/s + z), ±127)`` — the affine quantize site.
    For INTEGER z, ``round(y/s + z) ≡ round(y/s) + z`` (up to f32 ties),
    so the zero-point rides the same multiply-add the symmetric site
    compiles to — op-count parity with :func:`_quantize_to` matters: one
    extra elementwise op at the quantize sites measured ~+30 ms/step
    @608 b128 (BASELINE.md round-5). ``z = 0`` reduces to the symmetric
    site exactly; nonzero ``z`` centers the int8 range on the calibrated
    activation range instead of on zero."""
    f = y.astype(jnp.float32) * (1.0 / scale)
    if zero:
        f = f + jnp.float32(zero)
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


def _dequantize_affine(q: jax.Array, scale, zero: int = 0) -> jax.Array:
    """``x = s·q − s·z`` — the constant product folds host-side so the
    dequant is a single fused multiply-add (see :func:`_quantize_affine`
    on why op-count parity matters)."""
    f = q.astype(jnp.float32) * scale
    if zero:
        f = f - jnp.float32(zero * scale)
    return f


def _requantize_affine(q: jax.Array, s_in: float, z_in: int,
                       s_out: float, z_out: int) -> jax.Array:
    """Fused dequant→quant: ``clip(round(q·(s_in/s_out) + c))`` with
    ``c = z_out − z_in·s_in/s_out`` folded host-side — ONE multiply-add
    regardless of zero-points (a dequant + quant pair is two extra
    elementwise ops on a full tensor; see :func:`_quantize_affine`)."""
    r = s_in / s_out
    c = float(z_out) - float(z_in) * r
    f = q.astype(jnp.float32) * jnp.float32(r)
    if c:
        f = f + jnp.float32(c)
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


def _maxpool_int8(x: jax.Array, node: Node) -> jax.Array:
    """int8 maxpool — max is monotone, so pooling quantized values in the
    producer's scale is EXACT vs pooling then quantizing."""
    lo = node.padding // 2
    hi = node.padding - lo
    return lax.reduce_window(
        x, jnp.asarray(jnp.iinfo(jnp.int8).min, jnp.int8), lax.max,
        window_dimensions=(1, node.size, node.size, 1),
        window_strides=(1, node.stride, node.stride, 1),
        padding=((0, 0), (lo, hi), (lo, hi), (0, 0)))


def forward_features_int8_carrier(
        graph: Graph, qparams, tensor_scales: Dict[int, float], x: jax.Array,
        precision: Optional[str] = "bf16",
        upto: Optional[int] = None,
        stop_before_heads: bool = False,
        block_impl: str = "xla",
        tensor_zeros: Optional[Dict[int, int]] = None) -> List[jax.Array]:
    """int8 graph walk with an **int8 activation carrier** (round 2).

    The bf16-carrier walk (:func:`forward_features_int8`) quantizes each
    eligible conv's input on the fly — a separate VPU pass per conv that
    DESIGN.md measures at 8–14% of conv time, plus 2-byte activations
    between every op. Here each eligible conv's epilogue emits int8 in the
    tensor's own calibrated scale and activations TRAVEL as (int8, scale):

    * conv (eligible): consumes int8 directly (producer scale), MXU
      int8×int8→int32, fused dequant/bias/activation epilogue, requantizes
      to its own output scale in-register;
    * shortcut: widen both operands with their scales, add + activation in
      f32, requantize — one fused elementwise pass;
    * route: single-input passes through (scale rides along); multi-input
      dequantize→concat→requantize fused;
    * maxpool/upsample: exact on int8 (monotone / copy), scale preserved;
    * bf16 consumers (no-BN head convs, yolo heads): operand dequantized to
      the carrier dtype at the use site.

    ``tensor_scales``: node index → calibrated abs-max/127 of that node's
    OUTPUT (see :func:`calibrate_tensors`). Numerics differ slightly from
    the bf16 carrier (skip-edge operands are read quantized); accuracy is
    gated by the same tests/test_quant.py contract.

    ``upto``: truncate the walk after ``graph.nodes[:upto]`` and append the
    last live activation (dequantized to the carrier dtype) to the returned
    list — used by ``tools/profile_int8.py`` to measure cumulative stage
    cost of exactly the program the full walk runs (quantization decisions
    still come from the FULL graph's consumer sets).

    ``stop_before_heads``: return the PRE-head activations (carrier dtype)
    instead — the 1×1 head convs are skipped; their projection runs inside
    the fused Pallas decode kernel (:func:`forward_packed_fused_int8`).
    Callers gate on ``model.fused_heads_eligible``. Quantization decisions
    (q_friendly/want_q) still come from the full graph, so the shared
    prefix is the exact program the full walk runs.

    ``block_impl="pallas"``: runs eligible residual blocks (1×1 → 3×3 →
    shortcut on the int8 carrier) through the fused VMEM-resident Pallas
    kernel (``ops.pallas_block``). The kernel mimics every intermediate
    quantization of this walk; fused-vs-unfused differences are confined
    to requantization ties flipped by float-contraction differences
    (measured ≤1 quant step on ~0.04% of elements — see the kernel's
    numerics contract). Consecutive blocks chain in the kernel's padded
    layout, paying one pad copy per stage instead of per block. Blocks
    that don't fit the kernel (channel alignment, VMEM, non-int8 input)
    fall back to this walk's unfused ops node by node.

    ``tensor_zeros``: node index → zero-point for the ASYMMETRIC activation
    scheme (``quantize_int8(act_scheme="asymmetric")``, calibrated by
    :func:`calibrate_tensors_affine`). The carrier then travels as
    ``("q", int8, scale, zero)`` with ``x = s·(q − z)``; conv zero-point
    terms fold into epilogues (:func:`_conv_int8_core`), pass-through ops
    carry (s, z) unchanged, joins dequantize with the affine form. ``None``
    (default) is the symmetric scheme — z ≡ 0, bit-identical numerics.
    The fused-block kernel implements the symmetric quantization contract
    only, so nonzero zero-points force ``block_impl="xla"``.
    """
    prec = _PRECISIONS[precision]
    zof = ((lambda i: tensor_zeros.get(i, 0)) if tensor_zeros
           else (lambda i: 0))
    if tensor_zeros and any(tensor_zeros.values()):
        block_impl = "xla"  # pallas_block mimics the SYMMETRIC quant sites
    needed = graph.needed_outputs
    cons = consumers_of(graph)
    carrier_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    # q_friendly[i]: node i genuinely absorbs an int8 operand. Quantized
    # convs and scale-resolving joins (shortcut, multi-input route) consume
    # int8 natively. PASS-THROUGH ops (maxpool/upsample/single-input route)
    # forward the carrier unchanged, so they are friendly only if ALL of
    # their own consumers are — computed transitively in reverse topological
    # order (graph.nodes is topo-ordered; skip edges only point backward).
    # Without the transitive check, an int8 tensor could flow through a
    # pass-through into a bf16 consumer, reintroducing the lossy
    # quantize→dequantize round trip want_q exists to prevent.
    q_friendly: Dict[int, bool] = {}
    for n in reversed(graph.nodes):
        if n.kind == "convolutional":
            ok = "wq" in qparams.get(n.index, {})
        elif n.kind == "shortcut" or (n.kind == "route" and len(n.inputs) > 1):
            ok = True
        elif n.kind in ("maxpool", "upsample", "route"):
            ncs = cons[n.index]
            ok = bool(ncs) and all(q_friendly[c.index] for c in ncs)
        else:  # yolo heads read the carrier dtype
            ok = False
        q_friendly[n.index] = ok

    def want_q(node: Node) -> bool:
        """Emit int8 for this node's output?"""
        if node.index not in tensor_scales:
            return False
        cs = cons[node.index]
        # ALL consumers must read int8 — a mixed edge would silently add a
        # quantize→dequantize round trip on the bf16 consumer's operand
        # (accuracy loss for zero traffic gain on that edge)
        return bool(cs) and all(q_friendly[c.index] for c in cs)

    # values: ("q", int8 array, scale, zero) or ("f", carrier array)
    head_convs = ({yn.inputs[0] for yn in graph.yolo_nodes}
                  if stop_before_heads else frozenset())
    cache: Dict[int, tuple] = {}
    heads: List[jax.Array] = []
    prev: tuple = ("f", x.astype(carrier_dtype))

    def as_f(v) -> jax.Array:
        if v[0] == "f":
            return v[1]
        return _dequantize_affine(v[1], v[2], v[3]).astype(carrier_dtype)

    bplan: Dict[int, Dict] = {}
    if block_impl == "pallas":
        from .ops.pallas_block import fused_block_plan

        bplan = fused_block_plan(graph, qparams, tensor_scales)

    def run_block_chain(a: int, prev_q: tuple):
        """Run the maximal fused residual-block chain starting at node
        ``a`` through ``ops.pallas_block``; returns (output value, last
        fused node index) or None when the spatial geometry doesn't fit
        the kernel (caller falls back to the unfused ops). Consecutive
        same-shape blocks chain in the kernel's padded layout — one pad
        copy in, one lazy slice out; intermediate shortcut outputs cache
        as lazy slices (DCE'd unless a later route/shortcut reads them)."""
        from .ops import pallas_block as pblk

        info = bplan[a]
        hh, ww = prev_q[1].shape[1], prev_q[1].shape[2]
        geom = pblk.plan_geometry(hh, ww, info["cin"], info["cmid"],
                                  info["cout"])
        if geom is None:
            return None
        chain = [a]
        while True:
            nxt = chain[-1] + 3
            if (nxt in bplan and bplan[nxt] == info
                    and (upto is None or nxt + 2 < upto)
                    and want_q(graph.nodes[chain[-1] + 2])):
                chain.append(nxt)
            else:
                break
        xp = pblk.pad_chain_input(prev_q[1], geom, hh, ww)
        s_cur = prev_q[2]
        val = prev_q
        for ai in chain:
            eq = want_q(graph.nodes[ai + 2])
            s_out = tensor_scales[ai + 2] if eq else None
            w1, w2, d1, v1, d2, v2 = pblk.prepare_block_params(
                qparams[ai], qparams[ai + 1], s_cur, tensor_scales[ai],
                info["cp"])
            xp = pblk.residual_block_int8(
                xp, w1, w2, d1, v1, d2, v2, h=hh, w=ww, s_in=s_cur,
                s_mid=tensor_scales[ai], s_mid2=tensor_scales[ai + 1],
                s_out=s_out, emit_q=eq, carrier_dtype=carrier_dtype)
            sliced = pblk.slice_chain_output(xp, hh, ww)
            val = ("q", sliced, s_out, 0) if eq else ("f", sliced)
            if (ai + 2) in needed:
                cache[ai + 2] = val
            s_cur = s_out
        return val, chain[-1] + 2

    skip_upto = -1
    for node in (graph.nodes if upto is None else graph.nodes[:upto]):
        if node.index <= skip_upto:
            continue  # node ran inside a fused block chain
        if (node.index in bplan and prev[0] == "q"
                and (upto is None or node.index + 2 < upto)):
            res = run_block_chain(node.index, prev)
            if res is not None:
                prev, skip_upto = res
                continue
        if node.index in head_convs:
            # head branch ends here: the skipped conv's only consumer is
            # its yolo node (fused_heads_eligible gate), so the
            # pass-through output is never consumed
            heads.append(as_f(prev))
            out = prev
        elif node.kind == "convolutional":
            qp = qparams[node.index]
            if "wq" in qp:
                if node.inputs[0] < 0:
                    # stem: exact-u8 int8 input from the RAW network input
                    # (not the carrier cast — bf16 would break exactness)
                    y = _conv_stem_int8(x, node, qp)
                elif prev[0] == "q":
                    y = _conv_int8_core(prev[1], node, qp, prev[2],
                                        prequantized=True, zx=prev[3])
                else:
                    y = _conv_int8_core(as_f(prev), node, qp,
                                        tensor_scales[node.inputs[0]],
                                        prequantized=False,
                                        zx=zof(node.inputs[0]))
                y = _activate(y, node.activation)
                if want_q(node):
                    s, z = tensor_scales[node.index], zof(node.index)
                    out = ("q", _quantize_affine(y, s, z), s, z)
                else:
                    out = ("f", y.astype(carrier_dtype))
            else:
                y = _conv_bf16(as_f(prev), node, qp, prec)
                if want_q(node):
                    # int8-ineligible conv whose consumers all read int8
                    # (conv0: Cin=3 keeps the CONV bf16, but its sole
                    # consumer is quantized): quantize in the epilogue —
                    # skips the consumer-side quantize pass AND the bf16
                    # rounding, and halves the activation's HBM traffic
                    s, z = tensor_scales[node.index], zof(node.index)
                    out = ("q", _quantize_affine(y, s, z), s, z)
                else:
                    out = ("f", y)
        elif node.kind == "maxpool":
            if prev[0] == "q":
                out = ("q", _maxpool_int8(prev[1], node), prev[2], prev[3])
            else:
                out = ("f", _maxpool(prev[1], node))
        elif node.kind == "upsample":
            if prev[0] == "q":
                out = ("q", _upsample_nearest(prev[1], node.stride),
                       prev[2], prev[3])
            else:
                out = ("f", _upsample_nearest(prev[1], node.stride))
        elif node.kind == "shortcut":
            a, b = prev, cache[node.inputs[1]]
            # fold both operands' zero-point constants into ONE subtract
            # (z·s terms combine host-side — op-count parity with the
            # symmetric join matters, see _quantize_affine)
            zc = 0.0
            terms = []
            for v in (a, b):
                if v[0] == "q":
                    terms.append(v[1].astype(jnp.float32) * v[2])
                    zc += float(v[3]) * v[2]
                else:
                    terms.append(v[1].astype(jnp.float32))
            y = terms[0] + terms[1]
            if zc:
                y = y - jnp.float32(zc)
            y = _activate(y, node.activation)
            if want_q(node):
                s, z = tensor_scales[node.index], zof(node.index)
                out = ("q", _quantize_affine(y, s, z), s, z)
            else:
                out = ("f", y.astype(carrier_dtype))
        elif node.kind == "route":
            srcs = [prev if i == node.index - 1 else cache[i]
                    for i in node.inputs]
            if len(srcs) == 1:
                out = srcs[0]  # scale/zero ride along, no requantize
            elif want_q(node) and all(v[0] == "q" for v in srcs):
                s, z = tensor_scales[node.index], zof(node.index)
                if tensor_zeros:
                    # fused one-multiply-add requant (asymmetric only —
                    # the symmetric two-multiply form below is pinned
                    # bit-identical to the historical program)
                    parts = [_requantize_affine(v[1], v[2], v[3], s, z)
                             for v in srcs]
                else:
                    parts = [_quantize_affine(
                        _dequantize_affine(v[1], v[2], v[3]), s, z)
                        for v in srcs]
                out = ("q", jnp.concatenate(parts, axis=-1), s, z)
            else:
                out = ("f", jnp.concatenate([as_f(v) for v in srcs],
                                            axis=-1))
        elif node.kind == "yolo":
            if not stop_before_heads:
                heads.append(as_f(prev))
            out = prev
        if node.index in needed:
            cache[node.index] = out
        prev = out
    if upto is not None:
        return heads + [as_f(prev)]
    return heads


def forward_features_int8(graph: Graph, qparams, scales: Dict[int, float],
                          x: jax.Array, precision: Optional[str] = "bf16",
                          chain: bool = True) -> List[jax.Array]:
    """int8 graph walk; mirrors ``model.forward_features``. ``scales`` maps
    conv index → calibrated abs-max input scale (s = absmax/127).
    ``chain=True`` enables direct int8 emission between solely-chained convs
    (see :func:`chain_targets`)."""
    prec = _PRECISIONS[precision]
    needed = graph.needed_outputs
    chains = chain_targets(graph, qparams) if chain else {}
    cache: Dict[int, jax.Array] = {}
    heads: List[jax.Array] = []
    prev = x.astype(jnp.bfloat16) if precision == "bf16" else x
    carrier_dtype = prev.dtype  # activation dtype between ops (bf16 or fp32)
    prev_q = None  # int8 tensor already in THIS node's input scale
    for node in graph.nodes:
        out_q = None
        if node.kind == "convolutional":
            qp = qparams[node.index]
            if "wq" in qp:
                if node.inputs[0] < 0:
                    # stem: exact-u8 int8 input — fixed 1/255 scale, no
                    # calibrated entry needed (see _conv_stem_int8)
                    y = _conv_stem_int8(x, node, qp)
                else:
                    y = _conv_int8_core(prev_q if prev_q is not None else prev,
                                        node, qp, scales[node.index],
                                        prequantized=prev_q is not None)
                y = _activate(y, node.activation)
                if node.index in chains:
                    # emit int8 directly in the consumer's scale; the bf16
                    # tensor for this layer never materializes
                    s_next = scales[chains[node.index]]
                    out_q = jnp.clip(jnp.round(y * (1.0 / s_next)),
                                     -127, 127).astype(jnp.int8)
                    out = out_q  # placeholder; consumer uses out_q
                else:
                    out = y.astype(carrier_dtype)
            else:
                out = _conv_bf16(prev, node, qp, prec)
        elif node.kind == "maxpool":
            out = _maxpool(prev, node)
        elif node.kind == "upsample":
            out = _upsample_nearest(prev, node.stride)
        elif node.kind == "shortcut":
            out = _activate(prev + cache[node.inputs[1]], node.activation)
        elif node.kind == "route":
            srcs = [prev if i == node.index - 1 else cache[i]
                    for i in node.inputs]
            out = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
        elif node.kind == "yolo":
            heads.append(prev)
            out = prev
        if node.index in needed:
            cache[node.index] = out
        prev = out
        prev_q = out_q
    return heads


def forward_compact_int8(graph: Graph, qparams, scales, x,
                         precision: Optional[str] = "bf16",
                         decode_impl: str = "xla",
                         carrier: str = "bf16",
                         block_impl: str = "xla",
                         zeros: Optional[Dict[int, int]] = None):
    """int8 serving forward → (boxes, scores, classes), compact decode.

    ``carrier="int8"`` runs the int8-activation-carrier walk (``scales``
    must then be per-TENSOR scales from :func:`calibrate_tensors`);
    ``carrier="bf16"`` is the per-conv-input-quantize walk (``scales`` from
    :func:`calibrate`). ``zeros``: per-tensor zero-points for the
    asymmetric scheme (int8 carrier only — see
    :func:`calibrate_tensors_affine`)."""
    if decode_impl == "pallas":
        from .model import pad_head_params
        from .ops.pallas_decode import decode_compact_pallas as _decode

        qparams = pad_head_params(graph, qparams)
    else:
        from .ops.decode import decode_compact as _decode

    if carrier == "int8":
        heads = forward_features_int8_carrier(graph, qparams, scales, x,
                                              precision,
                                              block_impl=block_impl,
                                              tensor_zeros=zeros)
    else:
        heads = forward_features_int8(graph, qparams, scales, x, precision)
    yolo_nodes = graph.yolo_nodes
    return _decode(
        heads, [n.anchors for n in yolo_nodes], list(graph.head_strides()),
        yolo_nodes[0].classes)


def forward_packed_int8(graph: Graph, qparams, scales, x, prob_thresh: float,
                        precision: Optional[str] = "bf16",
                        carrier: str = "bf16",
                        block_impl: str = "xla",
                        zeros: Optional[Dict[int, int]] = None):
    """int8 serving forward → (payload (B, N, 8), scores (B, N)) for
    ``ops.nms.batched_nms_packed`` (see ``model.forward_packed``)."""
    from .model import pad_head_params
    from .ops.pallas_decode import decode_packed_pallas

    qparams = pad_head_params(graph, qparams)
    if carrier == "int8":
        heads = forward_features_int8_carrier(graph, qparams, scales, x,
                                              precision,
                                              block_impl=block_impl,
                                              tensor_zeros=zeros)
    else:
        heads = forward_features_int8(graph, qparams, scales, x, precision)
    yolo_nodes = graph.yolo_nodes
    return decode_packed_pallas(
        heads, [n.anchors for n in yolo_nodes], list(graph.head_strides()),
        yolo_nodes[0].classes, prob_thresh=prob_thresh)


def forward_packed_fused_int8(graph: Graph, qparams, scales, x,
                              prob_thresh: float,
                              precision: Optional[str] = "bf16",
                              carrier: str = "int8",
                              block_impl: str = "xla",
                              zeros: Optional[Dict[int, int]] = None):
    """``forward_packed_int8`` with the 1×1 head convs FUSED into the
    decode kernel (``ops.pallas_decode.decode_packed_head_fused_pallas``):
    the int8-carrier walk stops at each pre-head activation (dequantized
    to the carrier dtype — its q/f form is fixed by the full graph's
    consumer sets, so the shared prefix is the exact program the unfused
    walk runs) and the head projection runs as an in-kernel MXU dot — the
    (B, g, g, C_pad) head maps never round-trip HBM. Quantized head
    weights (``include_heads``) are dequantized at trace time (≤1 MB of
    weights); the projection itself then accumulates in f32. Callers gate
    on ``model.fused_heads_eligible``; int8-carrier only (``carrier="bf16"``
    falls back to :func:`forward_packed_int8`)."""
    from .model import pad_head_params
    from .ops.pallas_decode import decode_packed_fused_pallas

    if carrier != "int8":
        return forward_packed_int8(graph, qparams, scales, x, prob_thresh,
                                   precision=precision, carrier=carrier,
                                   block_impl=block_impl)
    qparams = pad_head_params(graph, qparams)
    pre = forward_features_int8_carrier(graph, qparams, scales, x,
                                        precision, stop_before_heads=True,
                                        block_impl=block_impl,
                                        tensor_zeros=zeros)
    yolo_nodes = graph.yolo_nodes
    ws, bs = [], []
    for yn in yolo_nodes:
        p = qparams[yn.inputs[0]]
        if "wq" in p:  # --int8-heads: fold the per-channel scale back in
            w = p["wq"].astype(jnp.float32) * p["sw"]
        else:
            w = p["w"]
        ws.append(w.reshape(w.shape[2], w.shape[3]))
        bs.append(p["b"])
    return decode_packed_fused_pallas(
        pre, ws, bs, [n.anchors for n in yolo_nodes],
        list(graph.head_strides()), yolo_nodes[0].classes,
        prob_thresh=prob_thresh)


def _make_stat_fn(method: str, percentile: float):
    """Per-tensor calibration statistic (runs inside the jitted pass).

    ``absmax`` (default): the tensor's abs-max — the round-1/2 scheme; never
    clips, but one outlier activation stretches the scale and wastes int8
    resolution on the whole tensor.

    ``percentile``: the q-th percentile of |t| — the standard PTQ outlier
    guard (TensorRT/ORT expose the same knob); values above the scale
    SATURATE (every quantize site here is a clipped round, ``_quantize_to``
    / ``_conv_int8_core``), trading rare clipped outliers for finer
    resolution everywhere else. Aggregation across calibration batches is
    max-of-per-batch-percentiles — a conservative approximation of the
    dataset percentile that needs no cross-batch histogram state.
    """
    if method == "absmax":
        return lambda t: jnp.max(jnp.abs(t))
    if method == "percentile":
        if not 0.0 < percentile <= 100.0:
            raise ValueError(f"percentile must be in (0, 100], "
                             f"got {percentile}")
        return lambda t: jnp.percentile(jnp.abs(t), percentile)
    raise ValueError(f"unknown calibration method {method!r} "
                     "(expected 'absmax' or 'percentile')")


def _calibration_walk(graph: Graph, params, x: jax.Array,
                      precision: Optional[str], visit) -> None:
    """The ONE float reference walk behind every calibration-side pass
    (scale calibration, per-tensor calibration, bias-correction statistics).

    Runs the fp/bf16 graph on ``x`` and calls ``visit(node, inp, out)`` for
    every node — ``inp`` is the node's primary input (the previous node's
    output, which IS the conv input for conv nodes), ``out`` its own output.
    Runs inside the caller's jit; ``visit`` accumulates into caller state.
    """
    prec = _PRECISIONS[precision]
    needed = graph.needed_outputs
    cache: Dict[int, jax.Array] = {}
    prev = x.astype(jnp.bfloat16) if precision == "bf16" else x
    for node in graph.nodes:
        if node.kind == "convolutional":
            qp = {"w": params[node.index]["w"],
                  "b": params[node.index]["b"]}
            out = _conv_bf16(prev, node, qp, prec)
        elif node.kind == "maxpool":
            out = _maxpool(prev, node)
        elif node.kind == "upsample":
            out = _upsample_nearest(prev, node.stride)
        elif node.kind == "shortcut":
            out = _activate(prev + cache[node.inputs[1]], node.activation)
        elif node.kind == "route":
            srcs = [prev if i == node.index - 1 else cache[i]
                    for i in node.inputs]
            out = (srcs[0] if len(srcs) == 1
                   else jnp.concatenate(srcs, axis=-1))
        else:
            out = prev
        visit(node, prev, out)
        if node.index in needed:
            cache[node.index] = out
        prev = out


def calibrate(graph: Graph, params, batches, precision: Optional[str] = "bf16",
              include_heads: bool = False, method: str = "absmax",
              percentile: float = 99.9) -> Dict[int, float]:
    """Run calibration batches through the fp/bf16 graph recording the
    abs-max (or ``method="percentile"`` q-th percentile, see
    :func:`_make_stat_fn`) input of every eligible conv; returns
    {conv index: scale}.

    ``batches``: iterable of (B, H, W, C) float arrays in [0, 1] (already
    preprocessed — use the same letterbox the serving path uses).
    """
    stat = _make_stat_fn(method, percentile)
    indices = [n.index for n in graph.conv_nodes
               if eligible(graph, n, include_heads)]

    def absmax_pass(params, x):
        maxima = {}

        def visit(node, inp, out):
            if node.kind == "convolutional" and node.index in indices:
                maxima[node.index] = stat(inp.astype(jnp.float32))

        _calibration_walk(graph, params, x, precision, visit)
        return maxima

    run = jax.jit(absmax_pass)
    agg: Dict[int, float] = {i: 0.0 for i in indices}
    for x in batches:
        maxima = run(params, jnp.asarray(x))
        for i in indices:
            agg[i] = max(agg[i], float(maxima[i]))
    return {i: max(agg[i], 1e-6) / 127.0 for i in indices}


def calibrate_tensors(graph: Graph, params, batches,
                      precision: Optional[str] = "bf16",
                      method: str = "absmax",
                      percentile: float = 99.9) -> Dict[int, float]:
    """Per-TENSOR calibration for the int8 activation carrier: run the
    fp/bf16 graph over calibration batches recording the abs-max (or
    ``method="percentile"`` q-th percentile, see :func:`_make_stat_fn`) of
    EVERY node's output; returns {node index: scale}. A conv's input scale
    is its input tensor's scale, so this is a superset of
    :func:`calibrate`'s per-conv-input view (the input of conv i IS the
    output of node ``inputs[0]``)."""
    stat = _make_stat_fn(method, percentile)

    def absmax_pass(params, x):
        maxima = {}

        def visit(node, inp, out):
            maxima[node.index] = stat(out.astype(jnp.float32))

        _calibration_walk(graph, params, x, precision, visit)
        return maxima

    run = jax.jit(absmax_pass)
    agg: Dict[int, float] = {}
    for x in batches:
        maxima = run(params, jnp.asarray(x))
        for i, m in maxima.items():
            agg[i] = max(agg.get(i, 0.0), float(m))
    return {i: max(m, 1e-6) / 127.0 for i, m in agg.items()}


def calibrate_tensors_affine(graph: Graph, params, batches,
                             precision: Optional[str] = "bf16",
                             method: str = "minmax",
                             percentile: float = 99.9):
    """Per-tensor AFFINE calibration for ``act_scheme="asymmetric"``:
    records every node output's (min, max) range over the calibration set
    and maps it onto the int8 carrier as ``x = s·(q − z)`` with
    ``s = (hi − lo)/254`` and the zero-point ``z`` placed so lo ↦ −127,
    hi ↦ +127 and **x = 0 stays exactly representable** (the range always
    includes 0 — padding and ReLU-family zeros must quantize exactly).
    Returns ``(scales, zeros)``: {node index: s}, {node index: int z}.

    One-sided tensors (LeakyReLU outputs: lo ≈ −0.1·hi) nearly double
    their effective resolution vs the symmetric scheme, which spends half
    its range on values that never occur — measured error budget in
    BASELINE.md round-5. ``method="percentile"`` clips the range to the
    two-sided (100−q, q) percentiles (max-aggregated across batches like
    :func:`_make_stat_fn`); ``"minmax"`` is the absmax analogue.
    """
    if method == "minmax":
        lo_stat = lambda t: jnp.min(t)          # noqa: E731
        hi_stat = lambda t: jnp.max(t)          # noqa: E731
    elif method == "percentile":
        if not 0.0 < percentile <= 100.0:
            raise ValueError(f"percentile must be in (0, 100], "
                             f"got {percentile}")
        lo_stat = lambda t: jnp.percentile(t, 100.0 - percentile)  # noqa: E731
        hi_stat = lambda t: jnp.percentile(t, percentile)          # noqa: E731
    else:
        raise ValueError(f"unknown affine calibration method {method!r} "
                         "(expected 'minmax' or 'percentile')")

    def range_pass(params, x):
        acc = {}

        def visit(node, inp, out):
            f = out.astype(jnp.float32)
            acc[node.index] = (lo_stat(f), hi_stat(f))

        _calibration_walk(graph, params, x, precision, visit)
        return acc

    run = jax.jit(range_pass)
    agg: Dict[int, tuple] = {}
    for x in batches:
        for i, (lo, hi) in run(params, jnp.asarray(x)).items():
            plo, phi = agg.get(i, (np.inf, -np.inf))
            agg[i] = (min(plo, float(lo)), max(phi, float(hi)))
    scales: Dict[int, float] = {}
    zeros: Dict[int, int] = {}
    for i, (lo, hi) in agg.items():
        lo, hi = min(lo, 0.0), max(hi, 0.0)
        s = max(hi - lo, 1e-6) / 254.0
        scales[i] = s
        zeros[i] = int(np.clip(round(-127.0 - lo / s), -127, 127))
    return scales, zeros


def _input_scale(graph: Graph, node: Node, scales: Dict[int, float],
                 carrier: str) -> float:
    """The activation scale a quantized conv's input is rounded with.

    ``carrier="int8"``: inputs arrive already quantized in the PRODUCER
    tensor's scale (``calibrate_tensors`` keys by node index);
    ``carrier="bf16"``: each conv quantizes its own input with its per-conv
    calibrated scale (``calibrate`` keys by conv index)."""
    return (scales[node.inputs[0]] if carrier == "int8"
            else scales[node.index])


def collect_input_stats(graph: Graph, params, scales: Dict[int, float],
                        conv_indices, batches, carrier: str = "int8",
                        precision: Optional[str] = "bf16",
                        zeros: Optional[Dict[int, int]] = None,
                        ) -> Dict[int, tuple]:
    """Per-channel input statistics for :func:`bias_correct`.

    For each conv in ``conv_indices`` returns ``(mu, eps)`` — both (C_in,)
    float64 — where ``mu`` is the mean of the conv's float input per channel
    over the calibration set (batch × spatial), and ``eps`` the mean
    quantization residual ``x − dequant(quant(x))`` under the scale (and,
    for the asymmetric scheme, zero-point — ``zeros``) the int8 pipeline
    actually rounds that input with (:func:`_input_scale`).
    The stem conv's exact-u8 representation has scale 1/255 and no clipping
    (preprocessed pixels live in [0, 1]), so its residual is pure resize
    rounding, ≤ 0.5/255.
    """
    wanted = frozenset(conv_indices)
    zof = ((lambda i: zeros.get(i, 0)) if zeros else (lambda i: 0))

    def stats_pass(params, x):
        acc = {}

        def visit(node, inp, out):
            if node.kind != "convolutional" or node.index not in wanted:
                return
            f = inp.astype(jnp.float32)
            if node.inputs[0] < 0:  # stem: exact-u8 scheme
                deq = jnp.round(f * 255.0) * (1.0 / 255.0)
            else:
                s = jnp.float32(_input_scale(graph, node, scales, carrier))
                z = zof(node.inputs[0]) if carrier == "int8" else 0
                deq = _dequantize_affine(_quantize_affine(f, s, z), s, z)
            acc[node.index] = (
                jnp.sum(f, axis=(0, 1, 2)),
                jnp.sum(f - deq, axis=(0, 1, 2)),
                jnp.float32(f.shape[0] * f.shape[1] * f.shape[2]),
            )

        _calibration_walk(graph, params, x, precision, visit)
        return acc

    run = jax.jit(stats_pass)
    sums: Dict[int, list] = {}
    for x in batches:
        acc = run(params, jnp.asarray(x))
        for i, (s_in, s_res, n) in acc.items():
            mu_s, eps_s, cnt = sums.get(i, (0.0, 0.0, 0.0))
            sums[i] = [mu_s + np.asarray(s_in, np.float64),
                       eps_s + np.asarray(s_res, np.float64),
                       cnt + float(n)]
    return {i: (mu_s / cnt, eps_s / cnt) for i, (mu_s, eps_s, cnt)
            in sums.items()}


def bias_correct(graph: Graph, params, qparams, scales: Dict[int, float],
                 batches, carrier: str = "int8",
                 precision: Optional[str] = "bf16",
                 zeros: Optional[Dict[int, int]] = None):
    """DFQ-style post-training bias correction (Nagel et al., arXiv
    1906.04721 §4 — standard PTQ; technique reference only, no reference-repo
    counterpart: the torch baseline has no quantization at all).

    Quantization shifts each conv's expected pre-activation: weight rounding
    replaces ``W`` with ``W̃ = s_w·W_q``, and input rounding replaces ``x``
    with ``x̃ = x − ε``. Per output channel (spatially-constant-mean
    approximation, edge padding ignored — the standard DFQ simplification)::

        E[Wx] − E[W̃x̃] ≈ Σ_taps (W − W̃)·μ  +  Σ_taps W̃·ε

    with ``μ, ε`` measured on the calibration set (:func:`collect_input_stats`,
    one extra jitted pass). Folding that difference into the conv bias makes
    the int8 pre-activation mean match fp32's — a pure host-side qparams
    rewrite: zero runtime cost, and exactly zero correction when the
    quantization is exact. Returns a NEW qparams dict (input untouched);
    only ``"b"`` entries of quantized convs change.

    The one-shot form corrects each conv against the FLOAT walk's input
    distribution (propagated upstream error is second-order); the stem's
    +128 zero-point fold (:func:`quantize_weights`) is additive and commutes
    with this correction.
    """
    idx = [n.index for n in graph.conv_nodes
           if "wq" in qparams.get(n.index, {})]
    stats = collect_input_stats(graph, params, scales, idx, batches,
                                carrier=carrier, precision=precision,
                                zeros=zeros)
    out = dict(qparams)
    for i in idx:
        qp = qparams[i]
        w = np.asarray(params[i]["w"], np.float64)           # HWIO
        w_dq = (np.asarray(qp["wq"], np.float64)
                * np.asarray(qp["sw"], np.float64))          # broadcast over O
        mu, eps = stats[i]
        delta = (np.einsum("hwic,i->c", w - w_dq, mu)
                 + np.einsum("hwic,i->c", w_dq, eps))
        b = np.asarray(qp["b"], np.float64) + delta
        out[i] = {**qp, "b": jnp.asarray(b.astype(np.float32))}
    return out
