"""Pallas TPU kernel: fused int8 residual block (1×1 → 3×3 → shortcut).

darknet53's residual bottlenecks (reference ``yolov3.cfg``: a 1×1 conv
halving channels, a 3×3 conv restoring them, a linear ``[shortcut]`` back to
the block input — SURVEY.md §2.4) dominate the int8-carrier step's
BANDWIDTH, not its FLOPs: unfused, each block writes and re-reads the mid
activation and the 3×3 output and re-reads the block input for the shortcut
(~5 tensor trips/block). The round-3 stage map (docs/DESIGN.md) measured the
early 152²/76² block stages 5–7 ms above their serialized bandwidth floor,
and ``tools/bench_int8_dot.py`` measured the in-kernel int8 dot at the
block's 9-tap lane-concat shapes AT the int8 MXU peak (~405 TOP/s marginal)
— the decision input for this kernel.

This kernel runs the whole block VMEM-resident on the int8 activation
carrier: one input slab DMA per row tile, the 1×1 as one MXU dot, an
in-register quantize to the mid tensor's calibrated scale, the 3×3 as three
per-ky lane-concatenated MXU dots (kx taps side-by-side on the lane dim —
the proven ``pallas_conv`` roll2 formulation), and the dequant → shortcut
add → requantize epilogue fused before the single output DMA. HBM traffic
per block drops to read-input + write-output.

**Numerics contract**: the kernel mimics the unfused int8-carrier walk
(``quant.forward_features_int8_carrier``) op for op, including the
intermediate quantization of the 3×3 output to its calibrated scale before
the shortcut add. The integer convolutions are exact; the only fused-vs-
unfused divergence is at requantization TIES — values within ~1 ulp of a
half-integer multiple of the scale, where float-contraction (FMA) choices
differ between the two compiled programs and flip the rounding by one
quantization step. Measured on CPU interpret: 0.04% of elements, always
exactly one step (60/147k at the 24² micro block; 0 at several other
geometries). Gated in tests/test_pallas_block.py (quant-step bound +
pre-NMS parity bars) and on-chip in tools/tpu_check.py.

**Chain layout**: blocks chain input→output without XLA-side re-padding.
Tensors travel as ``(B, hp+2, ws, C)`` int8 where padded row ``p`` ↔ image
row ``p−1`` and col ``j`` ↔ image col ``j``; pad contents are ARBITRARY
bytes — every consumer masks the mid activation to the true image extent
(the masks, not pre-zeroed pads, carry the 3×3's SAME-padding semantics),
and the shortcut only reads in-image rows. One ``jnp.pad`` enters a chain,
one lazy slice leaves it; the 8-block 76² stage pays the copy twice, not 16
times.

Mosaic constraints that shaped it (same as ``pallas_conv``): minor-dim ref
slices must be 8/128-aligned, so the kx shifts run as ``pltpu.roll`` over
f32 (int8 values are exact in f32) and land at 128-aligned lane offsets —
``c_mid`` pads to the 128 boundary (zero weight rows keep the dot exact;
at 152² this doubles the 3×3 dot's K, still far below the unfused
bandwidth cost).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph import Graph

_VMEM_BUDGET = 12 * 1024 * 1024

# Blocks with c_in above this stay on XLA: the 38²/19² stages measure AT
# their MXU floor already (DESIGN.md round-3 stage map) — fusion there can
# only trade XLA's peak convs for kernel risk. The 152²/76² stages
# (c_in 128/256) are the bandwidth-bound ones this kernel exists for.
DEFAULT_MAX_CIN = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class BlockGeometry(NamedTuple):
    th: int      # row tile (divides hp)
    hp: int      # padded image rows
    ws: int      # slab cols incl. ≥1 right halo col (multiple of 8)
    cp: int      # c_mid padded to the 128-lane boundary


def plan_geometry(h: int, w: int, c_in: int, c_mid: int,
                  c_out: int) -> Optional[BlockGeometry]:
    """Pick the row tile for a (h, w, c_in→c_mid→c_out) block, or None if
    the block is ineligible (lane alignment, channel mismatch) or no tile
    fits the VMEM budget."""
    if c_in % 128 or c_out != c_in or c_mid < 32:
        return None
    cp = _round_up(c_mid, 128)
    ws = _round_up(w + 1, 8)  # ≥1 right halo col for the kx=+1 tap
    cands = sorted({d for d in range(1, min(h, 32) + 1) if h % d == 0}
                   | {8, 4, 2, 1}, reverse=True)
    for th in cands:
        slab_rows = th + 2
        need = (
            2 * slab_rows * ws * c_in          # input slab, double-buffered
            + slab_rows * ws * 3 * cp          # lane-concat mid taps (int8)
            + 8 * slab_rows * ws * cp          # 1×1 epilogue f32/int32 values
            + 4 * th * ws * c_out              # int32 3×3 accumulator
            + 2 * 2 * th * ws * c_out          # out stage ×2 (≤2B elements)
            + c_in * cp + 9 * cp * c_out       # weights
        )
        if need <= _VMEM_BUDGET:
            return BlockGeometry(th, _round_up(h, th), ws, cp)
    return None


def pad_chain_input(xq: jax.Array, geom: BlockGeometry, h: int,
                    w: int) -> jax.Array:
    """(B, h, w, C) int8 → chain layout (B, hp+2, ws, C); one copy per
    chain entry (the only XLA-side pad a chain of blocks pays)."""
    return jnp.pad(xq, ((0, 0), (1, geom.hp - h + 1), (0, geom.ws - w),
                        (0, 0)))


def slice_chain_output(out: jax.Array, h: int, w: int) -> jax.Array:
    """Chain layout → plain (B, h, w, C); lazy — DCE'd when the only
    consumer is the next chained block."""
    return out[:, 1:h + 1, :w, :]


def _block_kernel(x_hbm, w1_ref, w2_ref, deq1_ref, b1_ref, deq2_ref, b2_ref,
                  o_hbm, slabs_ref, taps_ref, acc_ref, stage_ref, in_sems,
                  out_sems, *, th, ws, h, w, c_in, cp, c_out, nh, nt,
                  inv_smid, inv_smid2, smid2, s_in, inv_sout, emit_q,
                  out_dtype):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    t = bi * nh + hi

    def slab_dma(tt, slot):
        return pltpu.make_async_copy(
            x_hbm.at[tt // nh, pl.ds((tt % nh) * th, th + 2), :, :],
            slabs_ref.at[slot], in_sems.at[slot])

    def out_dma(tt):
        return pltpu.make_async_copy(
            stage_ref.at[tt % 2],
            o_hbm.at[tt // nh, pl.ds(1 + (tt % nh) * th, th), :, :],
            out_sems.at[tt % 2])

    @pl.when(t == 0)
    def _cold_start():
        slab_dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _prefetch_next():
        slab_dma(t + 1, (t + 1) % 2).start()

    slab_dma(t, t % 2).wait()
    slab = slabs_ref[t % 2]  # (th+2, ws, c_in) int8

    # ---- 1×1 conv → leaky → mask to the image extent → quantize to s_mid.
    # Computed on ALL slab rows (incl. the halo rows the 3×3 needs); rows
    # and cols outside the image mask to 0 — that masking IS the 3×3's
    # SAME-padding (chain-layout pads hold arbitrary bytes by contract).
    rows1 = (th + 2) * ws
    m1 = jnp.dot(slab.reshape(rows1, c_in), w1_ref[:],
                 preferred_element_type=jnp.int32)
    y1 = m1.astype(jnp.float32) * deq1_ref[0:1, :] + b1_ref[0:1, :]
    y1 = jnp.where(y1 > 0, y1, 0.1 * y1)
    flat = jax.lax.broadcasted_iota(jnp.int32, (rows1, cp), 0)
    gr = flat // ws + (hi * th - 1)     # global image row of each slab row
    gc = flat % ws                      # image col
    valid = (gr >= 0) & (gr < h) & (gc < w)
    y1 = jnp.where(valid, y1, 0.0)
    midq = jnp.clip(jnp.round(y1 * inv_smid), -127, 127).astype(jnp.int8)
    midq = midq.reshape(th + 2, ws, cp)

    # ---- lane-concat taps: kx ∈ {-1, 0, +1} at lane offsets 0/cp/2cp
    # (128-aligned). Mosaic's rotate is 32-bit only; int8 is exact in f32.
    # Wrapped columns land in masked (zero) mid cols, so the rotate's
    # wrap-around IS the conv's zero padding at the image edges.
    taps_ref[:, :, cp:2 * cp] = midq
    mid32 = midq.astype(jnp.float32)
    taps_ref[:, :, 0:cp] = pltpu.roll(mid32, 1, 1).astype(jnp.int8)
    taps_ref[:, :, 2 * cp:3 * cp] = pltpu.roll(mid32, ws - 1,
                                               1).astype(jnp.int8)

    # ---- 3×3: one K=3·cp dot per ky (w2 rows are HWIO-ordered: ky major,
    # then kx, then the cp input lanes — matching the tap lane groups).
    # Computed FULL-WIDTH (all ws cols, pad cols included): int8 VMEM tiles
    # are (32, 128), so a [:w] sublane slice of an int8 ref is only
    # 8-aligned, not tile-aligned — the first on-chip run of a width-sliced
    # variant silently mis-selected sublanes (53% of outputs off by a few
    # quant steps). Full width costs ws/w extra MXU work (5–20%) and zero
    # slices; pad-col garbage is the chain-layout contract.
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for ky in range(3):
        patch = taps_ref[ky:ky + th].reshape(th * ws, 3 * cp)
        acc_ref[:] += jnp.dot(patch, w2_ref[ky * 3 * cp:(ky + 1) * 3 * cp, :],
                              preferred_element_type=jnp.int32)
    y2 = acc_ref[:].astype(jnp.float32) * deq2_ref[0:1, :] + b2_ref[0:1, :]
    y2 = jnp.where(y2 > 0, y2, 0.1 * y2)
    # mimic the unfused carrier walk: the 3×3 output quantizes to ITS
    # calibrated scale before the shortcut dequantizes it back
    y2 = jnp.clip(jnp.round(y2 * inv_smid2), -127, 127) * smid2

    # ---- shortcut (darknet [shortcut] activation=linear) + emission
    xres = slab[1:th + 1].reshape(th * ws, c_in)
    y = y2 + xres.astype(jnp.float32) * s_in
    if emit_q:
        out_val = jnp.clip(jnp.round(y * inv_sout), -127,
                           127).astype(jnp.int8)
    else:
        out_val = y.astype(out_dtype)

    @pl.when(t >= 2)
    def _reclaim_stage():
        out_dma(t - 2).wait()

    stage_ref[t % 2] = out_val.reshape(th, ws, c_out)
    out_dma(t).start()

    @pl.when(t == nt - 1)
    def _drain():
        if nt > 1:
            out_dma(t - 1).wait()
        out_dma(t).wait()


def residual_block_int8(xp: jax.Array, w1q: jax.Array, w2q: jax.Array,
                        deq1: jax.Array, b1: jax.Array, deq2: jax.Array,
                        b2: jax.Array, *, h: int, w: int, s_in: float,
                        s_mid: float, s_mid2: float,
                        s_out: Optional[float], emit_q: bool,
                        carrier_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jax.Array:
    """Fused int8 residual block over a chain-layout tensor.

    ``xp``: (B, hp+2, ws, c_in) int8 chain layout (see module docstring) at
    scale ``s_in``. ``w1q``: (c_in, cp) int8 (1×1 weights, lane-padded);
    ``w2q``: (9·cp, c_out) int8 (3×3 HWIO flattened, input lanes padded);
    ``deq1``/``b1``: (8, cp) f32 rows (sw1·s_in and bias, pads zero);
    ``deq2``/``b2``: (8, c_out) f32 rows (sw2·s_mid and bias). Scales are
    trace-time Python floats. Returns the chain-layout output: int8 at
    ``s_out`` when ``emit_q`` else ``carrier_dtype``.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    batch, rows, ws, c_in = xp.shape
    hp = rows - 2
    cp = w1q.shape[1]
    c_out = w2q.shape[1]
    geom = plan_geometry(h, w, c_in, cp, c_out)
    if geom is None or geom.ws != ws or geom.hp != hp:
        raise ValueError(f"residual_block_int8: input layout {xp.shape} "
                         f"does not match plan_geometry({h}, {w})")
    th = geom.th
    nh = hp // th
    nt = batch * nh
    out_dtype = jnp.int8 if emit_q else jnp.dtype(carrier_dtype)

    kernel = partial(
        _block_kernel, th=th, ws=ws, h=h, w=w, c_in=c_in, cp=cp,
        c_out=c_out, nh=nh, nt=nt,
        inv_smid=1.0 / s_mid, inv_smid2=1.0 / s_mid2, smid2=s_mid2,
        s_in=s_in, inv_sout=(1.0 / s_out if emit_q else 1.0),
        emit_q=emit_q, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, hp + 2, ws, c_out),
                                       out_dtype),
        grid=(batch, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((c_in, cp), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cp, c_out), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c_out), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c_out), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, ws, c_in), jnp.int8),   # input slabs
            pltpu.VMEM((th + 2, ws, 3 * cp), jnp.int8),    # mid taps
            pltpu.VMEM((th * ws, c_out), jnp.int32),       # 3×3 accumulator
            pltpu.VMEM((2, th, ws, c_out), out_dtype),     # out stages
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (th + 2) * ws * c_in * cp + 2 * th * ws * 9 * cp * c_out,
            bytes_accessed=(th + 2) * ws * c_in + th * ws * c_out
            + c_in * cp + 9 * cp * c_out,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w1q, w2q, deq1, b1, deq2, b2)


def prepare_block_params(qp1: Dict, qp2: Dict, s_in: float, s_mid: float,
                         cp: int):
    """Lane-pad and pre-scale a block's weights for the kernel.

    ``qp1``/``qp2``: the 1×1 and 3×3 convs' int8 qparams ({"wq" HWIO int8,
    "sw" (C,) f32, "b" (C,) f32}). The dequant vectors bake the (static)
    input scales so the kernel epilogues are pure multiply-adds, matching
    ``quant._conv_int8_core``'s ``sw·sx`` product bit-for-bit (same f32
    multiply, traced on device either way)."""
    w1 = qp1["wq"].reshape(qp1["wq"].shape[2], qp1["wq"].shape[3])
    c_mid = w1.shape[1]
    c_out = qp2["wq"].shape[3]
    w1 = jnp.pad(w1, ((0, 0), (0, cp - c_mid)))
    deq1 = jnp.pad(qp1["sw"] * jnp.float32(s_in), (0, cp - c_mid))
    b1 = jnp.pad(qp1["b"], (0, cp - c_mid))
    w2 = jnp.pad(qp2["wq"], ((0, 0), (0, 0), (0, cp - c_mid), (0, 0)))
    w2 = w2.reshape(9 * cp, c_out)
    deq2 = qp2["sw"] * jnp.float32(s_mid)
    b2 = qp2["b"]
    rows8 = lambda v, n: jnp.broadcast_to(v.astype(jnp.float32), (8, n))  # noqa: E731
    return (w1, w2, rows8(deq1, cp), rows8(b1, cp), rows8(deq2, c_out),
            rows8(b2, c_out))


def fused_block_plan(graph: Graph, qparams, tensor_scales,
                     max_cin: int = DEFAULT_MAX_CIN) -> Dict[int, Dict]:
    """Static residual-block detection for the int8-carrier walk.

    Returns {start index a: {"cin", "cmid", "cout", "cp"}} for every
    (1×1 conv at a, 3×3 conv at a+1, shortcut at a+2) triple that the fused
    kernel can take over: both convs quantized, leaky, stride 1, the
    shortcut linear and wired (a+1, a−1), neither conv output needed
    elsewhere, channels lane-aligned with c_out == c_in ≤ ``max_cin``, and
    calibrated scales present for the input, mid, and 3×3 tensors. Spatial
    geometry (VMEM fit) is checked at trace time by ``plan_geometry`` —
    this plan is resolution-independent.
    """
    needed = graph.needed_outputs
    nodes = graph.nodes
    plan: Dict[int, Dict] = {}
    for a in range(1, len(nodes) - 2):
        n1, n2, n3 = nodes[a], nodes[a + 1], nodes[a + 2]
        if not (n1.kind == "convolutional" and n1.size == 1
                and n1.stride == 1 and n1.activation == "leaky"
                and n1.inputs == (a - 1,)
                and "wq" in qparams.get(a, {})):
            continue
        if not (n2.kind == "convolutional" and n2.size == 3
                and n2.stride == 1 and n2.pad and n2.activation == "leaky"
                and n2.inputs == (a,) and "wq" in qparams.get(a + 1, {})):
            continue
        if not (n3.kind == "shortcut" and n3.inputs == (a + 1, a - 1)
                and n3.activation == "linear"):
            continue
        if a in needed or (a + 1) in needed:
            continue
        cin = nodes[a - 1].out_channels
        cmid, cout = n1.out_channels, n2.out_channels
        if cin % 128 or cout != cin or cin > max_cin or cmid < 32:
            continue
        if not {a - 1, a, a + 1} <= tensor_scales.keys():
            continue
        plan[a] = {"cin": cin, "cmid": cmid, "cout": cout,
                   "cp": _round_up(cmid, 128)}
    return plan
