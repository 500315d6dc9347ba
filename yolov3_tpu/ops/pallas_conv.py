"""Pallas TPU kernel: fused 3×3/stride-1 conv + bias + LeakyReLU.

The north star names the hot conv+BN+LeakyReLU blocks as Pallas-fusion
targets (BN is already folded into the weights at load, so the fused op is
conv+bias+leaky). This kernel covers the layers where YOLOv3's FLOPs live —
the 3×3 stride-1 SAME convs of the residual stages and heads (Cin ≥ 128) —
and is selectable per-model via ``conv_impl="pallas"``; everything else
(1×1s, stride-2 downsamples, the 3-channel stem) stays on XLA's conv.

Design notes (Mosaic constraints drive the layout):

* VMEM slices must be 8-aligned along the sublane dim, so shifted (halo)
  windows can't be cut from one resident slab. Instead each of the 9 taps is
  its own **HBM→VMEM DMA** (DMA engines handle unaligned sources); all nine
  start up front and each is awaited right before its matmul, so later
  transfers overlap earlier compute.
* W pads to a multiple of 8 (``W8``) and H to a multiple of the row tile, so
  every in-kernel reshape is layout-free and the output block is fully
  aligned; the padded result is sliced back to (H, W) by XLA outside.
* taps reshape to ``(TH·W8, Cin)`` and hit the MXU against ``(Cin, TCout)``
  weight blocks with fp32 accumulation; bias + LeakyReLU + downcast run
  in-register before the single output write.

SURVEY.md §7 ranks this the lowest-certainty perf item (XLA's conv is a tuned
library op); it ships behind a flag with an honest microbenchmark in
``tools/bench_pallas_conv.py``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def supported(node_size: int, node_stride: int, c_in: int,
              activation: str) -> bool:
    """Kernel eligibility: 3×3 stride-1 SAME convs with lane-aligned Cin.

    Spatial dims are NOT constrained — the kernel pads H to the row tile
    and W to the sublane boundary internally (ADVICE.md round 1: the old
    h/w parameters were accepted but never used; dropped)."""
    return (node_size == 3 and node_stride == 1 and c_in % 128 == 0
            and activation in ("leaky", "linear"))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tiles(h: int, w8: int, c_in: int, c_out: int, itemsize: int,
                tap_buffers: int = 9):
    """Row tile + cout tile under the VMEM budget. tc must divide c_out.

    ``tap_buffers``: resident input buffers the kernel variant allocates —
    9 tap slabs for the DMA variant, 1 halo slab for the roll variant
    (budgeting 9 for roll would shrink its tiles ~4.5× below what fits).
    """
    tc = c_out
    for cand in (256, 128, 64, 32):
        if c_out >= cand and c_out % cand == 0:
            tc = cand
            break
    for th in (16, 8, 4, 2, 1):
        taps = tap_buffers * (th + 2) * w8 * c_in * itemsize
        wblk = 9 * c_in * tc * itemsize
        acc = th * w8 * tc * 4
        out = th * w8 * tc * itemsize
        if taps + wblk + acc + out <= _VMEM_BUDGET:
            return th, tc
    return 1, tc


def _conv3x3_kernel(x0_hbm, x1_hbm, x2_hbm, w_ref, b_ref, o_ref, taps_ref,
                    acc_ref, sems, *, th, w8, c_in, leaky: bool, out_dtype):
    # x{0,1,2}_hbm: the three column-shifted copies (B, Hp+2, W8, Cin); the
    # row (ky) shift rides the DMA offset on a MAJOR dim — Mosaic requires
    # 8-aligned offsets on the two minor dims even for HBM DMA sources, so
    # the kx shift can't be a runtime slice and is materialized host-side
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    xs = (x0_hbm, x1_hbm, x2_hbm)

    def tap_dma(k):
        ky, kx = k // 3, k % 3
        return pltpu.make_async_copy(
            xs[kx].at[bi, pl.ds(hi * th + ky, th), :, :],
            taps_ref.at[k], sems.at[k])

    for k in range(9):
        tap_dma(k).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for k in range(9):
        tap_dma(k).wait()
        patch = taps_ref[k].reshape(th * w8, c_in)
        acc_ref[:] += jnp.dot(patch, w_ref[k * c_in:(k + 1) * c_in, :],
                              preferred_element_type=jnp.float32)
    y = acc_ref[:] + b_ref[0:1, :]
    if leaky:
        y = jnp.where(y > 0, y, 0.1 * y)
    o_ref[:] = y.reshape(th, w8, -1).astype(out_dtype)


def _conv3x3_roll_kernel(x_hbm, w_ref, b_ref, o_ref, slab_ref, acc_ref, sem,
                         *, th, ws, w8, c_in, leaky: bool, out_dtype):
    # one slab DMA per program; kx shifts happen in-register via pltpu.roll
    # (the wrapped columns land beyond w8-2 — padding that the caller slices
    # off), so no shifted HBM copies and 1× input traffic
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(hi * th, th + 2), :, :], slab_ref, sem)
    dma.start()
    dma.wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for ky in range(3):
        rows = slab_ref[ky:ky + th, :, :]  # major-dim slice: no relayout
        # Mosaic's rotate only handles 32-bit data; bf16 rolls via f32
        rows32 = rows.astype(jnp.float32)
        for kx in range(3):
            # positive-shift rotate: shifted[:, j] = rows[:, j + kx]
            shifted = (pltpu.roll(rows32, ws - kx, 1) if kx
                       else rows32).astype(rows.dtype)
            patch = shifted[:, :w8, :].reshape(th * w8, c_in)
            k = ky * 3 + kx
            acc_ref[:] += jnp.dot(patch, w_ref[k * c_in:(k + 1) * c_in, :],
                                  preferred_element_type=jnp.float32)
    y = acc_ref[:] + b_ref[0:1, :]
    if leaky:
        y = jnp.where(y > 0, y, 0.1 * y)
    o_ref[:] = y.reshape(th, w8, -1).astype(out_dtype)


def conv3x3_fused_roll(x: jax.Array, w_hwio: jax.Array, b: jax.Array,
                       activation: str = "leaky", interpret: bool = False
                       ) -> jax.Array:
    """Roll-variant of :func:`conv3x3_fused` — same semantics, one input DMA
    per tile instead of nine, column taps via in-register rotate."""
    batch, h, w_dim, c_in = x.shape
    c_out = w_hwio.shape[3]
    w8 = _round_up(w_dim, 8)
    ws = _round_up(w8 + 2, 8)  # slab width: halo included, sublane-aligned
    th, tc = _pick_tiles(h, ws, c_in, c_out, x.dtype.itemsize, tap_buffers=1)
    hp = _round_up(h, th)

    xp = jnp.pad(x, ((0, 0), (1, hp - h + 1), (1, ws - w_dim - 1), (0, 0)))
    w_flat = w_hwio.reshape(9 * c_in, c_out).astype(x.dtype)
    b_pad = jnp.broadcast_to(b.astype(jnp.float32), (8, c_out))

    kernel = partial(_conv3x3_roll_kernel, th=th, ws=ws, w8=w8, c_in=c_in,
                     leaky=(activation == "leaky"), out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, hp, w8, c_out), x.dtype),
        grid=(batch, hp // th, c_out // tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((9 * c_in, tc), lambda bi, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tc), lambda bi, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, th, w8, tc),
                               lambda bi, hi, ci: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2, ws, c_in), x.dtype),
            pltpu.VMEM((th * w8, tc), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c_in * tc * th * w8,
            bytes_accessed=(th + 2) * ws * c_in * x.dtype.itemsize
            + 9 * c_in * tc * x.dtype.itemsize
            + th * w8 * tc * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_flat, b_pad)
    return out[:, :h, :w_dim, :]


def _pick_tiles2(h: int, ws: int, w8: int, c_in: int, c_out: int,
                 itemsize: int, slab_buffers: int = 5):
    """Tile picker for the pipelined roll variant.

    Unlike :func:`_pick_tiles` it also tries divisor row tiles (th = h,
    h/2, …) so hot YOLOv3 heights (19/38/76) pad to ZERO wasted rows —
    power-of-two tiles waste up to 26% of the MXU work on padding
    (h=38 → hp=48). Preference: highest real-row efficiency, then the
    largest tile (fewer roll passes, bigger matmuls).
    """
    for tc in (256, 128, 64, 32):
        if c_out < tc or c_out % tc:
            continue
        cands = ({h} | {h // k for k in (2, 3, 4) if h % k == 0}
                 | {32, 16, 8, 4, 2, 1})
        best = None
        for th in sorted(cands, reverse=True):
            if not 1 <= th <= 64:
                continue
            need = (slab_buffers * (th + 2) * ws * c_in * itemsize
                    + 2 * 9 * c_in * tc * itemsize      # w block, pipelined
                    + th * w8 * tc * 4                   # f32 accumulator
                    + 2 * th * w8 * tc * itemsize)       # out block, pipelined
            if need > _VMEM_BUDGET:
                continue
            eff = h / _round_up(h, th)
            if th * w8 < 128:  # sub-MXU-height matmuls: only as a last resort
                eff *= 0.8
            if best is None or (eff, th) > best[:2]:
                best = (eff, th)
        if best is not None:
            return best[1], tc
    return 1, c_out


def _conv3x3_roll2_kernel(x_hbm, w_ref, b_ref, o_ref, slabs_ref, taps_ref,
                          acc_ref, sems, *, th, ws, w8, c_in, nh, nt,
                          leaky: bool, out_dtype):
    """Pipelined roll variant (round 2, VERDICT.md #2):

    * the halo slab is DMA'd **once per (batch, row-tile)** and reused across
      every cout tile (the ci grid dim is fastest) — the original re-DMA'd it
      per ci step;
    * slab DMAs are **double-buffered across grid steps**: while tile ``t``
      computes, tile ``t+1``'s slab is in flight (2-slot scratch + per-slot
      semaphores);
    * the 9 per-tap f32 casts+rolls collapse to 3: each kx shift is rolled
      ONCE over the full slab (all th+2 rows) and cached in ``taps_ref``; ky
      taps are free major-dim slices of it (~3.7× less VPU traffic).
    """
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    t = bi * nh + hi

    def slab_dma(tt, slot):
        return pltpu.make_async_copy(
            x_hbm.at[tt // nh, pl.ds((tt % nh) * th, th + 2), :, :],
            slabs_ref.at[slot], sems.at[slot])

    @pl.when(ci == 0)
    def _prepare():
        @pl.when(t == 0)
        def _cold_start():
            slab_dma(0, 0).start()

        @pl.when(t + 1 < nt)
        def _prefetch_next():
            slab_dma(t + 1, (t + 1) % 2).start()

        slab_dma(t, t % 2).wait()
        slab = slabs_ref[t % 2]
        # Mosaic's rotate handles 32-bit only; bf16 rolls via f32 — but just
        # once per kx over the whole slab, not per (ky, kx) row window.
        # The three kx taps are written side-by-side on the LANE dim
        # (taps[..., kx*Cin:(kx+1)*Cin], 128-aligned offsets), so each ky
        # row-window is ONE K=3·Cin matmul instead of three K=Cin ones —
        # the MXU runs ~2× faster at K=768 than K=256 (XLA's own conv shows
        # the same depth cliff: 136 TF/s at K=512 vs ~72 TF/s at K=256).
        slab32 = slab.astype(jnp.float32)
        taps_ref[:, :, 0:c_in] = slab
        taps_ref[:, :, c_in:2 * c_in] = pltpu.roll(slab32, ws - 1,
                                                   1).astype(slab.dtype)
        taps_ref[:, :, 2 * c_in:3 * c_in] = pltpu.roll(slab32, ws - 2,
                                                       1).astype(slab.dtype)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for ky in range(3):
        # taps[r, j, kx*Cin + c] = slab[r, j + kx, c]; w_flat rows are
        # k=ky*3+kx major, i.e. contiguous (3·Cin, tc) per ky — layouts match
        patch = taps_ref[ky:ky + th, :w8, :].reshape(th * w8, 3 * c_in)
        acc_ref[:] += jnp.dot(
            patch, w_ref[ky * 3 * c_in:(ky + 1) * 3 * c_in, :],
            preferred_element_type=jnp.float32)
    y = acc_ref[:] + b_ref[0:1, :]
    if leaky:
        y = jnp.where(y > 0, y, 0.1 * y)
    o_ref[:] = y.reshape(th, w8, -1).astype(out_dtype)


def conv3x3_fused_roll2(x: jax.Array, w_hwio: jax.Array, b: jax.Array,
                        activation: str = "leaky", interpret: bool = False
                        ) -> jax.Array:
    """Pipelined roll variant — same semantics as :func:`conv3x3_fused`,
    with slab reuse across cout tiles, cross-step DMA double buffering, and
    3 (not 9) column rolls per tile. See ``_conv3x3_roll2_kernel``."""
    batch, h, w_dim, c_in = x.shape
    c_out = w_hwio.shape[3]
    w8 = _round_up(w_dim, 8)
    ws = _round_up(w8 + 2, 8)  # slab width: halo included, sublane-aligned
    # resident slab-sized buffers: 2 DMA slots + the 3*c_in-wide tap cache
    # (= 3 slab equivalents) — 5 total (round-2 review: the old default of
    # 4 understated VMEM by one slab)
    th, tc = _pick_tiles2(h, ws, w8, c_in, c_out, x.dtype.itemsize)
    hp = _round_up(h, th)
    nh, nt = hp // th, batch * (hp // th)

    xp = jnp.pad(x, ((0, 0), (1, hp - h + 1), (1, ws - w_dim - 1), (0, 0)))
    w_flat = w_hwio.reshape(9 * c_in, c_out).astype(x.dtype)
    b_pad = jnp.broadcast_to(b.astype(jnp.float32), (8, c_out))

    kernel = partial(_conv3x3_roll2_kernel, th=th, ws=ws, w8=w8, c_in=c_in,
                     nh=nh, nt=nt, leaky=(activation == "leaky"),
                     out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, hp, w8, c_out), x.dtype),
        grid=(batch, nh, c_out // tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((9 * c_in, tc), lambda bi, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tc), lambda bi, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, th, w8, tc),
                               lambda bi, hi, ci: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, ws, c_in), x.dtype),     # DMA slots
            pltpu.VMEM((th + 2, ws, 3 * c_in), x.dtype),    # lane-concat taps
            pltpu.VMEM((th * w8, tc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c_in * tc * th * w8,
            bytes_accessed=(th + 2) * ws * c_in * x.dtype.itemsize
            + 9 * c_in * tc * x.dtype.itemsize
            + th * w8 * tc * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_flat, b_pad)
    return out[:, :h, :w_dim, :]


def conv3x3_fused(x: jax.Array, w_hwio: jax.Array, b: jax.Array,
                  activation: str = "leaky", interpret: bool = False
                  ) -> jax.Array:
    """Fused 3×3 s1 SAME conv + bias + activation.

    x: (B, H, W, Cin) with Cin % 128 == 0; w: (3, 3, Cin, Cout); b: (Cout,).
    Matches ``lax.conv_general_dilated`` + bias + leaky to fp32-accumulation
    accuracy. Output dtype follows x.
    """
    batch, h, w_dim, c_in = x.shape
    c_out = w_hwio.shape[3]
    w8 = _round_up(w_dim, 8)
    th, tc = _pick_tiles(h, w8, c_in, c_out, x.dtype.itemsize)
    hp = _round_up(h, th)

    # pad: +1 halo each side in H/W, then up to (Hp+2, W8+2) so every tap DMA
    # window (th rows × w8 cols) is in-bounds at any (ky, kx) offset; the
    # three kx shifts materialize as copies (cheap bandwidth vs the matmuls)
    xp = jnp.pad(x, ((0, 0), (1, hp - h + 1), (1, w8 - w_dim + 1), (0, 0)))
    x_shift = [xp[:, :, kx:kx + w8, :] for kx in range(3)]
    w_flat = w_hwio.reshape(9 * c_in, c_out).astype(x.dtype)
    b_pad = jnp.broadcast_to(b.astype(jnp.float32), (8, c_out))

    kernel = partial(_conv3x3_kernel, th=th, w8=w8, c_in=c_in,
                     leaky=(activation == "leaky"), out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, hp, w8, c_out), x.dtype),
        grid=(batch, hp // th, c_out // tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((9 * c_in, tc), lambda bi, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tc), lambda bi, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, th, w8, tc),
                               lambda bi, hi, ci: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((9, th, w8, c_in), x.dtype),
            pltpu.VMEM((th * w8, tc), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c_in * tc * th * w8,
            bytes_accessed=9 * th * w8 * c_in * x.dtype.itemsize
            + 9 * c_in * tc * x.dtype.itemsize
            + th * w8 * tc * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_shift[0], x_shift[1], x_shift[2], w_flat, b_pad)
    return out[:, :h, :w_dim, :]
