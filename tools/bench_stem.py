"""Microbenchmark: the yolov3 stem (conv1 3->32 @608 + conv2 32->64 s2).

DESIGN.md's bottleneck map has the stem at 6.4 ms @ b128 bf16 — conv1's
(B,608,608,32) activation (3 GB bf16) written + re-read at HBM speed. This
measures each conv and space-to-depth (s2d) reformulations that trade the
thin-Cin conv (K=27, MXU-starved) for a dense one:

  conv1_s2d: input (B,304,304,12) [2x2 blocks], 3x3 conv -> (B,304,304,128)
             = the four H/W phases of conv1's output, channel-blocked.
             K = 9*12 = 108 (vs 27), output IS y1 in s2d layout.
  conv2_s2d: 2x2 conv over y1-s2d, K = 4*128 = 512, N = 64; taps (0,+1) on
             the 304-grid cover conv2's 3x3/s2 receptive field exactly.

Weights for both are exact rearrangements of the originals (zero-filled
where a tap falls outside the 3x3 support) — parity is asserted vs the
naive stem before timing.

Run: python tools/bench_stem.py [--batch 128] [--dtype bf16]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from tools.bench_pallas_conv import timeit_scanned


def leaky(y):
    return jnp.where(y > 0, y, 0.1 * y)


def conv(x, w, b, stride=1, pad=1):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return leaky(y + b.astype(y.dtype))


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order (ph, pw, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def conv1_s2d_weights(w1):
    """(3,3,3,32) -> (3,3,12,128) computing all four phases of conv1 on the
    s2d input. Output channel block (ph, pw, co); input channel (ih, iw, ci).

    Phase (ph, pw) of y1 at s2d cell (H', W') is y1[2H'+ph, 2W'+pw] =
    sum_{dh,dw} w1[dh,dw] * in[2H'+ph+dh-1, 2W'+pw+dw-1]. Input pixel
    (2H'+ph+dh-1) lives at s2d cell H'+ (ph+dh-1)//2, phase (ph+dh-1)%2 —
    cells H'-1..H'+1, i.e. a 3x3 s2d conv with ~half the taps zero.
    """
    w = np.zeros((3, 3, 12, 128), np.float32)
    w1 = np.asarray(w1, np.float32)
    for ph in range(2):
        for pw in range(2):
            for dh in range(3):
                for dw in range(3):
                    # pixel offset o = ph+dh-1 in -1..2 -> s2d cell
                    # floor(o/2) in -1..1 (kernel tap sh = cell+1), phase
                    # o mod 2; divmod(o+2, 2) = (cell+1, phase) directly
                    sh, ih = divmod(ph + dh - 1 + 2, 2)
                    sw, iw = divmod(pw + dw - 1 + 2, 2)
                    for ci in range(3):
                        w[sh, sw, (ih * 2 + iw) * 3 + ci,
                          (ph * 2 + pw) * 32:(ph * 2 + pw + 1) * 32] += \
                            w1[dh, dw, ci]
    return jnp.asarray(w)


def conv2_s2d_weights(w2):
    """(3,3,32,64) -> (2,2,128,64): conv2 (s2) over y1-s2d.

    conv2 out[h,w] = sum_{dh,dw} w2[dh,dw] * y1[2h+dh-1, 2w+dw-1]; y1 index
    2h+d-1 lives at s2d cell h + (d-1+2)//2 - 1 in {h-1? no: d in 0..2 ->
    2h-1..2h+1 -> cells h-1(phase1), h(phase0), h(phase1)}. Shifting the
    conv window by SAME padding (pad=1 on the 608 grid = pad (1,0) style on
    the s2d grid) is handled by using taps on cells {h-1, h} — equivalently
    a 2x2 conv with pad (1,0)x(1,0) low-only.
    """
    w = np.zeros((2, 2, 128, 64), np.float32)
    w2 = np.asarray(w2, np.float32)
    for dh in range(3):
        for dw in range(3):
            ch, ph = divmod(dh - 1 + 2, 2)  # cell offset in {0,1}, phase
            cw, pw = divmod(dw - 1 + 2, 2)
            # cell offset: (dh-1) = -1 -> cell h-1 (tap 0 with pad 1 low);
            # 0,1 -> cell h (tap 1)
            for ci in range(32):
                w[ch, cw, (ph * 2 + pw) * 32 + ci] += w2[dh, dw, ci]
    return jnp.asarray(w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    b, s = args.batch, args.size
    x = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)), dtype=dtype)
    w1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 32)), dtype=jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.1, (32,)), dtype=jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.08, (3, 3, 32, 64)), dtype=jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, (64,)), dtype=jnp.float32)

    w1s = conv1_s2d_weights(w1)
    w2s = conv2_s2d_weights(w2)

    def stem(x, w1_, b1_):
        return conv(conv(x, w1_, b1_), w2, b2, stride=2)

    def stem_s2d(x, w1s_, b1_):
        xs = s2d(x)
        b1s = jnp.tile(b1_, 4)
        y1s = conv(xs, w1s_, b1s)  # (B, 304, 304, 128) = y1 phases
        y2 = lax.conv_general_dilated(
            y1s, w2s.astype(y1s.dtype), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return leaky(y2 + b2.astype(y2.dtype))

    # parity on a small slice — reduce ON DEVICE and fetch two scalars
    # (the relay D2H runs ~150 KB/s; pulling the full activations stalls
    # the tool for minutes, round-2 review)
    @jax.jit
    def rel_err(x2, w1_, b1_, w1s_):
        ref = stem(x2, w1_, b1_).astype(jnp.float32)
        out = stem_s2d(x2, w1s_, b1_).astype(jnp.float32)
        return (jnp.max(jnp.abs(out - ref)), jnp.max(jnp.abs(ref)))

    d, m = rel_err(x[:2], w1, b1, w1s)
    rel = float(d) / (float(m) + 1e-6)
    print(f"s2d stem parity: max rel {rel:.2e}")
    assert rel < 2e-2, "s2d stem diverges"

    def t(fn, *a):
        return timeit_scanned(fn, *a) * 1e3

    print(f"conv1 naive : {t(lambda x_, w_, bb: conv(x_, w_, bb), x, w1, b1):6.2f} ms")
    print(f"stem naive  : {t(stem, x, w1, b1):6.2f} ms")
    print(f"stem s2d    : {t(stem_s2d, x, w1s, b1):6.2f} ms")


if __name__ == "__main__":
    main()
