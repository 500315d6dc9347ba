"""Microbenchmark: Pallas fused 3×3 conv vs XLA's conv on the hot shapes.

Run on the real chip: python tools/bench_pallas_conv.py
Correctness is asserted before timing. Relay-safe sync via scalar fetch.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from yolov3_tpu.ops.pallas_conv import conv3x3_fused

# (label, B, H, W, Cin, Cout) — yolov3's 3×3 s1 residual/head shapes @608
SHAPES = [
    ("76x76x128->256 ", 8, 76, 76, 128, 256),
    ("76x76x256->512 ", 8, 76, 76, 256, 512),
    ("38x38x256->512 ", 8, 38, 38, 256, 512),
    ("38x38x512->1024", 8, 38, 38, 512, 1024),
    ("19x19x512->1024", 8, 19, 19, 512, 1024),
]


def xla_conv(x, w, b):
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    return jnp.where(y > 0, y, 0.1 * y)


def timeit(fn, args, iters=8):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    [float(jnp.sum(o.astype(jnp.float32))) for o in outs[-1:]]
    # chain completion through last output only; single stream is in-order
    return (time.perf_counter() - t0) / iters


def timeit_scanned(fn, x, w, bias, reps=3, lens=(8, 40)):
    """Per-op device time via the shared differential-scan clock
    (tools/bench_clock.py — see it for the RTT-cancellation rationale and
    the full-consumption dependency rules)."""
    from tools.bench_clock import timeit_scanned as _clock

    return _clock(fn, (x, w, bias), reps=reps, lens=lens)


def main(dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    print(f"dtype={dtype.__name__}")
    for label, b, h, w_dim, cin, cout in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (b, h, w_dim, cin)), dtype=dtype)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), dtype=dtype)
        bias = jnp.asarray(rng.normal(0, 0.1, (cout,)), dtype=jnp.float32)

        f_xla = jax.jit(xla_conv)
        f_pal = jax.jit(lambda x, w, b: conv3x3_fused(x, w, b))

        ref = np.asarray(f_xla(x, w, bias), dtype=np.float32)
        out = np.asarray(f_pal(x, w, bias), dtype=np.float32)
        scale = np.abs(ref).max() + 1e-6
        rel = np.abs(out - ref).max() / scale
        assert rel < 2e-2, f"{label}: pallas diverges rel={rel}"

        t_x = timeit(f_xla, (x, w, bias))
        t_p = timeit(f_pal, (x, w, bias))
        gflop = 2 * 9 * cin * cout * h * w_dim * b / 1e9
        print(f"{label}: xla {t_x*1e3:7.2f} ms ({gflop/t_x/1e3:6.1f} TF) | "
              f"pallas {t_p*1e3:7.2f} ms ({gflop/t_p/1e3:6.1f} TF) | "
              f"ratio {t_x/t_p:.2f}x  (rel err {rel:.1e})")


def main_roll(dtype=None, batch=None):
    """Compare all pallas variants vs XLA."""
    import jax.numpy as jnp

    from yolov3_tpu.ops.pallas_conv import (conv3x3_fused_roll,
                                            conv3x3_fused_roll2)

    dtype = dtype or jnp.bfloat16
    rng = np.random.default_rng(0)
    for label, b, h, w_dim, cin, cout in SHAPES:
        b = batch or b
        x = jnp.asarray(rng.normal(0, 1, (b, h, w_dim, cin)), dtype=dtype)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), dtype=dtype)
        bias = jnp.asarray(rng.normal(0, 0.1, (cout,)), dtype=jnp.float32)
        f_xla = jax.jit(xla_conv)
        f_rol = jax.jit(lambda x, w, b: conv3x3_fused_roll(x, w, b))
        f_r2 = jax.jit(lambda x, w, b: conv3x3_fused_roll2(x, w, b))
        # correctness on a 2-image slice: full buffers at serving batch are
        # hundreds of MB and the relay D2H runs ~150 KB/s (CLAUDE.md)
        x2 = x[:2]
        ref = np.asarray(f_xla(x2, w, bias), dtype=np.float32)
        for name, f in (("roll", f_rol), ("roll2", f_r2)):
            out = np.asarray(f(x2, w, bias), dtype=np.float32)
            rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
            assert rel < 2e-2, f"{label} {name} diverges rel={rel}"
        t_x, t_r, t_2 = (timeit_scanned(f, x, w, bias)
                         for f in (xla_conv,
                                   lambda a, b_, c: conv3x3_fused_roll(a, b_, c),
                                   lambda a, b_, c: conv3x3_fused_roll2(a, b_, c)))
        gflop = 2 * 9 * cin * cout * h * w_dim * b / 1e9
        print(f"b{b} {label}: xla {t_x*1e3:6.2f} ({gflop/t_x/1e3:5.1f} TF) | "
              f"roll {t_r*1e3:6.2f} ({t_x/t_r:.2f}x) | "
              f"roll2 {t_2*1e3:6.2f} ({t_x/t_2:.2f}x)", flush=True)


if __name__ == "__main__":
    batch = None
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    main_roll(batch=batch) if "--roll" in sys.argv else main()
