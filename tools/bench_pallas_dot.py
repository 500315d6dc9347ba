"""Microbenchmark: raw Pallas jnp.dot cost vs (M, K, N) shape on the chip.

Motivated by the fused-stem design question (BASELINE.md round-2 notes):
how much does the MXU waste when M (lhs sublanes) or K (contraction) are
below/off 128? Uses a grid-differential clock (two grid sizes; the ~26 ms
relay round trip cancels) and consumes every output element via two tiny
projection dots — slicing or partially reducing the result lets Mosaic
skip part of the main dot (observed: a [:8,:128] slice made a 2944-lane
dot read as 44,000 TF/s).

Run: python tools/bench_pallas_dot.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_grid(m, k, n, grid, dtype=jnp.bfloat16):
    """One pallas call with `grid` steps, each doing dot + out write."""
    def kernel(lhs_ref, rhs_ref, p1_ref, p2_ref, o_ref):
        acc = jnp.dot(lhs_ref[:], rhs_ref[:],
                      preferred_element_type=jnp.float32)
        # consume EVERY element via two tiny projection dots (MXU, ~5% of
        # the main dot) — slicing or partial reduction lets Mosaic skip
        # part of the main dot
        proj = jnp.dot(p1_ref[:], acc.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        o_ref[:] = jnp.dot(proj.astype(jnp.bfloat16), p2_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)[None]

    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.normal(0, 1, (m, k)), dtype)
    rhs = jnp.asarray(rng.normal(0, 1, (k, n)), dtype)
    p1 = jnp.asarray(rng.normal(0, 1, (8, m)), dtype)
    p2 = jnp.asarray(rng.normal(0, 1, (n, 128)), dtype)

    @jax.jit
    def run(lhs, rhs):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((grid, 8, 128), dtype),
            grid=(grid,),
            in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, m), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((n, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(lhs, rhs, p1, p2)
        return jnp.sum(out.astype(jnp.float32))

    float(run(lhs, rhs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(lhs, rhs))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    shapes = [
        (128, 128, 2944),
        (32, 128, 2944),
        (32, 72, 2944),
        (64, 384, 2560),
        (128, 384, 2560),
        (64, 288, 2560),
        (256, 384, 2560),
        (128, 768, 1280),   # roll2-kernel-like shape for calibration
    ]
    for m, k, n in shapes:
        g1, g2 = 4096, 16384
        t1 = timed_grid(m, k, n, g1)
        t2 = timed_grid(m, k, n, g2)
        per = (t2 - t1) / (g2 - g1)
        useful = 2 * m * k * n
        print(f"M={m:4d} K={k:3d} N={n}: {per*1e6:7.2f} us/step "
              f"({useful/per/1e12:6.1f} TF/s useful)", flush=True)


if __name__ == "__main__":
    main()
