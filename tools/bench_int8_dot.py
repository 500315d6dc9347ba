"""Microbenchmark: Mosaic int8 dot throughput at residual-block shapes.

Decision input for the fused residual-block kernel (round 3, DESIGN.md
"what remains" table): the early int8-carrier stages [2:13) are
bandwidth-bound ~5-7 ms above their serialized traffic floor, and a
VMEM-resident fused block (1x1 -> 3x3 -> shortcut in one pass) cuts their
HBM traffic ~3x -- but only pays off if the in-kernel dots run near the
int8 MXU rate rather than the bf16 one. This measures exactly that:
int8 x int8 -> int32 jnp.dot inside a Pallas kernel vs the same-shape bf16
dot.

Clock: the shared differential-scan clock (tools/bench_clock.py) with the
dependency threaded INTO the kernel (the carry perturbs the lhs before the
dot, so no two scan iterations compute the same dot and nothing hoists).
A first attempt used a grid-differential harness with loop-invariant
operands; it read 587 TOP/s (over int8 peak, ~394) at one shape and a 6.5x
K=768-vs-K=576 cliff at another -- artifacts, not physics. Trust this one.

Run: python tools/bench_int8_dot.py   (on the real chip)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.bench_clock import enable_compile_cache, timeit_scanned


def make_dot(m, k, n, dtype):
    """fn(carry, lhs, rhs, p1, p2) -> (8, 128) f32; carry perturbs lhs."""
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kernel(c_ref, lhs_ref, rhs_ref, p1_ref, p2_ref, o_ref):
        # real per-iteration dependency: the carry (runtime ~0) shifts the
        # SMALL rhs (K*N elements), not the big lhs -- the perturbation pass
        # must stay negligible vs the dot. int8 path goes via int32 (Mosaic
        # rejects the direct f32-scalar -> int8 broadcast add).
        if dtype == jnp.int8:
            c = c_ref[0, 0].astype(jnp.int32)
            rhs = (rhs_ref[:].astype(jnp.int32) + c).astype(jnp.int8)
        else:
            rhs = rhs_ref[:] + c_ref[0, 0].astype(rhs_ref.dtype)
        acc = jnp.dot(lhs_ref[:], rhs, preferred_element_type=acc_t)
        # consume EVERY element via two tiny projection dots
        proj = jnp.dot(p1_ref[:], acc.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        o_ref[:] = jnp.dot(proj.astype(jnp.bfloat16), p2_ref[:],
                           preferred_element_type=jnp.float32)

    def fn(carry, lhs, rhs, p1, p2):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(carry, lhs, rhs, p1, p2)

    return fn


def operands(m, k, n, dtype, rng):
    if dtype == jnp.int8:
        lhs = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.int8)
        rhs = jnp.asarray(rng.integers(-4, 5, (k, n)), jnp.int8)
    else:
        lhs = jnp.asarray(rng.normal(0, 1, (m, k)), dtype)
        rhs = jnp.asarray(rng.normal(0, 1, (k, n)), dtype)
    p1 = jnp.asarray(rng.normal(0, 1e-3, (8, m)), jnp.bfloat16)
    p2 = jnp.asarray(rng.normal(0, 1e-3, (n, 128)), jnp.bfloat16)
    carry = jnp.zeros((8, 128), jnp.float32)
    return carry, lhs, rhs, p1, p2


def main():
    enable_compile_cache()
    rng = np.random.default_rng(0)
    # (M, K, N) candidate dot formulations for the fused residual block
    # (152-grid: C=128, Cmid=64; 304-grid pixel-pair-packed: C=128 lanes).
    shapes = [
        (2432, 192, 128),   # 152^2 3x3 per-ky: (16*152, 3*64) @ (192, 128)
        (2432, 576, 128),   # 152^2 3x3, dense 9-tap lane concat (9*64)
        (2736, 128, 64),    # 152^2 1x1 direct
        (2736, 128, 128),   # 152^2 1x1, N padded to a full lane tile
        (1368, 256, 128),   # 152^2 1x1, pixel-pair packed (block-diag)
        (1216, 384, 256),   # 152^2 3x3, pixel-pair packed per-kyp
        (1280, 384, 128),   # 304^2 3x3 pixel-pair, N=2*64
        (1280, 768, 128),   # 304^2 3x3 pixel-pair, dense (6 packed taps)
        (2432, 128, 128),   # stem block-diag 4-pixel dot shape
        (2048, 512, 512),   # square control (grid harness said ~320)
    ]
    for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        for m, k, n in shapes:
            fn = make_dot(m, k, n, dtype)
            args = operands(m, k, n, dtype, rng)
            try:
                per = timeit_scanned(fn, args, lens=(512, 16384))
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"{name} M={m} K={k} N={n}: FAILED "
                      f"{type(e).__name__}: {str(e).splitlines()[0][:120]}",
                      flush=True)
                continue
            useful = 2 * m * k * n
            print(f"{name} M={m:4d} K={k:4d} N={n:3d}: {per*1e6:7.2f} us/step"
                  f" ({useful/per/1e12:6.1f} TOP/s useful)", flush=True)


if __name__ == "__main__":
    main()
