"""Isolated cost of the fused residual-block kernel at the real shapes.

Round-4 attribution probe: the fused kernel measured a large e2e NEGATIVE
at int8@608 b128 (973 vs 1337 img/s ⇒ ~+3.6 ms per block) although the
decision input priced its MXU dots at ~1.23 ms/block @152². This times
``residual_block_int8`` ALONE at the exact 608 block shapes via the shared
differential-scan clock, to split kernel-internal cost (VPU epilogues,
mask/roll work, grid pipelining) from integration cost (chain pad/slice
copies, XLA context):

* dependency: the carry perturbs the SMALL w1 operand (int32 add → int8
  cast, ~32 KB — negligible vs the block), so the call can't be hoisted;
* consumption: the whole chain-layout output reduces to one scalar
  (dep_full) — every element carries a non-zero weight;
* the input slab tensor stays constant across scan iterations (only
  weights vary), matching the serving steady state where weights are
  resident and activations stream.

Run on the chip: python tools/bench_block_kernel.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from tools.bench_clock import enable_compile_cache, timeit_scanned


def make_case(b, h, w, c_in, c_mid, emit_q=True):
    from yolov3_tpu.ops.pallas_block import (pad_chain_input, plan_geometry,
                                             prepare_block_params,
                                             residual_block_int8)

    rng = np.random.default_rng(0)
    geom = plan_geometry(h, w, c_in, c_mid, c_in)
    assert geom is not None, (h, w, c_in, c_mid)
    qp1 = {"wq": jnp.asarray(rng.integers(-20, 21, (1, 1, c_in, c_mid)),
                             jnp.int8),
           "sw": jnp.asarray(rng.uniform(1e-3, 1e-2, (c_mid,)), jnp.float32),
           "b": jnp.asarray(rng.normal(0, 0.05, (c_mid,)), jnp.float32)}
    qp2 = {"wq": jnp.asarray(rng.integers(-20, 21, (3, 3, c_mid, c_in)),
                             jnp.int8),
           "sw": jnp.asarray(rng.uniform(1e-3, 1e-2, (c_in,)), jnp.float32),
           "b": jnp.asarray(rng.normal(0, 0.05, (c_in,)), jnp.float32)}
    s = dict(s_in=0.0123, s_mid=0.0145, s_mid2=0.0171, s_out=0.0162)
    w1, w2, d1, v1, d2, v2 = prepare_block_params(qp1, qp2, s["s_in"],
                                                  s["s_mid"], geom.cp)
    xq = jnp.asarray(rng.integers(-127, 128, (b, h, w, c_in)), jnp.int8)
    xp = pad_chain_input(xq, geom, h, w)

    def fn(carry, xp, w1, w2, d1, v1, d2, v2):
        # per-iteration dependency on the small weight operand only
        w1p = (w1.astype(jnp.int32)
               + carry.astype(jnp.int32) % 2).astype(jnp.int8)
        return residual_block_int8(xp, w1p, w2, d1, v1, d2, v2, h=h, w=w,
                                   emit_q=emit_q, **s)

    carry = jnp.zeros((), jnp.float32)
    return fn, (carry, xp, w1, w2, d1, v1, d2, v2), geom


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    # the two fusable 608 stages (b128) + the gate's 320 stages for scale
    for b, h, w, c_in, c_mid in ((128, 152, 152, 128, 64),
                                 (128, 76, 76, 256, 128),
                                 (128, 38, 38, 512, 256)):
        try:
            fn, args, geom = make_case(b, h, w, c_in, c_mid)
        except AssertionError:
            print(f"b{b} {h}x{w} c{c_in}: no geometry", flush=True)
            continue
        per = timeit_scanned(fn, args, lens=(4, 28))
        nh = geom.hp // geom.th
        mxu_ops = (2 * b * (geom.th + 2) * geom.ws * c_in * geom.cp * nh
                   + 2 * b * geom.th * geom.ws * 9 * geom.cp * c_in * nh)
        print(f"b{b} {h}x{w} c{c_in}->{c_mid}: {per * 1e3:7.3f} ms/block "
              f"(th={geom.th} nh={nh} ws={geom.ws} cp={geom.cp}; "
              f"{mxu_ops / per / 1e12:5.1f} TOP/s incl. pad work)",
              flush=True)


if __name__ == "__main__":
    main()
