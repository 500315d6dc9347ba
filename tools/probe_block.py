"""On-chip bisection probe for the fused residual-block kernel.

The first tpu_check gate found the full kernel "diverging" on chip (53% of
outputs off by a few quant steps, deterministic) while CPU interpret matched
the unfused walk. This probe isolates each in-kernel ingredient ON THE CHIP
against an exact host reference:

  1. int8 x int8 -> int32 jnp.dot (the 1x1 and 3x3 dots) — integer-exact?
  2. jnp.round / clip / int8 cast (the requantizers) — which rounding?
  3. pltpu.roll of f32-cast int8 (the kx taps) — value-exact?
  4. the iota //, % mask arithmetic — correct row/col indices?
  5. full blocks (single-tile through multi-batch pipelined) vs interpret.
  6. fused-vs-unfused CHAIN prefixes (k = 1..10 blocks) through the real
     int8-carrier walk, co-compiled in one jit program.

**Verdict (2026-08-19, all probes on the real chip):** every ingredient and
every chain prefix is EXACT (ndiff 0) when the fused and unfused walks are
co-compiled in one program. The gate's 53% came from comparing SEPARATELY
compiled programs: xla-vs-xla recompiled is exact, but an xla-only program
vs a pallas-containing program reads frac 0.53117 / max ~6 quant steps —
the kernel's presence changes how XLA contracts the SURROUNDING ops
(shared prefix + epilogues), flipping requant ties that the 10-block 3x3
chain then diffuses (CPU twin of the amplification: interpret kernel vs
unfused walk grows 0 -> 0.012% -> 13.4% over k=1..10).
tools/tpu_check.py::check_fused_block now co-compiles the comparison and
bounds the cross-program tie noise with its candidate-level e2e bars.

Run: python tools/probe_block.py   (on the real chip)
"""
import sys
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_int8_dot():
    rng = np.random.default_rng(0)
    for m, k, n in ((256, 128, 128), (2432, 576, 128), (880, 256, 128),
                    (480, 1152, 128)):
        lhs = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        rhs = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

        def kernel(l_ref, r_ref, o_ref):
            o_ref[:] = jnp.dot(l_ref[:], r_ref[:],
                               preferred_element_type=jnp.int32)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lhs, rhs)
        ref = np.asarray(lhs, np.int64) @ np.asarray(rhs, np.int64)
        d = np.abs(np.asarray(out, np.int64) - ref)
        print(f"int8 dot M={m} K={k} N={n}: maxdiff {d.max()} "
              f"ndiff {(d > 0).sum()}/{d.size}", flush=True)


def probe_round():
    # values straddling halves, negatives, large magnitudes
    vals = np.concatenate([
        np.arange(-8, 8) + 0.5, np.arange(-8, 8) + 0.49999997,
        np.arange(-8, 8) + 0.50000003,
        np.linspace(-200, 200, 96).astype(np.float32)]).astype(np.float32)
    x = jnp.asarray(np.tile(vals, (8, 1)))  # (8, 144)

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.clip(jnp.round(x_ref[:]), -127, 127)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = np.clip(np.round(np.asarray(x)), -127, 127)  # numpy: half-to-even
    d = np.abs(np.asarray(out) - ref)
    bad = np.argwhere(d[0] > 0).ravel()
    print(f"round/clip: ndiff {(d > 0).sum()}/{d.size}; first bad inputs "
          f"{[float(vals[i]) for i in bad[:6]]}", flush=True)


def probe_roll():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-127, 128, (10, 48, 128)), jnp.int8)
    ws = 48

    def kernel(x_ref, o_ref):
        x32 = x_ref[:].astype(jnp.float32)
        o_ref[0] = pltpu.roll(x32, 1, 1).astype(jnp.int8)
        o_ref[1] = pltpu.roll(x32, ws - 1, 1).astype(jnp.int8)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, 10, 48, 128), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    xn = np.asarray(x)
    r0 = np.roll(xn, 1, axis=1)
    r1 = np.roll(xn, -1, axis=1)
    print(f"roll +1: ndiff {(np.asarray(out[0]) != r0).sum()}, "
          f"roll -1: ndiff {(np.asarray(out[1]) != r1).sum()}", flush=True)


def probe_mask():
    th, ws, cp, h, w = 6, 48, 128, 40, 40
    rows1 = (th + 2) * ws
    for hi in (0, 3, 6):
        def kernel(o_ref, *, hi):
            flat = jax.lax.broadcasted_iota(jnp.int32, (rows1, cp), 0)
            gr = flat // ws + (hi * th - 1)
            gc = flat % ws
            valid = (gr >= 0) & (gr < h) & (gc < w)
            o_ref[:] = valid.astype(jnp.int32)

        out = pl.pallas_call(
            partial(kernel, hi=hi),
            out_shape=jax.ShapeDtypeStruct((rows1, cp), jnp.int32),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )()
        flat = np.arange(rows1)[:, None]
        gr = flat // ws + (hi * th - 1)
        gc = flat % ws
        ref = ((gr >= 0) & (gr < h) & (gc < w)).astype(np.int32)
        ref = np.broadcast_to(ref, (rows1, cp))
        nd = (np.asarray(out) != ref).sum()
        print(f"mask hi={hi}: ndiff {nd}/{ref.size}", flush=True)


def probe_epilogue():
    """f32 mul-add-leaky-quantize chain: kernel vs numpy float32."""
    rng = np.random.default_rng(2)
    acc = jnp.asarray(rng.integers(-2_000_000, 2_000_000, (256, 128)),
                      jnp.int32)
    deq = jnp.asarray(np.tile(rng.uniform(1e-6, 1e-4, (1, 128))
                              .astype(np.float32), (8, 1)))
    b = jnp.asarray(np.tile(rng.normal(0, 0.05, (1, 128))
                            .astype(np.float32), (8, 1)))
    inv = 1.0 / 0.017

    def kernel(a_ref, d_ref, b_ref, o_ref):
        y = a_ref[:].astype(jnp.float32) * d_ref[0:1, :] + b_ref[0:1, :]
        y = jnp.where(y > 0, y, 0.1 * y)
        o_ref[:] = jnp.clip(jnp.round(y * inv), -127, 127)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(acc, deq, b)
    an = np.asarray(acc).astype(np.float32)
    y = an * np.asarray(deq)[0:1] + np.asarray(b)[0:1]
    y = np.where(y > 0, y, np.float32(0.1) * y)
    ref = np.clip(np.round(y * np.float32(inv)), -127, 127)
    d = np.abs(np.asarray(out) - ref)
    print(f"epilogue chain: ndiff {(d > 0).sum()}/{d.size} max {d.max()}",
          flush=True)


def probe_full_tiny(B=1, H=8, W=8):
    """Full kernel vs the interpret-mode run (which the CPU tests prove
    equals the unfused walk). Default = single tile (nt=1, no pipelining);
    larger B/H exercise the double-buffered slab/stage DMA machinery."""
    from yolov3_tpu.ops.pallas_block import (pad_chain_input,
                                             plan_geometry,
                                             prepare_block_params,
                                             residual_block_int8)

    rng = np.random.default_rng(3)
    Cin, Cmid = 128, 64
    xq = jnp.asarray(rng.integers(-127, 128, (B, H, W, Cin)), jnp.int8)
    qp1 = {"wq": jnp.asarray(rng.integers(-20, 21, (1, 1, Cin, Cmid)),
                             jnp.int8),
           "sw": jnp.asarray(rng.uniform(1e-3, 1e-2, (Cmid,)), jnp.float32),
           "b": jnp.asarray(rng.normal(0, 0.05, (Cmid,)), jnp.float32)}
    qp2 = {"wq": jnp.asarray(rng.integers(-20, 21, (3, 3, Cmid, Cin)),
                             jnp.int8),
           "sw": jnp.asarray(rng.uniform(1e-3, 1e-2, (Cin,)), jnp.float32),
           "b": jnp.asarray(rng.normal(0, 0.05, (Cin,)), jnp.float32)}
    s = dict(s_in=0.0123, s_mid=0.0145, s_mid2=0.0171, s_out=0.0162)
    geom = plan_geometry(H, W, Cin, Cmid, Cin)
    w1, w2, d1, v1, d2, v2 = prepare_block_params(qp1, qp2, s["s_in"],
                                                  s["s_mid"], geom.cp)
    xp = pad_chain_input(xq, geom, H, W)
    args = (xp, w1, w2, d1, v1, d2, v2)
    kw = dict(h=H, w=W, emit_q=True, **s)
    chip = residual_block_int8(*args, **kw)
    host = residual_block_int8(*args, interpret=True, **kw)
    c = np.asarray(chip, np.int32)[:, 1:H + 1, :W, :]
    r = np.asarray(host, np.int32)[:, 1:H + 1, :W, :]
    d = np.abs(c - r)
    print(f"full block B={B} H={H} W={W}: ndiff {(d > 0).sum()}/{d.size} "
          f"max {d.max()}", flush=True)
    if (d > 0).sum():
        idx = np.argwhere(d > 0)
        print("  sample diffs (b,h,w,c chip ref):", flush=True)
        for i in idx[:8]:
            print("   ", i, c[tuple(i)], r[tuple(i)], flush=True)


def probe_chain():
    """Fused vs unfused chain prefixes through the real carrier walk at
    yolov3@320 (the gate's exact setup), co-compiled in one program, plus
    the separate-jit control that exposed the gate's methodology bug."""
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.ops.pallas_block import fused_block_plan
    from yolov3_tpu.quant import (calibrate_tensors,
                                  forward_features_int8_carrier,
                                  quantize_weights)
    from yolov3_tpu.weights import fold_raw, random_raw

    repo = Path(__file__).parent.parent
    g = load_graph(repo / "models" / "yolov3.cfg")
    params = {k: {n: jnp.asarray(v) for n, v in p.items()}
              for k, p in fold_raw(random_raw(g, seed=5)).items()}
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (2, 320, 320, 3)).astype(np.float32))
    scales = calibrate_tensors(g, params, [x], precision="bf16")
    qparams = quantize_weights(g, params)
    ends = sorted(fused_block_plan(g, qparams, scales))
    for k in (1, 3, 10):
        last = ends[k - 1] + 3

        @jax.jit
        def stats(q, xx, last=last):
            a = forward_features_int8_carrier(
                g, q, scales, xx, "bf16", upto=last, block_impl="xla")[-1]
            b = forward_features_int8_carrier(
                g, q, scales, xx, "bf16", upto=last, block_impl="pallas")[-1]
            d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
            return jnp.mean((d > 0).astype(jnp.float32)), jnp.max(d)

        f, m = (float(v) for v in stats(qparams, x))
        print(f"chain k={k} (co-compiled): frac {f:.5f} max {m:.4g} "
              f"steps {m / scales[last - 1]:.1f}", flush=True)
    # separate-jit control: the unfused walk compiled twice, no Pallas —
    # nonzero frac here is pure XLA contraction variance between programs
    last = ends[-1] + 3
    a = jax.jit(lambda q, xx: forward_features_int8_carrier(
        g, q, scales, xx, "bf16", upto=last, block_impl="xla")[-1]
        )(qparams, x)
    a2 = jax.jit(lambda q, xx: (forward_features_int8_carrier(
        g, q, scales, xx, "bf16", upto=last, block_impl="xla")[-1], 0)
        )(qparams, x)[0]
    d = np.abs(np.asarray(a, np.float32) - np.asarray(a2, np.float32))
    print(f"xla vs xla (separate jits): frac {(d > 0).mean():.5f} "
          f"max {d.max():.4g} steps {d.max() / scales[last - 1]:.1f}",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    probe_int8_dot()
    probe_round()
    probe_roll()
    probe_mask()
    probe_epilogue()
    probe_full_tiny()                  # nt=1: no pipelining
    probe_full_tiny(B=1, H=40, W=40)   # nh=2: slab/stage double-buffering
    probe_full_tiny(B=3, H=40, W=40)   # nt=6: full pipeline + drain
    probe_full_tiny(B=2, H=19, W=19)   # odd width, single tile per image
    probe_chain()                      # the gate's setup, both methodologies


if __name__ == "__main__":
    main()
