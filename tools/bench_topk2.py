"""Round 2 of the selection-stage isolation (see bench_topk/bench_gather).

Findings so far: lax.top_k fully consumed is ~2.7 ms at (128, 22743) K=512;
a column-sliced consumer lets XLA simplify it away (the 0.016 ms reading).
Single-key full-N sort is 1.6 ms; 6-payload sort 5.7 ms. This round isolates
the raw gather (indices static, source carried) and measures top_k scaling.

Run: python tools/bench_topk2.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from tools.bench_topk import N_608, dep_full, timeit_scanned


def main():
    b, n, k = 128, N_608, 512
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
    idx = jnp.asarray(
        np.argsort(rng.uniform(size=(b, n)), axis=1)[:, :k].astype(np.int32))
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))

    variants = {
        # control: top_k with everything consumed (expect ~2.7 ms)
        "topk512 all-consumed": lambda s: lax.top_k(s, k),
        # raw gathers: static indices, carried source (nothing to simplify)
        "gather (B,N)f32 raw": lambda s: (
            jnp.take_along_axis(s, idx, axis=1),),
        "gather x6 planes raw": lambda s: tuple(
            jnp.take_along_axis(s * jnp.float32(1 + i), idx, axis=1)
            for i in range(6)),
        # top_k cost scaling in k
        "topk64": lambda s: lax.top_k(s, 64),
        "topk1024": lambda s: lax.top_k(s, 1024),
        # top_k cost scaling in n (halved, same k)
        "topk512 half-N": lambda s: lax.top_k(s[:, :n // 2], k),
        # int32-key top_k (bitcast is monotone for non-negative floats)
        "topk512 i32 keys": lambda s: lax.top_k(
            lax.bitcast_convert_type(s, jnp.int32), k),
        # 2-operand stable sort: values + iota payload (exact top_k replacement:
        # sort by negated bitcast key ascending = score desc, ties by index)
        "sort2 stable (key,iota)": lambda s: tuple(
            o[:, :k] for o in lax.sort(
                (-lax.bitcast_convert_type(s, jnp.int32), iota),
                dimension=1, is_stable=True, num_keys=1)),
        # 2-operand unstable
        "sort2 unstable": lambda s: tuple(
            o[:, :k] for o in lax.sort(
                (-lax.bitcast_convert_type(s, jnp.int32), iota),
                dimension=1, is_stable=False, num_keys=1)),
        # variable-k sort slice: does XLA exploit the sliced consumer?
        "sort1 sliced K": lambda s: (lax.sort(s, dimension=1)[:, -k:],),
    }

    for name, fn in variants.items():
        try:
            t = timeit_scanned(fn, (scores,), dep_full)
            print(f"{name:24s}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
