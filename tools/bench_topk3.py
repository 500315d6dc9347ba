"""Round 3: cost of the building blocks for a compaction-based selection.

Fast-path candidate (common serving case: <= K candidates pass the
threshold): positions = cumsum(mask); scatter-drop payload into (B, K);
sort the K slots by score. Falls back to lax.top_k under lax.cond when any
image exceeds K. This measures each block.

Run: python tools/bench_topk3.py
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
    raw = rng.uniform(0, 1, (b, n)).astype(np.float32)
    mask_np = rng.uniform(0, 1, (b, n)) < 0.015  # ~340 nonzero per image
    scores = jnp.asarray(np.where(mask_np, raw, 0.0).astype(np.float32))

    def positions(s):
        m = s > 0.0
        return jnp.cumsum(m, axis=1, dtype=jnp.int32), m

    def scatter1(s):
        """One-plane compaction: scatter-drop scores into (B, K)."""
        pos, m = positions(s)
        idx = jnp.where(m, pos - 1, k)  # k = out of bounds -> dropped
        out = jnp.zeros((b, k), jnp.float32)
        return (out.at[jnp.arange(b)[:, None], idx].set(
            s, mode="drop", unique_indices=True),)

    def scatter6(s):
        pos, m = positions(s)
        idx = jnp.where(m, pos - 1, k)
        outs = []
        for i in range(6):
            out = jnp.zeros((b, k), jnp.float32)
            outs.append(out.at[jnp.arange(b)[:, None], idx].set(
                s * jnp.float32(i + 1), mode="drop", unique_indices=True))
        return tuple(outs)

    def scatter_payload(s):
        """Single scatter of a stacked (B, N, 8) payload into (B, K, 8)."""
        pos, m = positions(s)
        idx = jnp.where(m, pos - 1, k)
        payload = jnp.stack([s * jnp.float32(i + 1) for i in range(8)], -1)
        out = jnp.zeros((b, k, 8), jnp.float32)
        return (out.at[jnp.arange(b)[:, None], idx].set(
            payload, mode="drop", unique_indices=True),)

    def full_fast_path(s):
        """cumsum + 6-plane scatter + (B,K) 2-operand sort by score desc."""
        pos, m = positions(s)
        idx = jnp.where(m, pos - 1, k)
        planes = [s * jnp.float32(i + 1) for i in range(6)]
        compact = []
        for p in planes:
            out = jnp.zeros((b, k), jnp.float32)
            compact.append(out.at[jnp.arange(b)[:, None], idx].set(
                p, mode="drop", unique_indices=True))
        key = -lax.bitcast_convert_type(compact[0], jnp.int32)
        srt = lax.sort((key, *compact[1:]), dimension=1, is_stable=True,
                       num_keys=1)
        return tuple(srt)

    variants = {
        "cumsum (B,N) i32": lambda s: (positions(s)[0],),
        "scatter 1 plane": scatter1,
        "scatter 6 planes": scatter6,
        "scatter (B,N,8) packed": scatter_payload,
        "fast path e2e": full_fast_path,
        "sort (B,K) x6 payload": lambda s: tuple(lax.sort(
            (-lax.bitcast_convert_type(s[:, :k], jnp.int32),
             *(s[:, :k] * jnp.float32(i) for i in range(1, 6))),
            dimension=1, is_stable=True, num_keys=1)),
    }

    for name, fn in variants.items():
        try:
            t = timeit_scanned(fn, (scores,), dep_full)
            print(f"{name:24s}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
