"""The differential-scan device clock shared by every tools/ microbench.

A single synced dispatch through the axon relay costs ~26 ms of round trip
REGARDLESS of device work, so absolute timings are RTT, not kernel time.
This runs the op inside ONE jitted `lax.scan` at two lengths and reports
``(t_long − t_short)/(len_long − len_short)`` — the RTT cancels exactly.

Two hard-won rules (see docs/DESIGN.md "Measurement methodology"):

* the scan must have a REAL data dependency between iterations, or the op
  is hoisted/deduped;
* the dependency must consume EVERY output element with a non-zero
  weight: a ``*0`` term is constant-foldable, and a SLICED consumer lets
  the compiler push the slice through the op and compute a fraction of it
  (a column-sliced top_k simplifies to argmax; XLA slices through convs;
  Mosaic skips untouched dot tiles). Negative or over-peak readings mean
  the dependency failed.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp


def enable_compile_cache():
    """Persistent XLA compile cache for tools (same dir as the CLI's;
    repeat profiling/bench runs skip the 1-10 min TPU compiles). Set via
    jax.config — the env var is latched before main() when a sitecustomize
    imports jax at interpreter start."""
    cache_dir = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "yolov3_tpu", "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError:  # purely an optimization
        pass


def dep_full(carry, out):
    """Default dependency: full-consumption, numerically negligible."""
    acc = jnp.float32(0)
    for o in out:
        acc = acc + jnp.sum(o.astype(jnp.float32))
    return carry + (acc * jnp.float32(1e-24)).astype(carry.dtype)


def timeit_scanned(fn, args, dep=dep_full, reps=3, lens=(8, 40)):
    """Per-op device time. ``fn(carry, *args[1:]) -> tuple/array of outputs``;
    ``dep(carry, outs) -> carry`` threads the dependency (default:
    full-consumption). Returns seconds per op."""
    def many_fn(scan_len):
        @jax.jit
        def many(*args):
            def body(carry, _):
                out = fn(carry, *args[1:])
                if not isinstance(out, (tuple, list)):
                    out = (out,)
                return dep(carry, out), ()
            out, _ = jax.lax.scan(body, args[0], None, length=scan_len)
            return jnp.sum(out.astype(jnp.float32))
        return many

    totals = []
    for scan_len in lens:
        many = many_fn(scan_len)
        float(many(*args))  # compile + warm; scalar fetch = relay-safe sync
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(many(*args))
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    return (totals[1] - totals[0]) / (lens[1] - lens[0])
