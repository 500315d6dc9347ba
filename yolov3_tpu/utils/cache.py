"""Persistent XLA compilation cache — the ONE enabling point for every
long-lived or repeatedly-launched process (CLI, HTTP server).

Production motivation: a serving restart otherwise pays the full TPU
compile before the first request (measured 59 s → 7 s on tiny@416 for a
repeat CLI run; full yolov3@608 compiles run minutes through this
environment's relay). The cache is keyed by XLA on the computation +
compiler version, so a stale entry can never produce a wrong executable —
enabling it is purely an optimization, which is why every failure path
here degrades to "no cache" instead of killing the process.

Set via ``jax.config`` rather than environment variables: the axon
sitecustomize imports jax at interpreter start, which latches env-var
defaults before any ``main()`` runs (same latch documented in CLAUDE.md
for ``JAX_PLATFORMS``).
"""
import os


def enable_compile_cache(cache_dir: str = None) -> str:
    """Enable the persistent compile cache; returns the directory used, or
    ``None`` when the filesystem refuses (unwritable HOME must not kill a
    CLI or a serving restart — the cache is an optimization, not a
    dependency). Precedence: explicit arg > ``JAX_COMPILATION_CACHE_DIR``
    env > ``~/.cache/yolov3_tpu/xla``."""
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "yolov3_tpu", "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took a real compile (default 60s would
        # skip every sub-minute model variant, which is most of them)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError:
        return None
    return cache_dir
