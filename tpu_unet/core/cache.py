"""Persistent XLA compilation cache.

The flagship train/serve graphs take minutes to compile (the fused
kernel set is large, and on tunneled harnesses compile RPCs are slow);
a persistent on-disk cache makes every process after the first start in
seconds.  The reference stack gets this for free from cuDNN's in-driver
autotune cache — here it is an explicit opt-in because JAX ships with
the cache disabled.

Call :func:`enable_compilation_cache` once per process before the first
``jit`` trace (bench.py, tools/train_bench.py and the CLI do).  Safe to
call multiple times; honours an existing ``JAX_COMPILATION_CACHE_DIR``.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".xla_cache")
_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable the persistent compile cache; returns the cache dir.

    No-op (returns None) on the CPU backend — interpret-mode tests churn
    thousands of tiny graphs and the disk cache only adds overhead.
    """
    global _enabled
    import jax

    if jax.default_backend() == "cpu":
        return None
    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every compile: even sub-second ones pay tunnel RPCs here
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return cache_dir
