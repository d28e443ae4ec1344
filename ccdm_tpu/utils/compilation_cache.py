"""Persistent XLA compilation cache setup.

First compile of the 250-step sampler takes minutes through the remote-TPU
tunnel; the persistent cache makes repeat runs (bench re-runs, resumed
training) start in seconds. Call once at process start; safe no-op if the
backend doesn't support caching.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("CCDM_TPU_JAX_CACHE", "/tmp/ccdm_jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or unsupported backend: run uncached
