"""Persistent XLA compilation cache setup.

First compile of the 250-step sampler takes minutes through the remote-TPU
tunnel; the persistent cache makes repeat runs (bench re-runs, resumed
training) start in seconds. Call once at process start; safe no-op if the
backend doesn't support caching.

The cache directory is scoped per platform AND per host CPU feature set:
XLA:CPU persists AOT-compiled machine code whose cache key does NOT include
the CPU feature set, so a directory shared across machines turns the cache
into a hazard — entries compiled on an AVX-512/AMX box fail to load (or
worse, SIGILL) on a host without those features (observed as
``cpu_aot_loader.cc`` "machine type ... doesn't match" errors when
/tmp/ccdm_jax_cache was reused across machines).
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Short stable fingerprint of the host CPU feature set (ISA flags only,
    not frequency/core counts, so identical machine types share a cache)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable(cache_dir: str | None = None, min_compile_secs: float = 5.0) -> None:
    import jax

    base = cache_dir or os.environ.get("CCDM_TPU_JAX_CACHE", "/tmp/ccdm_jax_cache")
    try:
        platform_name = jax.default_backend()
    except Exception:
        platform_name = "unknown"
    scoped = os.path.join(base, f"{platform_name}-{_host_fingerprint()}")
    try:
        os.makedirs(scoped, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", scoped)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        pass  # older jax or unsupported backend: run uncached
