"""Profiling hooks: jax.profiler traces + simple throughput probes.

The reference has no tracing at all (SURVEY.md §5.1 — wall-clock timers
only); here every trainer/sampler can be wrapped in a trace capture whose
artifacts load in TensorBoard/XProf, and `throughput_probe` gives quick
device-time numbers without a UI.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ccdm_tpu_trace"):
    """Capture a jax.profiler trace around a block."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def throughput_probe(fn: Callable, args: tuple, n_warmup: int = 2, n_iter: int = 5):
    """(mean_seconds, per-call seconds list) for a jitted fn, post-warmup."""
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return sum(times) / len(times), times
