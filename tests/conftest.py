"""Test configuration: force an 8-device virtual CPU platform.

The container's sitecustomize (PYTHONPATH=/root/.axon_site) registers the
axon TPU PJRT plugin at interpreter startup — BEFORE any conftest runs — so
plain env vars are too late. `jax.config.update('jax_platforms', 'cpu')`
still wins because platform RESOLUTION is lazy; XLA_FLAGS must be in the
environment before the CPU client is first created, which also happens
lazily at the first jax.devices() call below. Result: every sharding/pjit
test runs against a `jax.sharding.Mesh` of 8 host-CPU devices (the TPU
analog of a fake distributed backend, SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by jit
# compiles of near-identical graphs; warm re-runs (CI retries, the driver
# gate, local iteration) skip them entirely. Keyed by HLO, so code changes
# invalidate exactly the affected entries. Routed through the shared helper,
# which scopes the directory per platform + host-CPU-feature fingerprint
# (XLA:CPU AOT entries are not portable across machine types).
try:
    from ccdm_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache(os.environ.get("CCDM_TPU_TEST_CACHE", "/tmp/ccdm_test_jax_cache"),
                  min_compile_secs=2.0)
except Exception:
    pass  # older jax: run uncached

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
