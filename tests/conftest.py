"""Test configuration: force an 8-device virtual CPU platform BEFORE jax init.

This is the TPU analog of a fake distributed backend (SURVEY.md §4): every
sharding/pjit test runs against a `jax.sharding.Mesh` of 8 host-CPU devices.
"""

import os

# NOTE: JAX_PLATFORMS is ignored in this environment (the axon TPU plugin
# wins); JAX_PLATFORM_NAME reliably forces the host CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
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
