"""Force tests onto the CPU backend with a virtual 8-device mesh.

This is the standard fake-cluster mechanism for TPU code: sharding tests run
against 8 host devices, so no TPU is needed for CI.

Note: this environment's sitecustomize force-registers the axon TPU backend
and sets jax_platforms="axon,cpu" *after* env vars are read, so plain
JAX_PLATFORMS=cpu is not enough — we must override via jax.config before any
backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# SLIDEO_TEST_PLATFORM=tpu lets the slow production-scale fidelity tests run
# on real hardware; default stays the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", os.environ.get("SLIDEO_TEST_PLATFORM", "cpu"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-scale fidelity tests (minutes; run with "
        "SLIDEO_SLOW_TESTS=1 or -m slow)"
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SLIDEO_SLOW_TESTS") == "1" or "slow" in (
        config.getoption("-m") or ""
    ):
        return
    skip = pytest.mark.skip(reason="slow; set SLIDEO_SLOW_TESTS=1 or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
