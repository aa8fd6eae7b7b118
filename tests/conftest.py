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

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
