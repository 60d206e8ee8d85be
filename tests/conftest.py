"""Test configuration: force an 8-device virtual CPU mesh so tests run
fast and sharding tests work without multi-chip TPU hardware.

Note: this image's sitecustomize registers the `axon` TPU backend and
pins JAX_PLATFORMS=axon, so the env var alone cannot select CPU — the
jax.config update below must run before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
