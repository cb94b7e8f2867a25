"""Test harness: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are exercised on virtual CPU devices (the
driver's dryrun does the same); the real TPU is only used by bench.py.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; the config
# knob is the only reliable way to pin tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
