"""Test environment: CPU backend with 8 virtual devices, float64 enabled.

Mirrors SURVEY.md section 4's port strategy: parity math runs in f64 on CPU
(the 1e-6 bar realistically needs f64); multi-chip sharding tests run on the
virtual CPU mesh so no real TPU is needed in CI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel); the
# config update below overrides it reliably.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
