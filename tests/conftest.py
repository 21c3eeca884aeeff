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

# Persistent XLA compile cache: the suite's wall-clock is dominated by
# shard_map compiles (test_dist_chol alone ~25 min cold), and the graphs are
# identical across runs, so warm re-runs collapse.  NOTE: must go through
# jax.config.update, not env vars — the sandbox's sitecustomize imports jax
# at interpreter start, so JAX_* env set here is read too late.  The AOT
# loader logs a benign per-load E-line about the XLA-internal
# `prefer-no-scatter/gather` pseudo-features (compile-time tuning flags the
# host-feature probe never reports; the real ISA feature sets match) —
# silence C++ logs unless the caller already chose a level.  Opt out with
# GPR_TPU_TEST_CACHE=0.
_use_cache = os.environ.get("GPR_TPU_TEST_CACHE", "1") != "0"
if _use_cache:
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# The sandbox's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel); the
# config update below overrides it reliably.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
if _use_cache:
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/gpr_tpu_test_jaxcache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
