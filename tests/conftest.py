"""Test harness configuration (SURVEY.md §4).

Tests run on the CPU backend with x64 enabled and 8 virtual devices, so that:
  * Jacobian checks against jax.jacfwd/jacrev are tight (f64),
  * multi-chip sharding (shard_map collectives, partitioner, Schur reduction)
    is exercised on an 8-device mesh without TPU pod hardware.

This must run before jax initializes, hence the env vars at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
