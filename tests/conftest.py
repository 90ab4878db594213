"""Test harness configuration (SURVEY.md §4).

Tests run on the CPU backend with x64 enabled and 8 virtual devices, so that:
  * Jacobian checks against jax.jacfwd/jacrev are tight (f64),
  * multi-chip sharding (shard_map collectives, partitioner, Schur reduction)
    is exercised on an 8-device mesh without TPU pod hardware.

NOTE: in this environment the axon TPU plugin swallows the JAX_PLATFORMS /
XLA_FLAGS env vars, so the CPU backend must be selected via in-process config
updates (before any backend use).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
