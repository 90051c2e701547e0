"""Test configuration.

Tests run on CPU with 8 virtual devices (for sharding tests) and float64
enabled (the reference's precision contract is float64 —
jax/__init__.py:7-19; correctness tiers compare at 1e-8..1e-12).

Note: this environment pre-imports jax in every process (sitecustomize)
with JAX_PLATFORMS=axon, so env vars are too late — use jax.config.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# The suite is compile-bound (unrolled J-specialized kernels); persist
# compiled executables across runs so only the first run pays.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
