"""Test configuration.

Tests run on CPU with 8 virtual devices (for sharding tests) and float64
enabled (the reference's precision contract is float64 —
jax/__init__.py:7-19; correctness tiers compare at 1e-8..1e-12).

Note: this environment pre-imports jax in every process (sitecustomize)
with JAX_PLATFORMS=axon, so env vars are too late — use jax.config.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
