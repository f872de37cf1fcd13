"""Test config: force CPU (8 virtual devices for mesh tests) and float64.

NOTE: on this image the axon TPU plugin ignores the JAX_PLATFORMS env var, so
the platform must be forced via jax.config *after* import (before first use).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)

# persistent compilation cache: panda-class models produce large XLA graphs;
# cache compiles across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
