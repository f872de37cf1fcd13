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

# NO persistent compilation cache for the CPU test tier: on hosts where
# XLA:CPU compiles run on a remote helper with different CPU features, the
# cached AOT executables SEGFAULT on deserialisation (round-5 finding; the
# loader warns "+prefer-no-scatter ... could lead to execution errors" and
# then crashes in compilation_cache.get_executable_and_time).  Set
# TRAJOPTKP_TEST_CACHE_DIR explicitly to opt back in on a homogeneous
# machine.
if os.environ.get("TRAJOPTKP_TEST_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["TRAJOPTKP_TEST_CACHE_DIR"]
    )
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
