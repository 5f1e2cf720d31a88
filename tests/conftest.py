"""Test harness: force an 8-virtual-device CPU platform so mesh/sharding
tests run without TPU hardware (SURVEY.md §7 / driver contract)."""

import os

# Force CPU even if the environment pins a TPU platform (e.g. axon): unit
# tests must be hermetic and fast; the benchmark path uses the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var — only the config
# API actually forces CPU here.  Unit tests must be hermetic and fast.
jax.config.update("jax_platforms", "cpu")

# Persist compiles so repeat test runs hit the on-disk cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
