"""Test configuration: force an 8-virtual-device CPU platform.

Must run before jax is imported anywhere: tests exercise multi-chip
sharding paths on a virtual CPU mesh (SURVEY §4 implication), so we set
the platform/device-count env vars here, at collection time.
"""

import os

# Force-override: the ambient environment pins JAX to the real TPU tunnel
# at interpreter boot via a sitecustomize config.update (env vars are
# clobbered); unit tests must run on a virtual 8-device CPU mesh, so set
# the config programmatically before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeated pytest runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)
