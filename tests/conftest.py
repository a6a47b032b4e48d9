"""Test harness: force JAX onto a virtual 8-device CPU mesh.

The TPU-native analogue of a fake backend (SURVEY.md §4): multi-device
sharding tests run on `--xla_force_host_platform_device_count=8` CPU devices,
which exercises the same SPMD partitioner/collective paths XLA uses on a real
TPU slice.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The container's sitecustomize force-registers the 'axon' TPU platform
# (JAX_PLATFORMS=axon in env); flip to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)

# Persistent compilation cache: identical HLO (tiny configs recompiled by
# fresh Trainer instances, and across pytest runs) hits the disk cache
# instead of recompiling for minutes on CPU.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
