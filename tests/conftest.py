"""Test harness: CPU backend with an 8-device virtual mesh.

Multi-chip sharding is validated on a forced-host-platform device mesh, as
real multi-chip TPU hardware is not available in CI (SURVEY.md §4: the
reference has no multi-node tests; we add mesh emulation as the rebuild's
equivalent).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize pins JAX_PLATFORMS in the environment; the config
# update below wins regardless, keeping unit tests on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles ~60 XLA programs; cached
# reruns skip nearly all of that.
_cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1)
