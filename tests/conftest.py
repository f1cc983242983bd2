"""Test env: force the CPU backend with 8 virtual devices (SURVEY.md §4.3
"Distributed without a cluster") so sharding tests exercise the same pjit
code path as a real multi-chip mesh.

Note: this container's ``sitecustomize`` imports jax and registers the axon
TPU tunnel in every Python process, so env-var overrides are too late by the
time conftest runs. Backends initialize lazily, however, so
``jax.config.update`` + an XLA_FLAGS append here still routes everything to
CPU — and keeps the (slow, remote-compile) TPU tunnel out of unit tests.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent XLA compile cache — conv3d graph compiles on this 1-core host
# are seconds-to-minutes; the cache makes re-runs near-instant.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
