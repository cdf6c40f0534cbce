"""Test configuration.

Force the CPU backend with 8 virtual devices BEFORE jax initializes, so the
whole suite (including multi-chip sharding tests) runs without TPU hardware —
the standard JAX trick for testing distributed code (SURVEY §4).
"""

import os

# Force-override: the image's sitecustomize registers the axon TPU backend
# whenever PALLAS_AXON_POOL_IPS is set and the ambient JAX_PLATFORMS=axon
# wins over setdefault — tests must run on true CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: per-call CPU jit compiles are slow in this
# build (seconds each); caching them makes repeated suite runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax

# The image's sitecustomize imports jax at interpreter start, snapshotting
# JAX_PLATFORMS=axon into the config before this file runs — env vars alone
# are not enough; update the live config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
