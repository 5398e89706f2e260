"""Test configuration: force the CPU backend with 8 virtual devices so that
multi-chip sharding tests run anywhere (the TPU-hardware path is exercised by
bench.py and the driver's compile checks).

Must set env vars before the first jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

# The container's sitecustomize registers the TPU ("axon") platform and wins
# over the env var, so force the platform through the config API as well
# (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop in-memory compiled executables at module boundaries.

    The full suite compiles hundreds of XLA CPU programs in one process;
    with everything kept live the process reaches ~7 GB RSS and the XLA CPU
    compiler segfaults reproducibly near the end of the run (observed at
    test_serving's golay decode-step compile; the same test passes in
    isolation). The persistent disk cache (JAX_COMPILATION_CACHE_DIR)
    keeps cross-run recompiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def mesh8():
    """An 8-device (data=2, model=4) mesh on the virtual CPU devices."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devices, ("data", "model"))
