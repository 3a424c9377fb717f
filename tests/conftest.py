"""Test configuration: force the CPU platform with 8 virtual devices.

The session's default platform is the remote `axon` TPU tunnel, which makes
eager dispatch unusably slow for tests; multi-chip sharding tests run on a
virtual 8-device CPU mesh instead (the driver separately dry-runs the
multi-chip path).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Keep the package __init__ from installing its own cache config; the test
# cache is configured explicitly below.
os.environ.setdefault("PHASE2_TPU_NO_CACHE", "1")

# Persistent XLA:CPU compilation cache for the test suite — OPT-IN via
# PHASE2_TPU_TEST_CACHE=1. The suite's cost is almost entirely XLA:CPU
# compiles (~36 min parallel cold) and a warm cache turns reruns into
# minutes, BUT reloading serialized executables that contain Pallas
# interpret-mode custom calls segfaults INTERMITTENTLY across processes
# (observed repeatedly 2026-08-20: xdist workers die in
# compilation_cache.get_executable_and_time mid-suite — the same
# AOT-reload crash class round 1 hit). A default suite run must be green
# on a fresh checkout, so correctness wins over warm-rerun speed.
if os.environ.get("PHASE2_TPU_TEST_CACHE"):
    import platform as _platform

    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache",
        f"jax_test_cpu8_{_platform.machine()}",
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The XLA:CPU compiler has segfaulted when compiling the largest programs
    late in a long test session (memory pressure from every previously
    compiled executable being held live); dropping them bounds process RSS.
    """
    yield
    jax.clear_caches()
