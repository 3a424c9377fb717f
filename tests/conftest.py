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

# Persistent XLA:CPU compilation cache for the test suite. The suite's cost
# is almost entirely XLA:CPU compiles (~36 min parallel cold); a warm cache
# turns reruns into minutes. Round 1 disabled this after AOT-reload
# crashes; re-validated 2026-08-17 on jax 0.9.0: entries written and
# reloaded by the SAME machine+flags work (the loader's noisy
# "prefer-no-scatter/gather" feature warnings are synthetic tuning prefs,
# not ISA mismatches). The cache dir is keyed by platform+devcount and
# lives under the repo so a different machine starts cold rather than
# loading foreign AOT code. PHASE2_TPU_TEST_NO_CACHE=1 kills it.
if not os.environ.get("PHASE2_TPU_TEST_NO_CACHE"):
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
