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
# NOTE: no persistent compilation cache on CPU - XLA:CPU AOT cache entries
# have crashed on reload in this environment (machine-feature mismatches in
# the AOT loader lead to SIGSEGV/SIGILL). Setting the dir to a sentinel
# prevents the package __init__ from installing its own cache either.
os.environ.setdefault("PHASE2_TPU_NO_CACHE", "1")

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
