"""Full phase-1 ceremony round through the ShardedBackend on the 8-device
CPU mesh, byte-identical to the exact host backend.

This is the multi-chip analog of test_ceremony_phase1: every pow_mul and
verification MSM runs sharded over the mesh (shard_map + all_gather), and the
resulting challenge/response/new-challenge files must match the exact Python
spec byte for byte (the parity surface of
/root/reference/powersoftau/test.sh).

Gated behind PHASE2_TPU_SLOW_TESTS=1: XLA:CPU compiles each 8-way-partitioned
shard_map program in ~100 s; the persistent test compile cache (conftest,
re-enabled 2026-08-17) makes warm reruns much cheaper, but a cold run still
costs >30 min of compilation. The sharded kernels themselves are covered in
the default suite by test_parallel.py, and the 2-process multi-host e2e
contribute byte-parity runs in the default suite (test_multihost.py); this
module is the byte-parity sweep for the whole round including verify
(run it after changes to parallel/backend.py or parallel/sharded.py).
"""

import os

import jax
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("PHASE2_TPU_SLOW_TESTS"),
    reason="full sharded-ceremony round costs >30 min of XLA:CPU compiles; "
    "set PHASE2_TPU_SLOW_TESTS=1 to run",
)

from phase2_bn254_tpu.cli.phase1 import (
    contribute,
    new_challenge,
    participant_rng,
    verify_transform,
)
from phase2_bn254_tpu.parallel.backend import ShardedBackend
from phase2_bn254_tpu.refimpl.backend import ExactBackend

SIZE, BATCH = 4, 8


def _run_round(tmpdir, backend, tag):
    c1 = os.path.join(tmpdir, f"challenge1_{tag}")
    r1 = os.path.join(tmpdir, f"response1_{tag}")
    c2 = os.path.join(tmpdir, f"challenge2_{tag}")
    new_challenge(c1, SIZE, BATCH)
    rng = participant_rng("deterministic test entropy", system_entropy=bytes(1024))
    contribute(c1, r1, SIZE, BATCH, rng, backend=backend)
    verify_transform(c1, r1, c2, SIZE, BATCH, backend=backend)
    return tuple(open(p, "rb").read() for p in (c1, r1, c2))


@pytest.fixture(scope="module")
def mesh_backend():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    # min_per_device=4 keeps padded batches small for the CPU-mesh test while
    # still giving every device a real shard at SIZE=4
    return ShardedBackend(min_per_device=4)


def test_sharded_ceremony_matches_exact(tmp_path, mesh_backend):
    files_sharded = _run_round(str(tmp_path), mesh_backend, "sharded")
    files_exact = _run_round(str(tmp_path), ExactBackend(), "exact")
    for fs, fe, name in zip(
        files_sharded, files_exact, ("challenge", "response", "new_challenge")
    ):
        assert fs == fe, f"{name} bytes differ between sharded and exact backends"
