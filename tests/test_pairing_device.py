"""Device batched pairing vs the host optimal-ate oracle.

Gated: the batched Miller/final-exp scan programs cost minutes of XLA:CPU
compile (they are TPU-sized); the fast tier covers the same math through
refimpl (tests/test_pairing_internals.py).
"""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("PHASE2_TPU_XSLOW_TESTS"),
    reason="batched pairing scan programs cost ~1h of XLA:CPU compile on this "
    "box (XLA:CPU compiles these op-heavy programs at ~100s per ~2k-op "
    "ladder); set PHASE2_TPU_XSLOW_TESTS=1 to run",
)

random.seed(12)


def test_batch_pairing_matches_host():
    from phase2_bn254_tpu.ops import pairing_device as pd
    from phase2_bn254_tpu.refimpl import curve as rc
    from phase2_bn254_tpu.refimpl import pairing as hp
    from phase2_bn254_tpu.refimpl.field import R_MOD

    n = 4
    pts1 = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    pts2 = [rc.G2_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    out = pd.batch_pairing(*pd.points_to_arrays(pts1, pts2))
    got = pd.fq12_to_host(out)
    for i in range(n):
        assert got[i] == hp.pairing(pts1[i], pts2[i]), f"lane {i}"
