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


def _rand_fq12_host(rng):
    from phase2_bn254_tpu.refimpl.field import Fq2
    from phase2_bn254_tpu.refimpl.pairing import Q

    return tuple(Fq2(rng.randrange(Q), rng.randrange(Q)) for _ in range(6))


def _to_dev(vals):
    import jax.numpy as jnp
    import numpy as np

    from phase2_bn254_tpu.field import fp
    from phase2_bn254_tpu.ops import pairing_device as pd

    out = np.zeros((len(vals), 6, 2, fp.NLIMBS), np.uint32)
    for lane, v in enumerate(vals):
        for i in range(6):
            out[lane, i, 0] = fp.int_to_limbs(pd.CTX.to_mont_int(v[i].c0))
            out[lane, i, 1] = fp.int_to_limbs(pd.CTX.to_mont_int(v[i].c1))
    return jnp.asarray(out)


def test_fq12_tower_ops_match_host():
    """Device fq12 mul/sqr/conj/frobenius/inv vs refimpl on random lanes
    (piece-level; the full Miller/final-exp equality is the test above)."""
    import jax

    from phase2_bn254_tpu.ops import pairing_device as pd
    from phase2_bn254_tpu.refimpl import pairing as hp

    rng = random.Random(3)
    a = [_rand_fq12_host(rng) for _ in range(2)]
    b = [_rand_fq12_host(rng) for _ in range(2)]
    da, db = _to_dev(a), _to_dev(b)

    got = pd.fq12_to_host(jax.jit(pd.fq12_mul)(da, db))
    assert got == [hp.fq12_mul(x, y) for x, y in zip(a, b)]
    got = pd.fq12_to_host(jax.jit(pd.fq12_sqr)(da))
    assert got == [hp.fq12_sqr(x) for x in a]
    got = pd.fq12_to_host(pd.fq12_conj(da))
    assert got == [hp.fq12_conj_w(x) for x in a]
    got = pd.fq12_to_host(jax.jit(pd.fq12_frobenius)(da))
    assert got == [hp.fq12_frobenius(x) for x in a]
    got = pd.fq12_to_host(jax.jit(pd.fq12_inv)(da))
    assert got == [hp.fq12_inv(x) for x in a]
