"""BLS12-381 GLV endomorphism: host layer, device Barrett decomposition,
ladder schedule, and (slow-gated) the fused Pallas GLV ladder with 24-limb
field constants.

The reference's BLS engine multiplies by plain double-and-add
(/root/reference/pairing/src/bls12_381/ec.rs); GLV is a pure performance
transform - results are identical points.
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phase2_bn254_tpu.bls12_381 import curve as bc
from phase2_bn254_tpu.bls12_381 import device as bdev
from phase2_bn254_tpu.bls12_381 import glv
from phase2_bn254_tpu.bls12_381.field import R_MOD
from phase2_bn254_tpu.field import fp

random.seed(31)

EDGE = [0, 1, 2, R_MOD - 1, glv.LAMBDA, R_MOD - glv.LAMBDA]


def test_phi_is_lambda_eigenmap():
    P = bc.G1_GEN.mul(random.randrange(1, R_MOD))
    assert glv.phi(P) == P.mul(glv.LAMBDA)
    assert glv.phi(glv.phi(P)) == P.mul(pow(glv.LAMBDA, 2, R_MOD))


def test_decompose_identity_and_bounds():
    for k in EDGE + [random.randrange(R_MOD) for _ in range(25)]:
        k1, k2 = glv.decompose(k)
        assert (k1 + k2 * glv.LAMBDA - k) % R_MOD == 0
        assert abs(k1).bit_length() <= glv.MAX_COMPONENT_BITS
        assert abs(k2).bit_length() <= glv.MAX_COMPONENT_BITS


def test_mul_glv_matches_plain_mul():
    P = bc.G1_GEN.mul(5)
    for k in EDGE + [random.randrange(R_MOD) for _ in range(5)]:
        assert glv.mul_glv(P, k) == P.mul(k % R_MOD)


def test_device_decompose_identity():
    scalars = EDGE + [random.randrange(R_MOD) for _ in range(25)]
    sc_t = jnp.asarray(
        np.stack([fp.int_to_limbs(s, 17) for s in scalars]).T
    )
    d1, d2, negs = jax.device_get(bdev.decompose_glv_t(sc_t))
    assert d1.shape == (33, len(scalars))
    for i, k in enumerate(scalars):
        parts = []
        for digs, neg in ((d1, negs[0]), (d2, negs[1])):
            mag = 0
            for w in range(33):
                mag = (mag << 4) | int(digs[w, i])
            assert mag.bit_length() <= glv.MAX_COMPONENT_BITS + 1
            parts.append(-mag if neg[i] else mag)
        k1, k2 = parts
        assert (k1 + k2 * glv.LAMBDA - k) % R_MOD == 0, (i, k)


def test_ladder_schedule_exact_simulation():
    """Replay the digit/sign/phi schedule the Pallas kernel consumes with
    exact host arithmetic."""
    P = bc.G1_GEN.mul(123456789)
    scalars = [random.randrange(R_MOD) for _ in range(3)] + [0, 1, R_MOD - 1]
    sc_t = jnp.asarray(np.stack([fp.int_to_limbs(s, 17) for s in scalars]).T)
    d1, d2, negs = jax.device_get(bdev.decompose_glv_t(sc_t))
    phiP = glv.phi(P)
    for idx, k in enumerate(scalars):
        acc = bc.point_zero("g1")
        for w in range(33):
            for _ in range(4):
                acc = acc.double()
            for digs, neg, base in ((d1, negs[0], P), (d2, negs[1], phiP)):
                d = int(digs[w, idx])
                if d == 0:
                    continue
                e = base.mul(d)
                if neg[idx]:
                    e = e.neg()
                acc = acc.add(e)
        assert acc == P.mul(k), (idx, k)


@pytest.mark.skipif(
    not os.environ.get("PHASE2_TPU_SLOW_TESTS"),
    reason="interpret-mode Pallas 24-limb GLV ladder costs minutes of "
    "XLA:CPU; set PHASE2_TPU_SLOW_TESTS=1 to run",
)
def test_pallas_glv_ladder_matches_host():
    n = 4
    pts = [bc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    scalars = [random.randrange(R_MOD) for _ in range(n - 2)] + [0, 1]
    got = bdev.pallas_batch_mul_glv(pts, scalars)
    assert got == [p.mul(s) for p, s in zip(pts, scalars)]


def test_device_signed_decompose_identity():
    scalars = EDGE + [random.randrange(R_MOD) for _ in range(25)]
    sc_t = jnp.asarray(np.stack([fp.int_to_limbs(s, 17) for s in scalars]).T)
    d1, d2 = jax.device_get(bdev.decompose_glv_signed_t(sc_t))
    w5 = d1.shape[0]
    assert d1.min() >= -16 and d1.max() <= 16
    assert d2.min() >= -16 and d2.max() <= 16
    for i, k in enumerate(scalars):
        parts = []
        for digs in (d1, d2):
            v = 0
            for w in range(w5):
                v = (v << 5) + int(digs[w, i])
            parts.append(v)
        k1, k2 = parts
        assert (k1 + k2 * glv.LAMBDA - k) % R_MOD == 0, (i, k)


@pytest.mark.skipif(
    not os.environ.get("PHASE2_TPU_SLOW_TESTS"),
    reason="interpret-mode Pallas 24-limb signed GLV ladder costs minutes of "
    "XLA:CPU; set PHASE2_TPU_SLOW_TESTS=1 to run",
)
def test_pallas_signed_glv_ladder_matches_host():
    n = 4
    pts = [bc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    scalars = [random.randrange(R_MOD) for _ in range(n - 2)] + [0, 1]
    got = bdev.pallas_batch_mul_glv_signed(pts, scalars)
    assert got == [p.mul(s) for p, s in zip(pts, scalars)]
