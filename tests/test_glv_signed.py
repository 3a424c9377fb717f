"""Signed base-32 GLV ladder: digit recode identities + the Pallas kernel.

The signed double ladder (26 windows x 5 doublings + 2 adds) replaces the
unsigned 4-bit one (33 x 4 + 2) for ~10% fewer mont_muls; reference cost
model: per-point wNAF in /root/reference/powersoftau/src/batched_accumulator.rs
:1130-1181 (batch_exp) is the op being accelerated.
"""

import random

import jax.numpy as jnp
import numpy as np

from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import glv_device, pallas_exp
from phase2_bn254_tpu.refimpl import glv as rglv
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(97)

W5 = glv_device.BN_PLAN.windows5
LAMBDA = rglv.LAMBDA


def _edge_scalars():
    return [
        1,
        2,
        R_MOD - 1,
        R_MOD // 2,
        (R_MOD - 1) // 2,
        LAMBDA,
        R_MOD - LAMBDA,
        (1 << 128) - 1,
        1 << 253,
    ]


def _scalars_t(scalars):
    arr = np.stack([fp.int_to_limbs(s) for s in scalars])
    return jnp.asarray(arr.T)


def _digits_value(col):
    """MSB-first signed base-32 digits -> signed integer."""
    v = 0
    for d in col:
        v = (v << 5) + int(d)
    return v


def test_windows5_sizing():
    # 26 windows must cover the analytic bound incl. device Barrett slack
    assert W5 == 26
    bound = 3 * max(
        abs(rglv._A1) + abs(rglv._A2), abs(rglv._B1) + abs(rglv._B2)
    ) // 2 + 2
    assert 15 * ((1 << (5 * W5)) - 1) // 31 >= bound


def test_host_recode_identity():
    scalars = _edge_scalars() + [random.randrange(R_MOD) for _ in range(64)]
    d1, d2 = pallas_exp.glv_signed_digit_arrays(scalars)
    assert d1.min() >= -16 and d1.max() <= 16  # sign fold maps [-16,15] -> [-16,16]
    for i, s in enumerate(scalars):
        k1 = _digits_value(d1[:, i])
        k2 = _digits_value(d2[:, i])
        assert (k1 + k2 * LAMBDA - s) % R_MOD == 0


def test_device_signed_decompose_matches_scalar():
    """Device Barrett split + signed recode reconstructs k mod r, with every
    digit in [-16, 16] (sign fold)."""
    scalars = _edge_scalars() + [random.randrange(R_MOD) for _ in range(55)]
    d1, d2 = glv_device.decompose_signed_device_t(_scalars_t(scalars))
    d1 = np.asarray(d1)
    d2 = np.asarray(d2)
    assert d1.shape == (W5, len(scalars))
    assert d1.min() >= -16 and d1.max() <= 16
    assert d2.min() >= -16 and d2.max() <= 16
    for i, s in enumerate(scalars):
        k1 = _digits_value(d1[:, i])
        k2 = _digits_value(d2[:, i])
        assert (k1 + k2 * LAMBDA - s) % R_MOD == 0, f"scalar {i}"


def test_signed_ladder_exact_schedule():
    """Replay the kernel's exact add/double schedule with Python ints."""
    scalars = [random.randrange(R_MOD) for _ in range(8)] + _edge_scalars()
    d1, d2 = pallas_exp.glv_signed_digit_arrays(scalars)
    for i, s in enumerate(scalars):
        acc = 0  # exponents in Z_r: table[k] "is" k, phi multiplies by lambda
        for w in range(W5):
            acc = (acc * 32) % R_MOD
            acc = (acc + int(d1[w, i])) % R_MOD
            acc = (acc + int(d2[w, i]) * LAMBDA) % R_MOD
        assert acc == s % R_MOD


def test_pallas_signed_glv_matches_host():
    """Signed GLV kernel (interpret mode) vs exact host scalar mul."""
    from phase2_bn254_tpu.curve import group as G
    from phase2_bn254_tpu.refimpl import curve as rc

    n = 8
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    scalars = [random.randrange(R_MOD) for _ in range(n - 2)] + [1, R_MOD - 1]
    batch = codecs.points_to_batch(pts, "g1")
    jac = pallas_exp.batch_exp_transposed_glv_signed(batch.x, batch.y, scalars, tile=8)
    aff = G.jac_normalize(codecs.FQ, jac)
    got = codecs.batch_to_points(aff, "g1")
    want = [p.mul(s) for p, s in zip(pts, scalars)]
    assert got == want


def test_pallas_signed_glv_device_digits():
    """Full production pipeline: device Barrett split -> signed kernel."""
    from phase2_bn254_tpu.curve import group as G
    from phase2_bn254_tpu.refimpl import curve as rc

    n = 8
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    batch = codecs.points_to_batch(pts, "g1")
    d1, d2 = glv_device.decompose_signed_device_t(
        _scalars_t(scalars)
    )
    ox, oy, oz = pallas_exp.pallas_batch_exp_glv_signed(
        batch.x.T, batch.y.T, d1, d2, 8
    )
    jac = G.JacobianBatch(ox.T, oy.T, oz.T)
    aff = G.jac_normalize(codecs.FQ, jac)
    got = codecs.batch_to_points(aff, "g1")
    want = [p.mul(s) for p, s in zip(pts, scalars)]
    assert got == want
