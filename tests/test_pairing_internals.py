"""BN254 pairing internals: tower-Karatsuba Fq12 arithmetic vs schoolbook,
the sparse line multiplication, the Frobenius-chain final exponentiation vs
a direct hard-part power, and ate/Tate agreement on same-ratio booleans.

The default `pairing` is the reduced optimal ate
(/root/reference/pairing/src/bn256/mod.rs:57-227); `tate_pairing` is an
independent second implementation kept as a cross-check oracle.
"""

import random

from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl import pairing as pr
from phase2_bn254_tpu.refimpl.field import FQ2_ZERO, Fq2, R_MOD

random.seed(21)


def _rnd2():
    return Fq2(random.randrange(pr.Q), random.randrange(pr.Q))


def _rnd12():
    return tuple(_rnd2() for _ in range(6))


def _school_mul(a, b):
    c = [FQ2_ZERO] * 11
    for i in range(6):
        for j in range(6):
            c[i + j] = c[i + j] + a[i] * b[j]
    out = list(c[:6])
    for k in range(6, 11):
        out[k - 6] = out[k - 6] + c[k] * pr.XI
    return tuple(out)


def test_tower_mul_sqr_vs_schoolbook():
    for _ in range(8):
        a, b = _rnd12(), _rnd12()
        assert pr.fq12_mul(a, b) == _school_mul(a, b)
        assert pr.fq12_sqr(a) == _school_mul(a, a)


def test_sparse_line_mul():
    for _ in range(8):
        a = _rnd12()
        c0 = random.randrange(pr.Q)
        c1, c3 = _rnd2(), _rnd2()
        sparse = (Fq2(c0, 0), c1, FQ2_ZERO, c3, FQ2_ZERO, FQ2_ZERO)
        assert pr.fq12_mul_line(a, c0, c1, c3) == _school_mul(a, sparse)


def test_final_exponentiation_chain_vs_direct():
    p = rc.G1_GEN.mul(random.randrange(1, R_MOD))
    q = rc.G2_GEN.mul(random.randrange(1, R_MOD))
    f = pr.miller_loop_ate(p, q)
    direct = pr.fq12_mul(pr.fq12_conj_w(f), pr.fq12_inv(f))
    direct = pr.fq12_mul(pr.fq12_frobenius(direct, 2), direct)
    direct = pr.fq12_pow(direct, pr._HARD_EXP)
    assert pr.final_exponentiation(f) == direct


def test_ate_bilinearity_and_order():
    a = random.randrange(1, R_MOD)
    b = random.randrange(1, R_MOD)
    e = pr.pairing(rc.G1_GEN, rc.G2_GEN)
    assert e != pr.FQ12_ONE
    assert pr.fq12_pow(e, R_MOD) == pr.FQ12_ONE
    assert pr.pairing(rc.G1_GEN.mul(a), rc.G2_GEN.mul(b)) == pr.fq12_pow(
        e, a * b % R_MOD
    )
    # infinity handling
    assert pr.pairing(rc.point_zero("g1"), rc.G2_GEN) == pr.FQ12_ONE


def test_ate_equals_tate_on_ratio_booleans():
    """Reduced ate and Tate differ by a fixed r-coprime power, so every
    equality-of-products check agrees between them."""
    s = random.randrange(1, R_MOD)
    p = rc.G1_GEN.mul(random.randrange(1, R_MOD))
    q = rc.G2_GEN.mul(random.randrange(1, R_MOD))
    for e in (pr.pairing, pr.tate_pairing):
        assert e(p.mul(s), q) == e(p, q.mul(s))
        assert e(p.mul(s), q) != e(p, q.mul(s + 1))


def test_ate_value_pin():
    """Pin e(G1, G2) tower coefficients so the serialized Fq12 surface
    (vk_alfabeta_12) cannot silently change across refactors."""
    import hashlib

    e = pr.pairing(rc.G1_GEN, rc.G2_GEN)
    blob = b"".join(v.to_bytes(32, "big") for v in pr.fq12_to_tower_coeffs(e))
    assert (
        hashlib.sha256(blob).hexdigest()
        == PIN_E_G1_G2
    )


# sha256 of the 12 big-endian tower coefficients of e(G1, G2); computed from
# two independent Miller-loop implementations (twist-affine and embedded
# Fq12) before the embedded one was replaced
PIN_E_G1_G2 = "fb26b1c6e9acaab5348b05c9e7aa5e9418aa797c24f49052ae4585632b1cb52b"
