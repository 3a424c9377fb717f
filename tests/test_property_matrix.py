"""Generic property-test matrix over both engines (BN254 + BLS12-381).

Mirrors the reference's generic suites, which instantiate one set of
trait-parameterized tests per curve/field
(/root/reference/pairing/src/tests/{curve.rs,field.rs,engine.rs} applied to
bn256 at ec.rs:1064-1068 and bls12_381 at ec.rs:1310-1320): random
add/sub/mul/inverse/sqrt field laws, curve doubling/addition/negation/mul
consistency, wNAF vs naive, and pairing bilinearity.

Runs on the exact host layers (the golden oracles for the device kernels);
counts are kept small because these are Python bigints.
"""

import random

import pytest

from phase2_bn254_tpu.refimpl import curve as bn_curve
from phase2_bn254_tpu.refimpl import field as bn_field
from phase2_bn254_tpu.refimpl import pairing as bn_pairing
from phase2_bn254_tpu.refimpl import wnaf as bn_wnaf
from phase2_bn254_tpu.bls12_381 import curve as bls_curve
from phase2_bn254_tpu.bls12_381 import field as bls_field
from phase2_bn254_tpu.bls12_381 import pairing as bls_pairing

N_SAMPLES = 6


# ---------------------------------------------------------------------------
# field laws: every extension field class with mul/square/inverse/pow
# ---------------------------------------------------------------------------

def _bn_fq2(rng):
    return bn_field.Fq2(rng.randrange(bn_field.Q), rng.randrange(bn_field.Q))


def _bls_fq2(rng):
    return bls_field.Fq2(rng.randrange(bls_field.Q), rng.randrange(bls_field.Q))


def _bls_fq6(rng):
    return bls_field.Fq6(_bls_fq2(rng), _bls_fq2(rng), _bls_fq2(rng))


def _bls_fq12(rng):
    return bls_field.Fq12(_bls_fq6(rng), _bls_fq6(rng))


FIELD_CASES = [
    ("bn254-fq2", _bn_fq2, bn_field.FQ2_ONE),
    ("bls-fq2", _bls_fq2, bls_field.FQ2_ONE),
    ("bls-fq6", _bls_fq6, bls_field.FQ6_ONE),
    ("bls-fq12", _bls_fq12, bls_field.FQ12_ONE),
]


@pytest.mark.parametrize("name,sample,one", FIELD_CASES, ids=[c[0] for c in FIELD_CASES])
def test_field_laws(name, sample, one):
    rng = random.Random(42)
    for _ in range(N_SAMPLES):
        a, b, c = sample(rng), sample(rng), sample(rng)
        # commutativity / associativity / distributivity
        assert a * b == b * a
        assert (a * b) * c == a * (b * c)
        if hasattr(a, "__add__"):
            assert (a + b) * c == a * c + b * c
            # (a+b)^2 == a^2 + 2ab + b^2
            assert (a + b).square() == a.square() + a * b + a * b + b.square()
        # inverse
        assert a * a.inverse() == one
        # squaring law
        assert a.square() == a * a


@pytest.mark.parametrize(
    "name,sample",
    [("bn254-fq2", _bn_fq2), ("bls-fq2", _bls_fq2)],
    ids=["bn254-fq2", "bls-fq2"],
)
def test_fq2_sqrt_laws(name, sample):
    rng = random.Random(7)
    found_none = 0
    for _ in range(N_SAMPLES):
        a = sample(rng)
        r = a.square().sqrt()
        assert r is not None and (r == a or r == -a)
        if a.sqrt() is None:
            found_none += 1
    # roughly half of random elements are non-residues; at least one expected
    assert found_none >= 1


def test_bls_frobenius_is_power_map():
    rng = random.Random(11)
    q = bls_field.Q
    for _ in range(3):
        a = _bls_fq2(rng)
        assert a.frobenius(1) == a.pow(q)
    # Fq6/Fq12 frobenius coefficient tables: check via the multiplicative
    # property (x*y)^phi == x^phi * y^phi and phi^6 == identity on Fq6
    x, y = _bls_fq6(rng), _bls_fq6(rng)
    assert (x * y).frobenius(1) == x.frobenius(1) * y.frobenius(1)
    z = x
    for _ in range(6):
        z = z.frobenius(1)
    assert z == x
    w = _bls_fq12(rng)
    assert (w * w).frobenius(1) == w.frobenius(1) * w.frobenius(1)
    z = w
    for _ in range(12):
        z = z.frobenius(1)
    assert z == w


# ---------------------------------------------------------------------------
# curve laws per (engine, group)
# ---------------------------------------------------------------------------

CURVE_CASES = [
    ("bn254-g1", bn_curve.G1_GEN, bn_curve.point_zero, bn_field.R_MOD),
    ("bn254-g2", bn_curve.G2_GEN, bn_curve.point_zero, bn_field.R_MOD),
    ("bls-g1", bls_curve.G1_GEN, bls_curve.point_zero, bls_field.R_MOD),
    ("bls-g2", bls_curve.G2_GEN, bls_curve.point_zero, bls_field.R_MOD),
]


@pytest.mark.parametrize("name,gen,zero_of,order", CURVE_CASES, ids=[c[0] for c in CURVE_CASES])
def test_curve_laws(name, gen, zero_of, order):
    rng = random.Random(1234)
    zero = zero_of(gen.group)
    assert gen.is_on_curve()
    assert zero.add(gen) == gen and gen.add(zero) == gen
    assert gen.add(gen.neg()).is_zero()
    for _ in range(3):
        n, m = rng.randrange(1, order), rng.randrange(1, order)
        p, q = gen.mul(n), gen.mul(m)
        assert p.is_on_curve()
        # homomorphism: (n+m)G == nG + mG
        assert gen.mul((n + m) % order) == p.add(q)
        # doubling consistency
        assert p.add(p) == p.double()
        # subgroup order
    assert gen.mul(order).is_zero()
    assert gen.mul(order + 5) == gen.mul(5)


def test_wnaf_vs_naive_bn254():
    """random_wnaf_tests analog (tests/curve.rs:68-93) for both groups."""
    rng = random.Random(99)
    for gen in (bn_curve.G1_GEN, bn_curve.G2_GEN):
        for _ in range(3):
            k = rng.randrange(1, bn_field.R_MOD)
            w = bn_wnaf.recommended_wnaf_for_scalar(k.bit_length(), gen.group)
            table = bn_wnaf.wnaf_table(gen, w)
            form = bn_wnaf.wnaf_form(k, w)
            assert bn_wnaf.wnaf_exp(table, form) == gen.mul(k)


# ---------------------------------------------------------------------------
# engine tests: bilinearity per engine (engine.rs:5-126 analog)
# ---------------------------------------------------------------------------

ENGINE_CASES = [
    ("bn254", bn_curve, bn_pairing, bn_field.R_MOD),
    ("bls12_381", bls_curve, bls_pairing, bls_field.R_MOD),
]


@pytest.mark.parametrize("name,curve_m,pairing_m, order", ENGINE_CASES, ids=[c[0] for c in ENGINE_CASES])
def test_engine_bilinearity(name, curve_m, pairing_m, order):
    rng = random.Random(5)
    a, b = rng.randrange(1, 1 << 16), rng.randrange(1, 1 << 16)
    e_ab = pairing_m.pairing(curve_m.G1_GEN.mul(a), curve_m.G2_GEN.mul(b))
    e_ba = pairing_m.pairing(curve_m.G1_GEN.mul(b), curve_m.G2_GEN.mul(a))
    e_1ab = pairing_m.pairing(curve_m.G1_GEN, curve_m.G2_GEN.mul(a * b))
    assert e_ab == e_ba == e_1ab
    assert pairing_m.same_ratio(
        (curve_m.G1_GEN, curve_m.G1_GEN.mul(a)),
        (curve_m.G2_GEN, curve_m.G2_GEN.mul(a)),
    )


# ---------------------------------------------------------------------------
# expanded generics (tests/field.rs:56-120, curve.rs:120-345, engine.rs:5-55)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,sample,one", FIELD_CASES, ids=[c[0] for c in FIELD_CASES])
def test_field_expansion_and_inversion(name, sample, one):
    """random_expansion_tests + random_inversion_tests
    (tests/field.rs:56-66, 120-180): (a+b)(c+d) distributes; a * a^-1 = 1."""
    rng = random.Random(7)
    for _ in range(N_SAMPLES):
        a, b, c, d = (sample(rng) for _ in range(4))
        lhs = (a + b) * (c + d)
        rhs = a * c + a * d + b * c + b * d
        assert lhs == rhs
        if not a.is_zero():
            assert a * a.inverse() == one
        # squaring == self-multiplication; sub inverts add
        assert a.square() == a * a
        assert a + b - b == a


CURVE_CASES = [
    ("bn254-g1", bn_curve.G1_GEN, bn_field.R_MOD),
    ("bn254-g2", bn_curve.G2_GEN, bn_field.R_MOD),
    ("bls-g1", bls_curve.G1_GEN, bls_field.R_MOD),
    ("bls-g2", bls_curve.G2_GEN, bls_field.R_MOD),
]


@pytest.mark.parametrize("name,gen,order", CURVE_CASES, ids=[c[0] for c in CURVE_CASES])
def test_curve_distributivity_associativity(name, gen, order):
    """random_addition_tests + random_multiplication_tests
    (tests/curve.rs:118-230): (a+b)+c = a+(b+c); (s1+s2)P = s1 P + s2 P;
    s(A+B) = sA + sB; doubling edge cases."""
    rng = random.Random(13)
    for _ in range(3):
        a = gen.mul(rng.randrange(1, order))
        b = gen.mul(rng.randrange(1, order))
        c = gen.mul(rng.randrange(1, order))
        assert a.add(b).add(c) == a.add(b.add(c))
        assert a.add(b) == b.add(a)
        s1, s2 = rng.randrange(order), rng.randrange(order)
        assert a.mul((s1 + s2) % order) == a.mul(s1).add(a.mul(s2))
        assert a.add(b).mul(s1) == a.mul(s1).add(b.mul(s1))
        # a + a == double(a); a - a == 0
        assert a.add(a) == a.double()
        assert a.add(a.neg()).is_zero()


@pytest.mark.parametrize("name,curve_m,pairing_m, order", ENGINE_CASES, ids=[c[0] for c in ENGINE_CASES])
def test_engine_miller_loop_identities(name, curve_m, pairing_m, order):
    """engine_tests (tests/engine.rs:5-55): infinity pairs reduce to one,
    and the reduced pairing of a product of Miller loops is the product of
    reduced pairings."""
    rng = random.Random(17)
    zero1 = curve_m.point_zero("g1")
    a = curve_m.G1_GEN.mul(rng.randrange(1, order))
    b = curve_m.G2_GEN.mul(rng.randrange(1, order))
    c = curve_m.G1_GEN.mul(rng.randrange(1, order))
    d = curve_m.G2_GEN.mul(rng.randrange(1, order))

    assert pairing_m.pairing(zero1, b) == pairing_m.pairing(a, curve_m.point_zero("g2"))

    if name == "bn254":
        ml = pairing_m.miller_loop_ate
        fe = pairing_m.final_exponentiation
        mul = pairing_m.fq12_mul
    else:
        ml = pairing_m.miller_loop
        fe = pairing_m.final_exponentiation
        mul = lambda x, y: x * y
    prod = fe(mul(ml(a, b), ml(c, d)))
    assert prod == mul(pairing_m.pairing(a, b), pairing_m.pairing(c, d))


def test_wnaf_window_sweep():
    """random_wnaf_tests window sweep (tests/curve.rs:68-93): every window
    width w in [2, 8) agrees with plain multiplication, both groups."""
    rng = random.Random(23)
    for gen in (bn_curve.G1_GEN, bn_curve.G2_GEN):
        base = gen.mul(rng.randrange(1, bn_field.R_MOD))
        k = rng.randrange(1, bn_field.R_MOD)
        expect = base.mul(k)
        for w in range(2, 8):
            table = bn_wnaf.wnaf_table(base, w)
            form = bn_wnaf.wnaf_form(k, w)
            assert bn_wnaf.wnaf_exp(table, form) == expect
