"""SONIC core scaffolding: Keccak transcript, SRS round-trip, Kate division,
polynomial commitment open/verify end-to-end."""

import random

from phase2_bn254_tpu.crypto.keccak import keccak256
from phase2_bn254_tpu.refimpl.field import R_MOD
from phase2_bn254_tpu.sonic import (
    SRS,
    Transcript,
    check_polynomial_commitment,
    evaluate_at_consecutive_powers,
    kate_division,
    multiply_polynomials,
    polynomial_commitment,
    polynomial_commitment_opening,
)

random.seed(42)


def test_keccak256_vectors():
    # published Keccak-256 (0x01 padding) digests
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_kate_division_identity():
    """(x - z) * q(x) == p(x) - p(z) (the laurent_division test,
    util.rs:570-628, over the positive-power special case)."""
    coeffs = [random.randrange(R_MOD) for _ in range(8)]
    z = random.randrange(R_MOD)
    p_at_z = evaluate_at_consecutive_powers(coeffs, 1, z)
    shifted = list(coeffs)
    shifted[0] = (shifted[0] - p_at_z) % R_MOD
    q = kate_division(shifted, z)
    x = random.randrange(R_MOD)
    p_at_x = evaluate_at_consecutive_powers(coeffs, 1, x)
    q_at_x = evaluate_at_consecutive_powers(q, 1, x)
    assert (q_at_x * (x - z)) % R_MOD == (p_at_x - p_at_z) % R_MOD


def test_srs_roundtrip():
    srs = SRS.new(4, x=1234577, alpha=9876543)
    data = srs.write()
    srs2 = SRS.read(data)
    assert srs2 == srs
    assert len(data) == 4 + 64 * (2 * 5 + 2 * 4) + 128 * (4 * 5)


def test_polynomial_commitment_end_to_end():
    """Commit to f, open at z, verify the pairing equation
    (util.rs:535-568). Positive powers only (largest_negative_power=0)."""
    d = 8
    x, alpha = 77777, 333333
    srs = SRS.new(d, x, alpha)
    n = 4  # f has degree n-1, coefficients of x^0..x^(n-1)
    coeffs = [random.randrange(R_MOD) for _ in range(n)]
    # max = d-1: commitment basis starts at alpha*x^1, so F = g^{alpha*x*f(x)}
    # and the check pairs against h^{x^-1} (the d >= max+neg+1 branch)
    max_power = d - 1

    c = polynomial_commitment(max_power, 0, n - 1, srs, coeffs)

    z = random.randrange(R_MOD)
    v = evaluate_at_consecutive_powers(coeffs, 1, z)
    shifted = list(coeffs)
    shifted[0] = (shifted[0] - v) % R_MOD
    w = polynomial_commitment_opening(0, n - 1, shifted, z, srs)

    assert check_polynomial_commitment(c, z, v, w, max_power, srs)
    # wrong value must fail
    assert not check_polynomial_commitment(c, z, (v + 1) % R_MOD, w, max_power, srs)


def test_multiply_polynomials():
    a = [random.randrange(R_MOD) for _ in range(3)]
    b = [random.randrange(R_MOD) for _ in range(4)]
    out = multiply_polynomials(a, b)
    x = random.randrange(R_MOD)
    ax = evaluate_at_consecutive_powers(a, 1, x)
    bx = evaluate_at_consecutive_powers(b, 1, x)
    ox = evaluate_at_consecutive_powers(out, 1, x)
    assert ox == (ax * bx) % R_MOD


def test_transcript_determinism():
    t1 = Transcript(b"sonic")
    t2 = Transcript(b"sonic")
    t1.commit_scalar(12345)
    t2.commit_scalar(12345)
    c1 = t1.get_challenge_scalar()
    assert c1 == t2.get_challenge_scalar()
    assert 0 <= c1 < R_MOD
    # divergent transcripts give different challenges
    t3 = Transcript(b"sonic")
    t3.commit_scalar(12346)
    assert t3.get_challenge_scalar() != c1
