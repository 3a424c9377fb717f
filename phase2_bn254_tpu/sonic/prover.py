"""SONIC helped prover: create_proof / create_advice.

Mirrors /root/reference/bellman/src/sonic/helped/prover.rs. Polynomial
arithmetic runs through the package core (`multiply_polynomials` dispatches
to the device NTT above the host threshold; commitments/openings are MSMs).

Laurent layouts used throughout (index 0 = most negative power):

* r(X, 1): [blind_rev | c_rev | b_rev | 0 | a]  = X^{-2n-nb} .. X^{n}
* t(X, y) = r(X,1) * (r(X,y) + s(X,y))          = X^{-4n-2nb} .. X^{3n}
"""

from __future__ import annotations

import secrets

from ..refimpl.field import R_MOD
from . import (
    SRS,
    Transcript,
    multiply_polynomials,
    polynomial_commitment,
    polynomial_commitment_opening,
)
from .helped import NUM_BLINDINGS, Parameters, Proof, SxyAdvice
from .poly import SxEval, evaluate_at_consecutive_powers
from .synthesis import CountN, Wires, basic_synthesize


def create_advice_on_information_and_srs(
    circuit, proof: Proof, srs: SRS, n: int, driver=basic_synthesize
) -> SxyAdvice:
    """prover.rs:19-103: the "helper" computes the S commitment, s(z, y),
    and its opening so verifiers can skip S evaluation."""
    transcript = Transcript(b"")
    transcript.commit_point(proof.r)
    y = transcript.get_challenge_scalar()
    transcript.commit_point(proof.t)
    z = transcript.get_challenge_scalar()
    z_inv = pow(z, -1, R_MOD)

    sx = SxEval(y, n)
    driver(sx, circuit)
    s_neg, s_pos = sx.poly()

    from . import _msm

    basis = srs.g_positive_x_alpha[: 2 * n] + srs.g_negative_x_alpha[:n]
    s = _msm(basis, s_pos + s_neg)

    szy = (
        evaluate_at_consecutive_powers(s_pos, z, z)
        + evaluate_at_consecutive_powers(s_neg, z_inv, z_inv)
    ) % R_MOD

    # opening of (s(X, y) - s(z, y)) at z; Laurent layout X^{-n}..X^{2n}
    coeffs = list(reversed(s_neg)) + [(-szy) % R_MOD] + s_pos
    opening = polynomial_commitment_opening(n, 2 * n, coeffs, z, srs)
    return SxyAdvice(s=s, szy=szy, opening=opening)


def create_advice(circuit, proof: Proof, parameters: Parameters,
                  driver=basic_synthesize) -> SxyAdvice:
    return create_advice_on_information_and_srs(
        circuit, proof, parameters.srs, parameters.vk.n, driver
    )


def create_advice_on_srs(circuit, proof: Proof, srs: SRS,
                         driver=basic_synthesize) -> SxyAdvice:
    counter = CountN()
    driver(counter, circuit)
    return create_advice_on_information_and_srs(circuit, proof, srs, counter.n, driver)


def create_proof(circuit, parameters: Parameters, driver=basic_synthesize,
                 rng=None) -> Proof:
    return create_proof_on_srs(circuit, parameters.srs, driver, rng)


def create_proof_on_srs(circuit, srs: SRS, driver=basic_synthesize,
                        rng=None) -> Proof:
    """prover.rs:142-343. `rng()` supplies blinding scalars (defaults to OS
    entropy; injectable for deterministic tests)."""
    if rng is None:
        rng = lambda: secrets.randbelow(R_MOD)

    wires = Wires()
    driver(wires, circuit)
    n = len(wires.a)
    nb = NUM_BLINDINGS

    transcript = Transcript(b"")
    blindings = [rng() for _ in range(nb)]

    # r(X, 1) over X^{-2n-nb}..X^{n}
    rx1 = (
        list(reversed(blindings))
        + list(reversed(wires.c))
        + list(reversed(wires.b))
        + [0]
        + list(wires.a)
    )
    r = polynomial_commitment(n, 2 * n + nb, n, srs, rx1)
    transcript.commit_point(r)
    y = transcript.get_challenge_scalar()
    y_inv = pow(y, -1, R_MOD)

    # r(X, y): scale coefficient of X^k by y^k
    first = pow(y_inv, 2 * n + nb, R_MOD)
    rxy, cur = [], first
    for c in rx1:
        rxy.append(c * cur % R_MOD)
        cur = cur * y % R_MOD

    sx = SxEval(y, n)
    driver(sx, circuit)
    s_neg, s_pos = sx.poly()  # X^-1..X^-n ; X^1..X^2n

    # r'(X, y) = r(X, y) + s(X, y) over X^{-2n-nb}..X^{2n}
    rxy_prime = rxy + [0] * n
    for i, v in enumerate(reversed(s_neg)):  # X^{-n}..X^{-1}
        j = nb + n + i
        rxy_prime[j] = (rxy_prime[j] + v) % R_MOD
    for i, v in enumerate(s_pos):  # X^1..X^2n
        j = 2 * n + 1 + nb + i
        rxy_prime[j] = (rxy_prime[j] + v) % R_MOD

    # t(X, y) = r(X, 1) * r'(X, y) over X^{-4n-2nb}..X^{3n}
    txy = multiply_polynomials(rx1, rxy_prime)
    txy[4 * n + 2 * nb] = 0  # -k(y): X^0 must vanish for honest witnesses

    t = polynomial_commitment(
        srs.d,
        4 * n + 2 * nb,
        3 * n,
        srs,
        txy[: 4 * n + 2 * nb] + txy[4 * n + 2 * nb + 1 :],
    )
    transcript.commit_point(t)
    z = transcript.get_challenge_scalar()
    z_inv = pow(z, -1, R_MOD)

    first = pow(z_inv, 2 * n + nb, R_MOD)
    rz = evaluate_at_consecutive_powers(rx1, first, z)
    rzy = evaluate_at_consecutive_powers(rxy, first, z)

    transcript.commit_scalar(rz)
    transcript.commit_scalar(rzy)
    r1 = transcript.get_challenge_scalar()

    # opening of r(X, 1) - r(z, y) at y*z
    rx1[2 * n + nb] = (rx1[2 * n + nb] - rzy) % R_MOD
    zy_opening = polynomial_commitment_opening(2 * n + nb, n, rx1, y * z % R_MOD, srs)
    rx1[2 * n + nb] = (rx1[2 * n + nb] + rzy) % R_MOD

    # opening of t(X, y) + r1*r(X, 1) at z
    for i, v in enumerate(rx1):
        j = 2 * n + nb + i
        txy[j] = (txy[j] + r1 * v) % R_MOD
    first = pow(z_inv, 4 * n + 2 * nb, R_MOD)
    val = evaluate_at_consecutive_powers(txy, first, z)
    txy[4 * n + 2 * nb] = (txy[4 * n + 2 * nb] - val) % R_MOD
    z_opening = polynomial_commitment_opening(4 * n + 2 * nb, 3 * n, txy, z, srs)

    return Proof(r=r, t=t, rz=rz, rzy=rzy, z_opening=z_opening, zy_opening=zy_opening)
