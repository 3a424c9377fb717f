"""SONIC helper aggregation: one Aggregate covers many (proof, advice)
pairs so verifiers can amortize the S-polynomial work.

Mirrors /root/reference/bellman/src/sonic/helped/helper.rs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..refimpl import curve as rc
from ..refimpl.field import R_MOD
from . import SRS, Transcript, polynomial_commitment_opening
from .helped import Parameters, Proof, SxyAdvice
from .poly import SxEval, SyEval, evaluate_at_consecutive_powers
from .synthesis import CountNandQ, basic_synthesize


@dataclass
class Aggregate:
    """helper.rs:19-32."""

    c: rc.Point  # commitment to s(z, Y)
    s_opening: rc.Point  # RLC opening of all S commitments at z
    c_openings: list[tuple[rc.Point, int]]  # C opened at each constituent y
    opening: rc.Point  # C opened at w
    z: int
    w: int


def _compute_value(y: int, poly_positive, poly_negative) -> int:
    y_inv = pow(y, -1, R_MOD)
    return (
        evaluate_at_consecutive_powers(poly_positive, y, y)
        + evaluate_at_consecutive_powers(poly_negative, y_inv, y_inv)
    ) % R_MOD


def _open_at(s_neg, s_pos, n: int, point: int, value: int, srs: SRS) -> rc.Point:
    """opening of (poly - value) at point; Laurent layout X^{-n}..X^{len(pos)}."""
    coeffs = list(reversed(s_neg)) + [(-value) % R_MOD] + list(s_pos)
    return polynomial_commitment_opening(n, 0, coeffs, point, srs)


def create_aggregate(circuit, inputs: list[tuple[Proof, SxyAdvice]],
                     params: Parameters, driver=basic_synthesize) -> Aggregate:
    return create_aggregate_on_srs_using_information(
        circuit, inputs, params.srs, params.vk.n, params.vk.q, driver
    )


def create_aggregate_on_srs(circuit, inputs, srs: SRS,
                            driver=basic_synthesize) -> Aggregate:
    counter = CountNandQ()
    driver(counter, circuit)
    return create_aggregate_on_srs_using_information(
        circuit, inputs, srs, counter.n, counter.q, driver
    )


def create_aggregate_on_srs_using_information(
    circuit, inputs: list[tuple[Proof, SxyAdvice]], srs: SRS, n: int, q: int,
    driver=basic_synthesize,
) -> Aggregate:
    """helper.rs:64-219."""
    from . import _msm

    transcript = Transcript(b"")
    y_values = []
    for proof, advice in inputs:
        t = Transcript(b"")
        t.commit_point(proof.r)
        y_values.append(t.get_challenge_scalar())
        transcript.commit_point(advice.s)

    z = transcript.get_challenge_scalar()

    # s(z, Y)
    sy = SyEval(z, n, q)
    driver(sy, circuit)
    s_neg, s_pos = sy.poly()  # Y^-1..Y^-n ; Y^1..Y^{n+q}

    # C = commitment to s(z, x) under the alpha basis
    basis = srs.g_positive_x_alpha[: n + q] + srs.g_negative_x_alpha[:n]
    c = _msm(basis, s_pos + s_neg)
    transcript.commit_point(c)

    # open C at w
    w = transcript.get_challenge_scalar()
    value = _compute_value(w, s_pos, s_neg)
    opening = _open_at(s_neg, s_pos, n, w, value, srs)

    # open C at every constituent y
    c_openings = []
    for y in y_values:
        v = _compute_value(y, s_pos, s_neg)
        c_openings.append((_open_at(s_neg, s_pos, n, y, v, srs), v))

    # open every S at the shared z via a random linear combination
    poly_negative = [0] * n
    poly_positive = [0] * (2 * n)
    expected_value = 0
    for y, (_, c_value) in zip(y_values, c_openings):
        sx = SxEval(y, n)
        driver(sx, circuit)
        sx_neg, sx_pos = sx.poly()
        r = transcript.get_challenge_scalar()
        expected_value = (expected_value + c_value * r) % R_MOD
        for i, v in enumerate(sx_neg):
            poly_negative[i] = (poly_negative[i] + v * r) % R_MOD
        for i, v in enumerate(sx_pos):
            poly_positive[i] = (poly_positive[i] + v * r) % R_MOD

    s_opening = _open_at(poly_negative, poly_positive, n, z, expected_value, srs)

    return Aggregate(
        c=c, s_opening=s_opening, c_openings=c_openings, opening=opening, z=z, w=w
    )
