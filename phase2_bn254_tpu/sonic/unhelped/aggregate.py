"""Succinct aggregate: the helped aggregate plus an S2 proof and a
signature of correct computation for s1, removing the trusted helper.

Mirrors /root/reference/bellman/src/sonic/unhelped/aggregate.rs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...refimpl import curve as rc
from ...refimpl.field import R_MOD
from .. import SRS, Transcript, _msm, polynomial_commitment_opening
from ..helped import Proof, SxyAdvice
from ..poly import SxEval, SyEval
from ..synthesis import CountNandQ, basic_synthesize
from .permutation import PermutationArgument, SignatureOfCorrectComputation
from .permutation_structure import create_permutation_structure
from .s2 import S2Eval, S2Proof


@dataclass
class SuccinctAggregate:
    """aggregate.rs:25-39."""

    signature: SignatureOfCorrectComputation
    s2_proof: S2Proof
    c: rc.Point
    s_opening: rc.Point
    c_openings: list[tuple[rc.Point, int]]
    opening: rc.Point
    z: int
    w: int


def _compute_value(y: int, poly_positive, poly_negative) -> int:
    from ..poly import evaluate_at_consecutive_powers

    y_inv = pow(y, -1, R_MOD)
    return (
        evaluate_at_consecutive_powers(poly_positive, y, y)
        + evaluate_at_consecutive_powers(poly_negative, y_inv, y_inv)
    ) % R_MOD


def _open_at(s_neg, s_pos, n: int, point: int, value: int, srs: SRS) -> rc.Point:
    coeffs = list(reversed(s_neg)) + [(-value) % R_MOD] + list(s_pos)
    return polynomial_commitment_opening(n, 0, coeffs, point, srs)


def create_aggregate(circuit, inputs: list[tuple[Proof, SxyAdvice]], srs: SRS,
                     specialized_srs=None, driver=basic_synthesize) -> SuccinctAggregate:
    """aggregate.rs:54-71 (create_aggregate_on_srs)."""
    counter = CountNandQ()
    driver(counter, circuit)
    return create_aggregate_using_information(
        circuit, inputs, srs, counter.n, counter.q, driver
    )


create_aggregate_on_srs = create_aggregate


def create_aggregate_using_information(circuit, inputs, srs: SRS, n: int,
                                       q: int, driver=basic_synthesize) -> SuccinctAggregate:
    """aggregate.rs:73-268."""
    transcript = Transcript(b"")
    y_values = []
    for proof, advice in inputs:
        t = Transcript(b"")
        t.commit_point(proof.r)
        y_values.append(t.get_challenge_scalar())
        transcript.commit_point(advice.s)

    z = transcript.get_challenge_scalar()

    sy = SyEval(z, n, q)
    driver(sy, circuit)
    s_neg, s_pos = sy.poly()

    basis = srs.g_positive_x_alpha[: n + q] + srs.g_negative_x_alpha[:n]
    c = _msm(basis, s_pos + s_neg)
    transcript.commit_point(c)

    w = transcript.get_challenge_scalar()
    value = _compute_value(w, s_pos, s_neg)
    opening = _open_at(s_neg, s_pos, n, w, value, srs)

    # succinct parts: S2 at (z, w) + the s1 signature of correct computation
    s2_proof = S2Eval(n).evaluate(z, w, srs)
    structure = create_permutation_structure(circuit)
    coeffs, perms = structure.create_permutation_vectors()
    signature = PermutationArgument.make_signature(coeffs, perms, w, z, srs)

    # open C at every constituent y
    c_openings = []
    for y in y_values:
        v = _compute_value(y, s_pos, s_neg)
        c_openings.append((_open_at(s_neg, s_pos, n, y, v, srs), v))

    # open every S at z via a random linear combination
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

    return SuccinctAggregate(
        signature=signature,
        s2_proof=s2_proof,
        c=c,
        s_opening=s_opening,
        c_openings=c_openings,
        opening=opening,
        z=z,
        w=w,
    )
