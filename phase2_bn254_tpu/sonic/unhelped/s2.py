"""S2 proof: provable evaluation of s2(X, Y) = sum_{i=1..n} (Y^i + Y^{-i}) X^i.

The commitment O = g^{sum_i alpha x^i} is verifier-computable from the SRS;
the prover opens the all-ones polynomial at xy and x/y. Mirrors
/root/reference/bellman/src/sonic/unhelped/s2_proof.rs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...refimpl import curve as rc
from ...refimpl.field import R_MOD
from ...refimpl.pairing import FQ12_ONE, fq12_mul, pairing
from .. import SRS, polynomial_commitment_opening
from ..poly import evaluate_at_consecutive_powers


@dataclass
class S2Proof:
    """s2_proof.rs:14-21."""

    o: rc.Point
    c_value: int
    d_value: int
    c_opening: rc.Point
    d_opening: rc.Point


class S2Eval:
    """s2_proof.rs:23-78."""

    def __init__(self, n: int):
        self.n = n

    @staticmethod
    def calculate_commitment_element(n: int, srs: SRS) -> rc.Point:
        acc = rc.point_zero("g1")
        for p in srs.g_positive_x_alpha[:n]:
            acc = acc.add(p)
        return acc

    def evaluate(self, x: int, y: int, srs: SRS) -> S2Proof:
        o = self.calculate_commitment_element(self.n, srs)
        ones = [1] * self.n

        def open_at(point):
            val = evaluate_at_consecutive_powers(ones, point, point)
            coeffs = [(-val) % R_MOD] + ones
            return val, polynomial_commitment_opening(0, self.n, coeffs, point, srs)

        c_value, c_opening = open_at(x * y % R_MOD)
        d_value, d_opening = open_at(x * pow(y, -1, R_MOD) % R_MOD)
        return S2Proof(o, c_value, d_value, c_opening, d_opening)

    @staticmethod
    def verify(x: int, y: int, proof: S2Proof, srs: SRS) -> bool:
        """s2_proof.rs:80-135: e(W, h^{alpha x}) e(g^v W^{-pt}, h^alpha)
        = e(O, h) for both openings."""
        alpha_x = srs.h_positive_x_alpha[1]
        alpha = srs.h_positive_x_alpha[0]
        neg_h = srs.h_positive_x[0].neg()

        for point, value, opening in (
            (x * y % R_MOD, proof.c_value, proof.c_opening),
            (x * pow(y, -1, R_MOD) % R_MOD, proof.d_value, proof.d_opening),
        ):
            h_alpha_term = opening.mul((-point) % R_MOD).add(
                rc.G1_GEN.mul(value % R_MOD)
            )
            acc = pairing(opening, alpha_x)
            if not h_alpha_term.is_zero():
                acc = fq12_mul(acc, pairing(h_alpha_term, alpha))
            acc = fq12_mul(acc, pairing(proof.o, neg_h))
            if acc != FQ12_ONE:
                return False
        return True
