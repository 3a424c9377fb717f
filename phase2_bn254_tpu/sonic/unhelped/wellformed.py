"""Wellformedness argument: a commitment opens to a polynomial with only
powers X^1..X^n (no constant or negative terms).

The prover exhibits L = commit(p / x^d) and R = commit(p * x^{d-n}) in the
non-alpha basis; both exist in the SRS only if p stays within [1, n].
Mirrors /root/reference/bellman/src/sonic/unhelped/wellformed_argument.rs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...refimpl import curve as rc
from ...refimpl.field import R_MOD
from ...refimpl.pairing import FQ12_ONE, fq12_mul, pairing
from .. import SRS, _msm
from . import mul_add_polynomials, scaled


@dataclass
class WellformednessProof:
    """wellformed_argument.rs:18-22."""

    l: rc.Point
    r: rc.Point


@dataclass
class WellformednessSignature:
    proof: WellformednessProof


class WellformednessArgument:
    """wellformed_argument.rs:28-160."""

    def __init__(self, polynomials: list[list[int]]):
        assert polynomials
        length = len(polynomials[0])
        assert all(len(p) == length for p in polynomials)
        self.polynomials = polynomials

    @classmethod
    def create_signature(cls, all_polys, challenges, srs: SRS) -> WellformednessSignature:
        return WellformednessSignature(cls(all_polys).make_argument(challenges, srs))

    def commit(self, srs: SRS) -> list[rc.Point]:
        n = len(self.polynomials[0])
        return [_msm(srs.g_positive_x_alpha[:n], p) for p in self.polynomials]

    def make_argument(self, challenges: list[int], srs: SRS) -> WellformednessProof:
        assert len(challenges) == len(self.polynomials)
        p0 = scaled(self.polynomials[0], challenges[0])
        for p, r in zip(self.polynomials[1:], challenges[1:]):
            mul_add_polynomials(p0, p, r)
        n, d = len(p0), srs.d
        assert n < d
        # L: multiplier x^-d -> powers -(d-1) .. -(d-n)
        l = _msm(list(reversed(srs.g_negative_x[d - n : d])), p0)
        # R: multiplier x^{d-n} -> powers d-n+1 .. d
        r = _msm(srs.g_positive_x[d - n + 1 : d + 1], p0)
        return WellformednessProof(l, r)

    @staticmethod
    def verify(n: int, challenges, commitments, proof: WellformednessProof,
               srs: SRS) -> bool:
        """wellformed_argument.rs:118-160: e(A, -h) e(L, h^{alpha x^d}) = 1
        and e(A, -h) e(R, h^{alpha x^{n-d}}) = 1."""
        d = srs.d
        assert n < d
        alpha_x_d = srs.h_positive_x_alpha[d]
        alpha_x_n_minus_d = srs.h_negative_x_alpha[d - n]
        neg_h = srs.h_positive_x[0].neg()
        a = _msm(commitments, challenges)
        for g1, g2 in ((proof.l, alpha_x_d), (proof.r, alpha_x_n_minus_d)):
            acc = pairing(a, neg_h) if not a.is_zero() else FQ12_ONE
            if not g1.is_zero():
                acc = fq12_mul(acc, pairing(g1, g2))
            if acc != FQ12_ONE:
                return False
        return True
