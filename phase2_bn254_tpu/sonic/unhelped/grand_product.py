"""Grand-product argument: two committed polynomials of degree n have equal
coefficient products (assuming non-zero coefficients).

Encodes both vectors into a = [a_1..a_n, 0, b_1..b_n] and the running
product c (c_{n+1} = 1, c_{2n+1} = prod b = prod a), then proves the SONIC
t-polynomial identity for a custom S(X, Y). Mirrors
/root/reference/bellman/src/sonic/unhelped/grand_product_argument.rs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...refimpl import curve as rc
from ...refimpl.field import R_MOD
from ...refimpl.pairing import FQ12_ONE, fq12_mul, pairing
from .. import (
    SRS,
    Transcript,
    _msm,
    multiply_polynomials,
    polynomial_commitment_opening,
)
from ..poly import evaluate_at_consecutive_powers
from . import mul_add_polynomials, scaled
from .wellformed import WellformednessArgument, WellformednessSignature


@dataclass
class GrandProductProof:
    """grand_product_argument.rs:23-30."""

    t_opening: rc.Point
    e_zinv: int
    e_opening: rc.Point
    f_y: int
    f_opening: rc.Point


@dataclass
class GrandProductSignature:
    """grand_product_argument.rs:32-39."""

    c_commitments: list[tuple[rc.Point, int]]
    t_commitment: rc.Point
    grand_product_openings: list[tuple[int, rc.Point]]
    proof: GrandProductProof
    wellformedness_signature: WellformednessSignature


def _c_zy(n: int, a: int, v: int, y: int, z: int) -> int:
    """c_j = ((a_j + v_j (yz)^{n+1}) y + z^{n+2} + z^{n+1} y - z^{2n+2} y)
    z^{-1} (grand_product_argument.rs:416-443)."""
    yz = y * z % R_MOD
    c = (a + v * pow(yz, n + 1, R_MOD)) * y
    zn1 = pow(z, n + 1, R_MOD)
    c += zn1 * z + zn1 * y - zn1 * zn1 % R_MOD * y
    return c % R_MOD * pow(z, -1, R_MOD) % R_MOD


class GrandProductArgument:
    """grand_product_argument.rs:41-372."""

    def __init__(self, polynomials: list[tuple[list[int], list[int]]]):
        assert polynomials
        n = len(polynomials[0][0])
        self.n = n
        self.a_polynomials = []
        self.c_polynomials = []
        self.v_elements = []
        self.t_polynomial = None
        for p0, p1 in polynomials:
            assert len(p0) == len(p1) == n
            c_poly, coeff = [], 1
            for a in p0:
                coeff = coeff * a % R_MOD
                c_poly.append(coeff)
            v = pow(coeff, -1, R_MOD)
            # a_{n+1} is stored as zero; the v*(XY)^{n+1} term is added
            # manually when building T (see commit_to_t_polynomial)
            a_poly = list(p0) + [0] + list(p1)
            coeff = 1
            c_poly.append(coeff)
            for b in p1:
                coeff = coeff * b % R_MOD
                c_poly.append(coeff)
            assert c_poly[n - 1] == c_poly[2 * n], "products must be equal"
            self.a_polynomials.append(a_poly)
            self.c_polynomials.append(c_poly)
            self.v_elements.append(v)

    @classmethod
    def create_signature(cls, transcript: Transcript, grand_products, y: int,
                         z: int, srs: SRS) -> GrandProductSignature:
        """grand_product_argument.rs:42-92."""
        gp_challenges = [transcript.get_challenge_scalar() for _ in grand_products]
        wf_challenges = [
            transcript.get_challenge_scalar() for _ in range(2 * len(grand_products))
        ]
        all_polys = [p for pair in grand_products for p in pair]
        wf_signature = WellformednessArgument.create_signature(
            all_polys, wf_challenges, srs
        )
        arg = cls(grand_products)
        c_commitments = arg.commit_to_individual_c_polynomials(srs)
        t_commitment = arg.commit_to_t_polynomial(gp_challenges, y, srs)
        openings = arg.open_commitments_for_grand_product(y, z, srs)
        a_zy = [v for v, _ in openings]
        proof = arg.make_argument(a_zy, gp_challenges, y, z, srs)
        return GrandProductSignature(
            c_commitments=c_commitments,
            t_commitment=t_commitment,
            grand_product_openings=openings,
            proof=proof,
            wellformedness_signature=wf_signature,
        )

    @staticmethod
    def commit_for_individual_products(a, b, srs: SRS) -> tuple[rc.Point, rc.Point]:
        n = len(a)
        assert len(b) == n
        return (
            _msm(srs.g_positive_x_alpha[:n], a),
            _msm(srs.g_positive_x_alpha[:n], b),
        )

    def open_commitments_for_grand_product(self, y: int, z: int, srs: SRS):
        """grand_product_argument.rs:206-256: open each a-encoding at yz."""
        yz = y * z % R_MOD
        results = []
        for a_poly in self.a_polynomials:
            assert a_poly[self.n] == 0
            val = evaluate_at_consecutive_powers(a_poly, yz, yz)
            coeffs = [(-val) % R_MOD] + a_poly
            opening = polynomial_commitment_opening(0, 2 * self.n + 1, coeffs, yz, srs)
            results.append((val, opening))
        return results

    def commit_to_individual_c_polynomials(self, srs: SRS):
        """grand_product_argument.rs:259-278."""
        m = len(self.c_polynomials[0])
        return [
            (_msm(srs.g_positive_x_alpha[:m], p), v)
            for p, v in zip(self.c_polynomials, self.v_elements)
        ]

    def commit_to_t_polynomial(self, challenges, y: int, srs: SRS) -> rc.Point:
        """grand_product_argument.rs:281-371: T = r(X, y) * r'(X) - val,
        where r embeds the extra v*(XY)^{n+1}*Y + X^{n+2} + X^{n+1}Y -
        X^{2n+2}Y terms and r' is the reversed c polynomial."""
        assert len(challenges) == len(self.a_polynomials)
        n = self.n
        t_polynomial = None
        for a, c, v, challenge in zip(
            self.a_polynomials, self.c_polynomials, self.v_elements, challenges
        ):
            # p_a(X, y) * y: coefficient of X^i gets y^{i+1}
            a_xy, cur = [], y * y % R_MOD
            for coeff in a:
                a_xy.append(coeff * cur % R_MOD)
                cur = cur * y % R_MOD
            # inject the extra terms
            a_xy[n] = (a_xy[n] + v * pow(y, n + 2, R_MOD) + y) % R_MOD
            a_xy[n + 1] = (a_xy[n + 1] + 1) % R_MOD
            a_xy.append((-y) % R_MOD)  # X^{2n+2}
            r = [0] * (2 * n + 3) + a_xy
            r_prime = list(reversed(c)) + [1, 0]
            t = multiply_polynomials(r, r_prime)
            assert all(v == 0 for v in t[: 2 * n + 3])
            assert t[-1] == 0
            t = t[2 * n + 3 : -1]  # powers X^{-2n-1} .. X^{2n+1}
            # subtract the constant term (the expected value at X^0)
            val = (
                evaluate_at_consecutive_powers(c, y * y % R_MOD, y) + 1
            ) % R_MOD
            assert t[2 * n + 1] == val
            t[2 * n + 1] = 0
            if t_polynomial is None:
                t_polynomial = scaled(t, challenge)
            else:
                mul_add_polynomials(t_polynomial, t, challenge)
        basis = list(reversed(srs.g_negative_x_alpha[: 2 * n + 1])) + list(
            srs.g_positive_x_alpha[: 2 * n + 1]
        )
        coeffs = t_polynomial[: 2 * n + 1] + t_polynomial[2 * n + 2 :]
        self.t_polynomial = t_polynomial
        return _msm(basis, coeffs)

    def make_argument(self, a_zy, challenges, y: int, z: int, srs: SRS):
        """grand_product_argument.rs:374-533."""
        n = self.n
        z_inv = pow(z, -1, R_MOD)
        e_polynomial = None
        f_polynomial = None
        t_subcomponent = 0
        for a, c, challenge, v in zip(
            a_zy, self.c_polynomials, challenges, self.v_elements
        ):
            rc_ = _c_zy(n, a, v, y, z) * challenge % R_MOD
            ry = y * challenge % R_MOD
            t_subcomponent = (t_subcomponent + rc_ - challenge) % R_MOD
            if e_polynomial is None:
                e_polynomial = scaled(c, rc_)
                f_polynomial = scaled(c, ry)
            else:
                mul_add_polynomials(e_polynomial, c, rc_)
                mul_add_polynomials(f_polynomial, c, ry)

        e_val = evaluate_at_consecutive_powers(e_polynomial, z_inv, z_inv)
        f_val = evaluate_at_consecutive_powers(f_polynomial, y, y)
        e_opening = polynomial_commitment_opening(
            0, 2 * n + 1, [(-e_val) % R_MOD] + e_polynomial, z_inv, srs
        )
        f_opening = polynomial_commitment_opening(
            0, 2 * n + 1, [(-f_val) % R_MOD] + f_polynomial, y, srs
        )

        t_subcomponent = (t_subcomponent + e_val - f_val) % R_MOD
        t_poly = self.t_polynomial
        assert t_poly[2 * n + 1] == 0
        t_zy = evaluate_at_consecutive_powers(
            t_poly, pow(z_inv, 2 * n + 1, R_MOD), z
        )
        assert t_zy == t_subcomponent
        t_poly[2 * n + 1] = (t_poly[2 * n + 1] - t_zy) % R_MOD
        t_opening = polynomial_commitment_opening(2 * n + 1, 2 * n + 1, t_poly, z, srs)
        return GrandProductProof(
            t_opening=t_opening,
            e_zinv=e_val,
            e_opening=e_opening,
            f_y=f_val,
            f_opening=f_opening,
        )

    @staticmethod
    def verify_ab_commitment(n, randomness, a_commitments, b_commitments,
                             openings, y, z, srs: SRS) -> bool:
        """grand_product_argument.rs:535-613:
        e(D, h^{alpha x}) e(D^{-yz} g^{-a}, h^alpha) = e(A, h) e(B, h^{x^{n+1}})."""
        yz = y * z % R_MOD
        a = _msm(a_commitments, randomness)
        b = _msm(b_commitments, randomness)
        value = sum(v * r for (v, _), r in zip(openings, randomness)) % R_MOD
        opening = _msm([o for _, o in openings], randomness)
        pairs = [
            (opening, srs.h_positive_x_alpha[1]),
            (opening.mul((-yz) % R_MOD), srs.h_positive_x_alpha[0]),
            (a, srs.h_positive_x[0].neg()),
            (b, srs.h_positive_x[n + 1].neg()),
            (rc.G1_GEN.mul(value), srs.h_positive_x_alpha[0]),
        ]
        acc = FQ12_ONE
        for g1, g2 in pairs:
            if not g1.is_zero():
                acc = fq12_mul(acc, pairing(g1, g2))
        return acc == FQ12_ONE

    @staticmethod
    def verify(n, randomness, a_zy, challenges, t_commitment, commitments,
               proof: GrandProductProof, y, z, srs: SRS) -> bool:
        """grand_product_argument.rs:615-758: one 3-pairing batch over the
        e/f/t openings."""
        assert len(randomness) == 3
        z_inv = pow(z, -1, R_MOD)
        t_zy = (proof.e_zinv - proof.f_y) % R_MOD
        commitment_points = []
        rc_vec, ry_vec = [], []
        for r, (c, v), a in zip(challenges, commitments, a_zy):
            commitment_points.append(c)
            rc_ = _c_zy(n, a, v, y, z) * r % R_MOD
            rc_vec.append(rc_)
            ry_vec.append(y * r % R_MOD)
            t_zy = (t_zy + rc_ - r) % R_MOD

        c_rc = _msm(commitment_points, rc_vec)
        c_ry = _msm(commitment_points, ry_vec)
        g = rc.G1_GEN

        e_term = proof.e_opening.mul((-z_inv) % R_MOD).add(g.mul(proof.e_zinv))
        f_term = proof.f_opening.mul((-y) % R_MOD).add(g.mul(proof.f_y))
        t_term = proof.t_opening.mul((-z) % R_MOD).add(g.mul(t_zy))

        h_alpha = _msm([e_term, f_term, t_term], randomness)
        h_alpha_x = _msm(
            [proof.e_opening, proof.f_opening, proof.t_opening], randomness
        )
        h_term = _msm([c_rc, c_ry, t_commitment], randomness)

        acc = FQ12_ONE
        for g1, g2 in (
            (h_alpha_x, srs.h_positive_x_alpha[1]),
            (h_alpha, srs.h_positive_x_alpha[0]),
            (h_term, srs.h_positive_x[0].neg()),
        ):
            if not g1.is_zero():
                acc = fq12_mul(acc, pairing(g1, g2))
        return acc == FQ12_ONE
