"""Permutation argument: a commitment to S is a commitment to values
s_i = coeff[sigma(i)] * y^{sigma(i)} for a fixed permutation sigma.

Reduces to grand products of shifted combinations (beta*index + gamma
blinding makes position information binding). Mirrors
/root/reference/bellman/src/sonic/unhelped/permutation_argument.rs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...refimpl import curve as rc
from ...refimpl.field import R_MOD
from ...refimpl.pairing import FQ12_ONE, fq12_mul, pairing
from .. import SRS, Transcript, _msm, polynomial_commitment_opening
from ..poly import evaluate_at_consecutive_powers
from . import mul_add_polynomials, scaled
from .grand_product import GrandProductArgument, GrandProductSignature
from .wellformed import WellformednessArgument


@dataclass
class SpecializedSRS:
    """permutation_argument.rs:16-23: P1 = commit(1..1), P2_j = commit(c_j),
    P3 = commit(1, 2, .., n), P4_j = commit(sigma_j)."""

    p_1: rc.Point
    p_2: list[rc.Point]
    p_3: rc.Point
    p_4: list[rc.Point]
    n: int


@dataclass
class PermutationProof:
    """permutation_argument.rs:35-40: s' opening at (z', yz')."""

    v_zy: int
    e_opening: rc.Point
    f_opening: rc.Point


@dataclass
class PermutationArgumentProof:
    """permutation_argument.rs:42-47."""

    j: int
    s_opening: rc.Point
    s_zy: int


@dataclass
class SignatureOfCorrectComputation:
    """permutation_argument.rs:49-56."""

    s_commitments: list[rc.Point]
    s_prime_commitments: list[rc.Point]
    perm_argument_proof: PermutationArgumentProof
    perm_proof: PermutationProof
    grand_product_signature: GrandProductSignature


def permute_inverse(permuted_coeffs: list[int], permutation: list[int]) -> list[int]:
    """result[i] = permuted_coeffs[sigma(i) - 1] (permutation_argument.rs:73-85)."""
    return [permuted_coeffs[j - 1] for j in permutation]


class PermutationArgument:
    """permutation_argument.rs:87-775."""

    def __init__(self, coefficients: list[list[int]], permutations: list[list[int]]):
        assert coefficients and len(coefficients) == len(permutations)
        n = len(coefficients[0])
        assert all(len(c) == len(p) == n for c, p in zip(coefficients, permutations))
        self.non_permuted_coefficients = coefficients
        self.non_permuted_at_y_coefficients: list[list[int]] = []
        self.inverse_permuted_at_y_coefficients: list[list[int]] = []
        self.permutations = permutations
        self.n = n

    @staticmethod
    def make_specialized_srs(non_permuted_coefficients, permutations,
                             srs: SRS) -> SpecializedSRS:
        """permutation_argument.rs:110-166."""
        n = len(non_permuted_coefficients[0])
        basis = srs.g_positive_x_alpha[:n]
        return SpecializedSRS(
            p_1=_msm(basis, [1] * n),
            p_2=[_msm(basis, c) for c in non_permuted_coefficients],
            p_3=_msm(basis, list(range(1, n + 1))),
            p_4=[_msm(basis, list(p)) for p in permutations],
            n=n,
        )

    def commit(self, y: int, srs: SRS) -> list[tuple[rc.Point, rc.Point]]:
        """permutation_argument.rs:168-225: commitments (S_j, S'_j) at y."""
        assert not self.inverse_permuted_at_y_coefficients
        n = self.n
        basis = srs.g_positive_x_alpha[:n]
        result = []
        for c, p in zip(self.non_permuted_coefficients, self.permutations):
            non_permuted_at_y, cur = [], y
            for coeff in c:
                non_permuted_at_y.append(coeff * cur % R_MOD)
                cur = cur * y % R_MOD
            s_prime = _msm(basis, non_permuted_at_y)
            inverse_permuted_at_y = permute_inverse(non_permuted_at_y, p)
            s = _msm(basis, inverse_permuted_at_y)
            result.append((s, s_prime))
            self.non_permuted_at_y_coefficients.append(non_permuted_at_y)
            self.inverse_permuted_at_y_coefficients.append(inverse_permuted_at_y)
        return result

    def open_commitments_to_s_prime(self, challenges, y: int, z_prime: int,
                                    srs: SRS) -> PermutationProof:
        """permutation_argument.rs:227-283: one RLC opening of the
        non-permuted polynomials at yz' (F) and of their y-scaled form at
        z' (E); both evaluate to the same v."""
        n = self.n
        yz = y * z_prime % R_MOD
        polynomial = scaled(self.non_permuted_coefficients[0], challenges[0])
        for p, r in zip(self.non_permuted_coefficients[1:], challenges[1:]):
            mul_add_polynomials(polynomial, p, r)
        v = evaluate_at_consecutive_powers(polynomial, yz, yz)
        coeffs = [(-v) % R_MOD] + polynomial
        f = polynomial_commitment_opening(0, n, coeffs, yz, srs)
        at_y, cur = [], y
        for coeff in polynomial:
            at_y.append(coeff * cur % R_MOD)
            cur = cur * y % R_MOD
        e = polynomial_commitment_opening(
            0, n, [(-v) % R_MOD] + at_y, z_prime, srs
        )
        return PermutationProof(v_zy=v, e_opening=e, f_opening=f)

    # -- argument construction ----------------------------------------------

    def _s_opening(self, z: int, srs: SRS) -> tuple[rc.Point, int]:
        s_polynomial = [0] * self.n
        for c in self.inverse_permuted_at_y_coefficients:
            for i, v in enumerate(c):
                s_polynomial[i] = (s_polynomial[i] + v) % R_MOD
        s_zy = evaluate_at_consecutive_powers(s_polynomial, z, z)
        opening = polynomial_commitment_opening(
            0, self.n, [(-s_zy) % R_MOD] + s_polynomial, z, srs
        )
        return opening, s_zy

    def _grand_products(self, betas, gammas):
        """S_j + beta*P4_j + gamma*P1 vs S'_j + beta*P3 + gamma*P1
        (permutation_argument.rs:703-756)."""
        n = self.n
        p_1_values = [1] * n
        p_3_values = list(range(1, n + 1))
        grand_products = []
        for non_permuted, inv_permuted, permutation, beta, gamma in zip(
            self.non_permuted_at_y_coefficients,
            self.inverse_permuted_at_y_coefficients,
            self.permutations,
            betas,
            gammas,
        ):
            s_combination = list(inv_permuted)
            mul_add_polynomials(s_combination, list(permutation), beta)
            mul_add_polynomials(s_combination, p_1_values, gamma)
            s_prime_combination = list(non_permuted)
            mul_add_polynomials(s_prime_combination, p_3_values, beta)
            mul_add_polynomials(s_prime_combination, p_1_values, gamma)
            s_product = 1
            for a in s_combination:
                s_product = s_product * a % R_MOD
            s_prime_product = 1
            for b in s_prime_combination:
                s_prime_product = s_prime_product * b % R_MOD
            assert s_product == s_prime_product, "products must be equal"
            assert s_product != 0, "grand products must not be zero"
            grand_products.append((s_combination, s_prime_combination))
        return grand_products

    def make_argument(self, beta, gamma, grand_product_challenges,
                      wellformed_challenges, y, z, specialized_srs,
                      srs: SRS) -> PermutationArgumentProof:
        """permutation_argument.rs:286-460 (single shared beta/gamma; the
        in-construction sanity checks on the sub-arguments included)."""
        j = len(self.non_permuted_coefficients)
        s_zy_opening, s_zy = self._s_opening(z, srs)
        grand_products = self._grand_products([beta] * j, [gamma] * j)

        a_commitments, b_commitments = [], []
        for a, b in grand_products:
            c_a, c_b = GrandProductArgument.commit_for_individual_products(a, b, srs)
            a_commitments.append(c_a)
            b_commitments.append(c_b)

        wf = WellformednessArgument([p for pair in grand_products for p in pair])
        wf_commitments = wf.commit(srs)
        wf_proof = wf.make_argument(list(wellformed_challenges), srs)
        assert WellformednessArgument.verify(
            self.n, wellformed_challenges, wf_commitments, wf_proof, srs
        ), "wellformedness argument must be valid"

        gp = GrandProductArgument(grand_products)
        c_commitments = gp.commit_to_individual_c_polynomials(srs)
        t_commitment = gp.commit_to_t_polynomial(grand_product_challenges, y, srs)
        openings = gp.open_commitments_for_grand_product(y, z, srs)
        a_zy = [v for v, _ in openings]
        proof = gp.make_argument(a_zy, grand_product_challenges, y, z, srs)

        import secrets

        randomness = [secrets.randbelow(R_MOD - 1) + 1 for _ in range(j)]
        assert GrandProductArgument.verify_ab_commitment(
            self.n, randomness, a_commitments, b_commitments, openings, y, z, srs
        ), "ab part of grand product argument must be valid"
        randomness = [secrets.randbelow(R_MOD - 1) + 1 for _ in range(3)]
        assert GrandProductArgument.verify(
            self.n, randomness, a_zy, grand_product_challenges, t_commitment,
            c_commitments, proof, y, z, srs,
        ), "grand product argument must be valid"

        return PermutationArgumentProof(j=j, s_opening=s_zy_opening, s_zy=s_zy)

    def make_argument_with_transcript(self, transcript: Transcript, y, z,
                                      srs: SRS):
        """permutation_argument.rs:645-775: per-permutation beta/gamma from
        the transcript + grand product signature."""
        betas, gammas = [], []
        for _ in self.permutations:
            betas.append(transcript.get_challenge_scalar())
            gammas.append(transcript.get_challenge_scalar())
        j = len(self.non_permuted_coefficients)
        s_zy_opening, s_zy = self._s_opening(z, srs)
        grand_products = self._grand_products(betas, gammas)
        gp_signature = GrandProductArgument.create_signature(
            transcript, grand_products, y, z, srs
        )
        proof = PermutationArgumentProof(j=j, s_opening=s_zy_opening, s_zy=s_zy)
        return proof, gp_signature

    @classmethod
    def make_signature(cls, coefficients, permutations, y, z,
                       srs: SRS) -> SignatureOfCorrectComputation:
        """permutation_argument.rs:590-643."""
        argument = cls(coefficients, permutations)
        commitments = argument.commit(y, srs)
        transcript = Transcript(b"")
        s_commitments, s_prime_commitments = [], []
        for s, s_prime in commitments:
            transcript.commit_point(s)
            transcript.commit_point(s_prime)
            s_commitments.append(s)
            s_prime_commitments.append(s_prime)
        challenges = [transcript.get_challenge_scalar() for _ in s_commitments]
        z_prime = transcript.get_challenge_scalar()
        perm_proof = argument.open_commitments_to_s_prime(challenges, y, z_prime, srs)
        proof, gp_signature = argument.make_argument_with_transcript(
            transcript, y, z, srs
        )
        return SignatureOfCorrectComputation(
            s_commitments=s_commitments,
            s_prime_commitments=s_prime_commitments,
            perm_argument_proof=proof,
            perm_proof=perm_proof,
            grand_product_signature=gp_signature,
        )

    # -- verification --------------------------------------------------------

    @staticmethod
    def verify_s_prime_commitment(n, randomness, challenges, commitments,
                                  proof: PermutationProof, y, z_prime,
                                  specialized_srs: SpecializedSRS,
                                  srs: SRS) -> bool:
        """permutation_argument.rs:463-536:
        e(E, h^{alpha x}) e(E^{-z'} g^v, h^alpha) = e(sum S'_j r_j, h) and
        e(F, h^{alpha x}) e(F^{-yz'} g^v, h^alpha) = e(sum P2_j r_j, h)."""
        assert len(randomness) == 2
        value = sum(randomness) % R_MOD * proof.v_zy % R_MOD
        e_z = proof.e_opening.mul((-z_prime) % R_MOD)
        f_yz = proof.f_opening.mul((-(y * z_prime)) % R_MOD)
        h_alpha_term = _msm([e_z, f_yz], randomness).add(rc.G1_GEN.mul(value))
        h_alpha_x_term = _msm([proof.e_opening, proof.f_opening], randomness)
        s_r = _msm(commitments, challenges)
        p2_r = _msm(specialized_srs.p_2, challenges)
        h_term = _msm([s_r, p2_r], randomness)
        acc = FQ12_ONE
        for g1, g2 in (
            (h_alpha_x_term, srs.h_positive_x_alpha[1]),
            (h_alpha_term, srs.h_positive_x_alpha[0]),
            (h_term, srs.h_positive_x[0].neg()),
        ):
            if not g1.is_zero():
                acc = fq12_mul(acc, pairing(g1, g2))
        return acc == FQ12_ONE

    @staticmethod
    def verify(s_commitments, proof: PermutationArgumentProof, z,
               srs: SRS) -> bool:
        """permutation_argument.rs:539-587: opening of sum S_j at z."""
        h_alpha_term = proof.s_opening.mul((-z) % R_MOD).add(
            rc.G1_GEN.mul(proof.s_zy)
        )
        s = rc.point_zero("g1")
        for p in s_commitments:
            s = s.add(p)
        acc = FQ12_ONE
        for g1, g2 in (
            (proof.s_opening, srs.h_positive_x_alpha[1]),
            (h_alpha_term, srs.h_positive_x_alpha[0]),
            (s, srs.h_positive_x[0].neg()),
        ):
            if not g1.is_zero():
                acc = fq12_mul(acc, pairing(g1, g2))
        return acc == FQ12_ONE
