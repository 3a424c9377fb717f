"""Succinct multi-verifier: checks proofs with a SuccinctAggregate, never
evaluating S(X, Y) itself - s(z, w) is reconstructed from the prover's S2
proof and the s1 signature of correct computation.

Mirrors /root/reference/bellman/src/sonic/unhelped/verifier.rs.
"""

from __future__ import annotations

import secrets

from ...refimpl import curve as rc
from ...refimpl.field import R_MOD
from ...refimpl.pairing import FQ12_ONE, fq12_mul, pairing
from .. import SRS, Transcript, _msm
from ..helped import Batch, Proof, SxyAdvice
from ..poly import SxEval
from ..synthesis import Preprocess, basic_synthesize
from .aggregate import SuccinctAggregate
from .grand_product import _c_zy
from .permutation_structure import create_permutation_structure


class SuccinctMultiVerifier:
    """verifier.rs:31-693."""

    def __init__(self, circuit, srs: SRS, driver=basic_synthesize, rng=None):
        pre = Preprocess()
        driver(pre, circuit)
        self.circuit = circuit
        self.driver = driver
        structure = create_permutation_structure(circuit)
        self.s2_special_reference = structure.calculate_s2_commitment_value(srs)
        self.s1_special_reference = structure.create_permutation_special_reference(srs)
        self.batch = Batch(srs=srs, n=pre.n)
        self.k_map = pre.k_map
        self.n = pre.n
        self.q = pre.q
        self.srs = srs
        self.rng = rng or (lambda: secrets.randbelow(R_MOD - 1) + 1)

    # -- aggregate ------------------------------------------------------------

    def add_aggregate(self, proofs: list[tuple[Proof, SxyAdvice]],
                      aggregate: SuccinctAggregate) -> None:
        """verifier.rs:72-563."""
        srs = self.srs
        transcript = Transcript(b"")
        y_values = []
        for proof, advice in proofs:
            t = Transcript(b"")
            t.commit_point(proof.r)
            y_values.append(t.get_challenge_scalar())
            transcript.commit_point(advice.s)

        z = transcript.get_challenge_scalar()
        transcript.commit_point(aggregate.c)
        w = transcript.get_challenge_scalar()

        szw = self._verify_signature_and_compute_szw(aggregate, z, w)

        random = self.rng()
        self.batch.add_opening(aggregate.opening, random, w)
        self.batch.add_commitment(aggregate.c, random)
        self.batch.add_opening_value(szw, random)

        for (opening, value), y in zip(aggregate.c_openings, y_values):
            random = self.rng()
            self.batch.add_opening(opening, random, y)
            self.batch.add_commitment(aggregate.c, random)
            self.batch.add_opening_value(value, random)

        random = self.rng()
        expected_value = 0
        for (_, advice), (_, c_value) in zip(proofs, aggregate.c_openings):
            r = transcript.get_challenge_scalar()
            expected_value = (expected_value + c_value * r) % R_MOD
            self.batch.add_commitment(advice.s, r * random % R_MOD)
        self.batch.add_opening_value(expected_value, random)
        self.batch.add_opening(aggregate.s_opening, random, z)

    def _verify_signature_and_compute_szw(self, aggregate: SuccinctAggregate,
                                          z: int, w: int) -> int:
        """verifier.rs:96-547: s(z, w) = z^{-(n+1)} w^n s1 - z^n s2, folding
        the S2 openings into the batch and hard-checking the signature of
        correct computation."""
        srs = self.srs
        n = self.n
        x_n = pow(z, n, R_MOD)
        x_n_plus_1_inv = pow(x_n * z % R_MOD, -1, R_MOD)
        y_n = pow(w, n, R_MOD)
        sig = aggregate.signature

        # s2 contribution: two openings of the all-ones commitment O
        s2_proof = aggregate.s2_proof
        s2_part = (s2_proof.c_value + s2_proof.d_value) % R_MOD * x_n % R_MOD
        random = self.rng()
        self.batch.add_opening(s2_proof.c_opening, random, z * w % R_MOD)
        self.batch.add_opening_value(random, s2_proof.c_value)
        self.batch.add_commitment(self.s2_special_reference, random)
        random = self.rng()
        self.batch.add_opening(
            s2_proof.d_opening, random, z * pow(w, -1, R_MOD) % R_MOD
        )
        self.batch.add_opening_value(random, s2_proof.d_value)
        self.batch.add_commitment(self.s2_special_reference, random)

        # s1 contribution
        szw = (
            sig.perm_argument_proof.s_zy * x_n_plus_1_inv % R_MOD * y_n - s2_part
        ) % R_MOD

        # replay the signature transcript
        transcript = Transcript(b"")
        for s, s_prime in zip(sig.s_commitments, sig.s_prime_commitments):
            transcript.commit_point(s)
            transcript.commit_point(s_prime)
        challenges = [transcript.get_challenge_scalar() for _ in sig.s_commitments]
        z_prime = transcript.get_challenge_scalar()

        # s' openings at z' and w*z'
        perm_proof = sig.perm_proof
        s_r = _msm(sig.s_prime_commitments, challenges)
        p2_r = _msm(self.s1_special_reference.p_2, challenges)
        random = self.rng()
        self.batch.add_opening(perm_proof.e_opening, random, z_prime)
        self.batch.add_opening_value(random, perm_proof.v_zy)
        self.batch.add_commitment(s_r, random)
        random = self.rng()
        self.batch.add_opening(perm_proof.f_opening, random, w * z_prime % R_MOD)
        self.batch.add_opening_value(random, perm_proof.v_zy)
        self.batch.add_commitment(p2_r, random)

        # opening of sum(S_j) at z
        s_commitment = rc.point_zero("g1")
        for s in sig.s_commitments:
            s_commitment = s_commitment.add(s)
        random = self.rng()
        self.batch.add_opening(sig.perm_argument_proof.s_opening, random, z)
        self.batch.add_opening_value(random, sig.perm_argument_proof.s_zy)
        self.batch.add_commitment(s_commitment, random)

        # grand product argument: reconstruct A_j/B_j commitments from the
        # specialized SRS and the betas/gammas of the signature transcript
        betas, gammas = [], []
        for _ in sig.s_commitments:
            betas.append(transcript.get_challenge_scalar())
            gammas.append(transcript.get_challenge_scalar())

        a_commitments, b_commitments, wf_commitments = [], [], []
        for j, (s, s_prime) in enumerate(
            zip(sig.s_commitments, sig.s_prime_commitments)
        ):
            beta, gamma = betas[j], gammas[j]
            a = s.add(self.s1_special_reference.p_4[j].mul(beta)).add(
                self.s1_special_reference.p_1.mul(gamma)
            )
            b = s_prime.add(self.s1_special_reference.p_3.mul(beta)).add(
                self.s1_special_reference.p_1.mul(gamma)
            )
            a_commitments.append(a)
            b_commitments.append(b)
            wf_commitments += [a, b]

        gp_sig = sig.grand_product_signature

        # e(D, h^{alpha x}) e(D^{-wz}, h^alpha) e(g^a, h^alpha)
        #   = e(A, h) e(B, h^{x^{n+1}}) -- n here is 3n+1 (variables)
        three_n_plus_1 = 3 * n + 1
        randomness = [self.rng() for _ in sig.s_commitments]
        a_c = _msm(a_commitments, randomness)
        b_c = _msm(b_commitments, randomness)
        value = sum(
            v * r for (v, _), r in zip(gp_sig.grand_product_openings, randomness)
        ) % R_MOD
        openings = _msm(
            [o for _, o in gp_sig.grand_product_openings], randomness
        )
        acc = FQ12_ONE
        for g1, g2 in (
            (openings, srs.h_positive_x_alpha[1]),
            (openings.mul((-(w * z)) % R_MOD), srs.h_positive_x_alpha[0]),
            (a_c, srs.h_positive_x[0].neg()),
            (b_c, srs.h_positive_x[three_n_plus_1 + 1].neg()),
            (rc.G1_GEN.mul(value), srs.h_positive_x_alpha[0]),
        ):
            if not g1.is_zero():
                acc = fq12_mul(acc, pairing(g1, g2))
        if acc != FQ12_ONE:
            raise AssertionError(
                "grand product arguments must be valid for individual commitments"
            )

        # second part: c/t polynomial openings via the batch
        gp_challenges = [
            transcript.get_challenge_scalar() for _ in gp_sig.c_commitments
        ]
        z_inv = pow(z, -1, R_MOD)
        t_zy = (gp_sig.proof.e_zinv - gp_sig.proof.f_y) % R_MOD
        commitment_points, rc_vec, ry_vec = [], [], []
        for r, (c, v), (a, _) in zip(
            gp_challenges, gp_sig.c_commitments, gp_sig.grand_product_openings
        ):
            commitment_points.append(c)
            rc_ = _c_zy(three_n_plus_1, a, v, w, z) * r % R_MOD
            rc_vec.append(rc_)
            ry_vec.append(w * r % R_MOD)
            t_zy = (t_zy + rc_ - r) % R_MOD

        c_rc = _msm(commitment_points, rc_vec)
        c_ry = _msm(commitment_points, ry_vec)

        random = self.rng()
        self.batch.add_opening(gp_sig.proof.e_opening, random, z_inv)
        self.batch.add_opening_value(random, gp_sig.proof.e_zinv)
        self.batch.add_commitment(c_rc, random)
        random = self.rng()
        self.batch.add_opening(gp_sig.proof.f_opening, random, w)
        self.batch.add_opening_value(random, gp_sig.proof.f_y)
        self.batch.add_commitment(c_ry, random)
        random = self.rng()
        self.batch.add_opening(gp_sig.proof.t_opening, random, z)
        self.batch.add_opening_value(random, t_zy)
        self.batch.add_commitment(gp_sig.t_commitment, random)

        # wellformedness of the grand-product inputs (hard check)
        wf_challenges = [
            transcript.get_challenge_scalar() for _ in wf_commitments
        ]
        d = srs.d
        nn = three_n_plus_1
        assert nn < d
        a_wf = _msm(wf_commitments, wf_challenges)
        r1, r2 = self.rng(), self.rng()
        l_r1 = gp_sig.wellformedness_signature.proof.l.mul(r1)
        r_r2 = gp_sig.wellformedness_signature.proof.r.mul(r2)
        a_r = a_wf.mul((r1 + r2) % R_MOD)
        acc = FQ12_ONE
        for g1, g2 in (
            (a_r, srs.h_positive_x[0].neg()),
            (l_r1, srs.h_positive_x_alpha[d]),
            (r_r2, srs.h_negative_x_alpha[d - nn]),
        ):
            if not g1.is_zero():
                acc = fq12_mul(acc, pairing(g1, g2))
        if acc != FQ12_ONE:
            raise AssertionError("wellformedness argument must be valid")

        return szw

    # -- per-proof (same as the helped verifier) ------------------------------

    def add_proof_with_advice(self, proof: Proof, inputs, advice: SxyAdvice) -> None:
        z_holder = []

        def sxy(z, y):
            z_holder.append(z)
            return advice.szy

        self.add_proof(proof, inputs, sxy)
        z = z_holder[0]
        transcript = Transcript(b"")
        transcript.commit_point(advice.opening)
        transcript.commit_point(advice.s)
        transcript.commit_scalar(advice.szy)
        random = self.rng()
        self.batch.add_opening(advice.opening, random, z)
        self.batch.add_commitment(advice.s, random)
        self.batch.add_opening_value(advice.szy, random)

    def add_proof(self, proof: Proof, inputs, sxy=None) -> None:
        transcript = Transcript(b"")
        transcript.commit_point(proof.r)
        y = transcript.get_challenge_scalar()
        transcript.commit_point(proof.t)
        z = transcript.get_challenge_scalar()
        transcript.commit_scalar(proof.rz)
        transcript.commit_scalar(proof.rzy)
        r1 = transcript.get_challenge_scalar()
        transcript.commit_point(proof.z_opening)
        transcript.commit_point(proof.zy_opening)

        random = self.rng()
        self.batch.add_opening(proof.zy_opening, random, z * y % R_MOD)
        self.batch.add_commitment_max_n(proof.r, random)
        self.batch.add_opening_value(proof.rzy, random)

        ky = 0
        for exp, value in zip(self.k_map, [1] + list(inputs)):
            ky = (ky + pow(y, exp + self.n, R_MOD) * value) % R_MOD

        szy = sxy(z, y) if sxy is not None else None
        if szy is None:
            sx = SxEval(y, self.n)
            self.driver(sx, self.circuit)
            szy = sx.finalize(z)

        tzy = ((proof.rzy + szy) * proof.rz - ky) % R_MOD

        random = self.rng()
        self.batch.add_opening(proof.z_opening, random, z)
        self.batch.add_opening_value(tzy, random)
        self.batch.add_commitment(proof.t, random)
        random = random * r1 % R_MOD
        self.batch.add_opening_value(proof.rz, random)
        self.batch.add_commitment_max_n(proof.r, random)

    def check_all(self) -> bool:
        return self.batch.check_all()
