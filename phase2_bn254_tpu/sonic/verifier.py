"""SONIC helped verifier: MultiVerifier + verify_proofs / verify_aggregate.

Mirrors /root/reference/bellman/src/sonic/helped/verifier.rs. All openings
across all added proofs collapse into one 4-pairing batch check
(helped.Batch); randomness comes from an injectable `rng()` (OS entropy by
default - boolean output, so reproducibility is not required).
"""

from __future__ import annotations

import secrets

from ..refimpl.field import R_MOD
from . import SRS, Transcript
from .helped import Batch, Parameters, Proof, SxyAdvice
from .poly import SxEval
from .synthesis import Preprocess, basic_synthesize


class MultiVerifier:
    """verifier.rs:21-251."""

    def __init__(self, circuit, srs: SRS, driver=basic_synthesize, rng=None):
        pre = Preprocess()
        driver(pre, circuit)
        self.circuit = circuit
        self.driver = driver
        self.batch = Batch(srs=srs, n=pre.n)
        self.k_map = pre.k_map
        self.n = pre.n
        self.q = pre.q
        self.rng = rng or (lambda: secrets.randbelow(R_MOD - 1) + 1)

    def add_aggregate(self, proofs: list[tuple[Proof, SxyAdvice]], aggregate) -> None:
        """verifier.rs:49-116: fold an Aggregate's openings into the batch."""
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

        sx = SxEval(w, self.n)
        self.driver(sx, self.circuit)
        szw = sx.finalize(z)

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

    def add_proof_with_advice(self, proof: Proof, inputs: list[int],
                              advice: SxyAdvice) -> None:
        """verifier.rs:119-144."""
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

    def add_proof(self, proof: Proof, inputs: list[int], sxy=None) -> None:
        """verifier.rs:146-218."""
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

        # open proof.r at z*y to proof.rzy
        random = self.rng()
        self.batch.add_opening(proof.zy_opening, random, z * y % R_MOD)
        self.batch.add_commitment_max_n(proof.r, random)
        self.batch.add_opening_value(proof.rzy, random)

        # k(y) over the public inputs
        ky = 0
        for exp, value in zip(self.k_map, [1] + list(inputs)):
            ky = (ky + pow(y, exp + self.n, R_MOD) * value) % R_MOD

        szy = sxy(z, y) if sxy is not None else None
        if szy is None:
            sx = SxEval(y, self.n)
            self.driver(sx, self.circuit)
            szy = sx.finalize(z)

        # t(z, y) = (r(z, y) + s(z, y)) * r(z, 1) - k(y)
        tzy = ((proof.rzy + szy) * proof.rz - ky) % R_MOD

        # open t at z and r at z simultaneously (independent via r1)
        random = self.rng()
        self.batch.add_opening(proof.z_opening, random, z)
        self.batch.add_opening_value(tzy, random)
        self.batch.add_commitment(proof.t, random)
        random = random * r1 % R_MOD
        self.batch.add_opening_value(proof.rz, random)
        self.batch.add_commitment_max_n(proof.r, random)

    def check_all(self) -> bool:
        return self.batch.check_all()


def verify_proofs(proofs, inputs, circuit, params: Parameters,
                  driver=basic_synthesize, rng=None) -> bool:
    """verifier.rs:255-271 (non-succinct: evaluates S(X, Y) itself)."""
    return verify_proofs_on_srs(proofs, inputs, circuit, params.srs, driver, rng)


def verify_proofs_on_srs(proofs, inputs, circuit, srs: SRS,
                         driver=basic_synthesize, rng=None) -> bool:
    verifier = MultiVerifier(circuit, srs, driver, rng)
    expected = len(verifier.k_map) - 1
    for proof, proof_inputs in zip(proofs, inputs):
        if len(proof_inputs) != expected:
            return False
        verifier.add_proof(proof, proof_inputs)
    return verifier.check_all()


def verify_aggregate(proofs_with_advice, aggregate, inputs, circuit,
                     params: Parameters, driver=basic_synthesize, rng=None) -> bool:
    """verifier.rs:275-307."""
    return verify_aggregate_on_srs(
        proofs_with_advice, aggregate, inputs, circuit, params.srs, driver, rng
    )


def verify_aggregate_on_srs(proofs_with_advice, aggregate, inputs, circuit,
                            srs: SRS, driver=basic_synthesize, rng=None) -> bool:
    verifier = MultiVerifier(circuit, srs, driver, rng)
    expected = len(verifier.k_map) - 1
    for (proof, advice), proof_inputs in zip(proofs_with_advice, inputs):
        if len(proof_inputs) != expected:
            return False
        verifier.add_proof_with_advice(proof, proof_inputs, advice)
    verifier.add_aggregate(proofs_with_advice, aggregate)
    return verifier.check_all()
