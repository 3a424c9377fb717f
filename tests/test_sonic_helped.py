"""SONIC helped protocol end-to-end: prove/verify MiMC through the R1CS
adaptor, advice + aggregation, serialization round-trips, and the native
sonic constraint system.

Mirrors the reference's test strategy
(/root/reference/bellman/src/sonic/tests/sonics.rs:252-355 test_sonic_mimc,
prover.rs:346-396 my_fun_circuit_test) at reduced MiMC rounds - the
protocol math is round-count independent.
"""

import random

import pytest

from phase2_bn254_tpu import sonic
from phase2_bn254_tpu.refimpl.field import R_MOD
from phase2_bn254_tpu.sonic import cs as scs
from phase2_bn254_tpu.sonic.adaptor import AdaptorCircuit
from phase2_bn254_tpu.sonic.helper import create_aggregate_on_srs
from phase2_bn254_tpu.sonic.synthesis import (
    Preprocess,
    Wires,
    basic_synthesize,
    nonassigning_synthesize,
    permutation3_synthesize,
)

from test_groth16_generator import MiMC

random.seed(77)


class MiMC8(MiMC):
    ROUNDS = 8


@pytest.fixture(scope="module")
def srs():
    # pinned srs taus, as in sonics.rs:260-261; d covers the permutation
    # driver's gate count (4n + 2*NUM_BLINDINGS at n=44)
    return sonic.SRS.new(200, 23923, 23728792)


@pytest.fixture(scope="module")
def mimc_setup():
    constants = [random.randrange(R_MOD) for _ in range(MiMC8.ROUNDS)]
    xl, xr = random.randrange(R_MOD), random.randrange(R_MOD)
    witness = MiMC8(constants, xl, xr)
    image = witness.image()
    return constants, witness, image


def _det_rng(seed):
    r = random.Random(seed)
    return lambda: r.randrange(1, R_MOD)


def test_sonic_mimc_proof_and_advice(srs, mimc_setup):
    constants, witness, image = mimc_setup
    circuit = AdaptorCircuit(witness)
    proof = sonic.create_proof_on_srs(circuit, srs, rng=_det_rng(1))
    advice = sonic.create_advice_on_srs(circuit, proof, srs)

    # plain verification (verifier evaluates S itself)
    verifier = sonic.MultiVerifier(circuit, srs, rng=_det_rng(2))
    verifier.add_proof(proof, [image])
    assert verifier.check_all()

    # several copies of the proof in one batch
    verifier = sonic.MultiVerifier(circuit, srs, rng=_det_rng(3))
    for _ in range(3):
        verifier.add_proof(proof, [image])
    assert verifier.check_all()

    # with advice + aggregate
    proofs = [(proof, advice)] * 3
    aggregate = create_aggregate_on_srs(circuit, proofs, srs)
    verifier = sonic.MultiVerifier(circuit, srs, rng=_det_rng(4))
    for p, a in proofs:
        verifier.add_proof_with_advice(p, [image], a)
    verifier.add_aggregate(proofs, aggregate)
    assert verifier.check_all()


def test_sonic_mimc_rejects_wrong_input(srs, mimc_setup):
    constants, witness, image = mimc_setup
    circuit = AdaptorCircuit(witness)
    proof = sonic.create_proof_on_srs(circuit, srs, rng=_det_rng(5))
    verifier = sonic.MultiVerifier(circuit, srs, rng=_det_rng(6))
    verifier.add_proof(proof, [(image + 1) % R_MOD])
    assert not verifier.check_all()


def test_sonic_mimc_rejects_tampered_proof(srs, mimc_setup):
    constants, witness, image = mimc_setup
    circuit = AdaptorCircuit(witness)
    proof = sonic.create_proof_on_srs(circuit, srs, rng=_det_rng(7))
    proof.rz = (proof.rz + 1) % R_MOD
    verifier = sonic.MultiVerifier(circuit, srs, rng=_det_rng(8))
    verifier.add_proof(proof, [image])
    assert not verifier.check_all()


def test_sonic_mimc_permutation_driver(srs, mimc_setup):
    """sonics.rs:357-460: same circuit through the M=3 permutation
    synthesizer; proof/verify must agree with it end-to-end."""
    constants, witness, image = mimc_setup
    circuit = AdaptorCircuit(witness)
    proof = sonic.create_proof_on_srs(
        circuit, srs, driver=permutation3_synthesize, rng=_det_rng(9)
    )
    verifier = sonic.MultiVerifier(
        circuit, srs, driver=permutation3_synthesize, rng=_det_rng(10)
    )
    verifier.add_proof(proof, [image])
    assert verifier.check_all()


def test_proof_serialization_roundtrip(srs, mimc_setup):
    constants, witness, image = mimc_setup
    circuit = AdaptorCircuit(witness)
    proof = sonic.create_proof_on_srs(circuit, srs, rng=_det_rng(11))
    data = proof.write()
    assert len(data) == 4 * 32 + 2 * 32
    back = sonic.Proof.read(data)
    assert back == proof


def test_vk_parameters_roundtrip(srs, mimc_setup):
    constants, witness, _ = mimc_setup
    circuit = AdaptorCircuit(witness)
    vk = sonic.VerifyingKey.new(circuit, srs)
    assert sonic.VerifyingKey.read(vk.write()) == vk
    params = sonic.Parameters(vk, srs)
    back = sonic.Parameters.read(params.write())
    assert back.vk == vk and back.srs.d == srs.d
    assert back.srs.g_positive_x[1] == srs.g_positive_x[1]


def test_circuit_parameters_counts(mimc_setup):
    constants, witness, _ = mimc_setup
    info = sonic.get_circuit_parameters(witness)
    # 2 + 2*ROUNDS allocs, 1 public input (the image), 2*ROUNDS constraints
    assert info.num_constraints == 2 * MiMC8.ROUNDS
    assert info.num_inputs == 1
    assert info.num_aux == 2 + 2 * MiMC8.ROUNDS - 1
    # preprocessing invariants shared by all drivers
    pre_b, pre_p = Preprocess(), Preprocess()
    nonassigning_synthesize(pre_b, AdaptorCircuit(witness))
    assert (pre_b.n, pre_b.q) == (info.n, info.q)
    assert pre_b.k_map[0] == 1  # ONE is the first k power


def test_native_sonic_circuit(srs):
    """prover.rs:346-396 (my_fun_circuit_test): a raw sonic circuit using
    multiply/enforce_zero directly, no adaptor."""

    class MyCircuit(scs.Circuit):
        def synthesize(self, cs):
            a, b, _ = cs.multiply(lambda: (10, 20, 200))
            cs.enforce_zero(scs.LinearCombination() + a + a - b)

    proof = sonic.create_proof_on_srs(MyCircuit(), srs, rng=_det_rng(12))
    verifier = sonic.MultiVerifier(MyCircuit(), srs, rng=_det_rng(13))
    verifier.add_proof(proof, [])
    assert verifier.check_all()


def test_wires_consistency(mimc_setup):
    """Witness vectors satisfy a*b=c gate-wise under every driver."""
    constants, witness, _ = mimc_setup
    for driver in (basic_synthesize, permutation3_synthesize):
        wires = Wires()
        driver(wires, AdaptorCircuit(witness))
        assert wires.a[0] == 1  # ONE input
        for a, b, c in zip(wires.a, wires.b, wires.c):
            assert a * b % R_MOD == c
