"""SONIC unhelped (succinct) layer: the individual arguments (S2,
wellformedness, grand product, permutation) plus the full succinct
aggregate + SuccinctMultiVerifier flow.

Mirrors /root/reference/bellman/src/sonic/unhelped/ in-file tests and
tests/sonics.rs:462-583 (test_succinct_sonic_mimc) at reduced sizes.
"""

import random

import pytest

from phase2_bn254_tpu import sonic
from phase2_bn254_tpu.refimpl.field import R_MOD
from phase2_bn254_tpu.sonic import unhelped
from phase2_bn254_tpu.sonic.adaptor import AdaptorCircuit
from phase2_bn254_tpu.sonic.synthesis import permutation3_synthesize
from phase2_bn254_tpu.sonic.unhelped.grand_product import GrandProductArgument
from phase2_bn254_tpu.sonic.unhelped.permutation import PermutationArgument
from phase2_bn254_tpu.sonic.unhelped.permutation_structure import (
    create_permutation_structure,
)
from phase2_bn254_tpu.sonic.unhelped.s2 import S2Eval
from phase2_bn254_tpu.sonic.unhelped.wellformed import WellformednessArgument

from test_groth16_generator import MiMC

random.seed(99)


class MiMC4(MiMC):
    ROUNDS = 4


def _rand():
    return random.randrange(1, R_MOD)


@pytest.fixture(scope="module")
def srs_small():
    return sonic.SRS.new(48, 23923, 23728792)


def test_s2_proof(srs_small):
    """s2_proof.rs: commitment O is SRS-only; openings verify."""
    s2 = S2Eval(8)
    x, y = _rand(), _rand()
    proof = s2.evaluate(x, y, srs_small)
    assert S2Eval.verify(x, y, proof, srs_small)
    assert not S2Eval.verify(x, (y + 1) % R_MOD, proof, srs_small)


def test_wellformedness_argument(srs_small):
    """wellformed_argument.rs:163-186 (test_argument + soundness)."""
    n = 16
    coeffs = [_rand() for _ in range(n)]
    coeffs[2] = 0
    arg = WellformednessArgument([coeffs])
    challenges = [_rand()]
    commitments = arg.commit(srs_small)
    proof = arg.make_argument(challenges, srs_small)
    assert WellformednessArgument.verify(n, challenges, commitments, proof, srs_small)

    # soundness: different polynomial under the same commitment fails
    other = WellformednessArgument([[_rand() for _ in range(n)]])
    bad_proof = other.make_argument(challenges, srs_small)
    assert not WellformednessArgument.verify(
        n, challenges, commitments, bad_proof, srs_small
    )


def test_grand_product_argument(srs_small):
    """grand_product_argument.rs test: equal products, full protocol."""
    n = 8
    a = [_rand() for _ in range(n)]
    b = list(a)
    random.shuffle(b)  # same multiset -> same product
    arg = GrandProductArgument([(a, b)])
    y, z = _rand(), _rand()
    challenges = [_rand()]
    a_c, b_c = GrandProductArgument.commit_for_individual_products(a, b, srs_small)
    c_commitments = arg.commit_to_individual_c_polynomials(srs_small)
    t_commitment = arg.commit_to_t_polynomial(challenges, y, srs_small)
    openings = arg.open_commitments_for_grand_product(y, z, srs_small)
    a_zy = [v for v, _ in openings]
    proof = arg.make_argument(a_zy, challenges, y, z, srs_small)

    randomness = [_rand() for _ in range(1)]
    assert GrandProductArgument.verify_ab_commitment(
        n, randomness, [a_c], [b_c], openings, y, z, srs_small
    )
    randomness = [_rand() for _ in range(3)]
    assert GrandProductArgument.verify(
        n, randomness, a_zy, challenges, t_commitment, c_commitments, proof,
        y, z, srs_small,
    )


def test_permutation_argument(srs_small):
    """permutation_argument.rs:777-853 (test_permutation_argument)."""
    n = 8
    coeffs = [_rand() for _ in range(n)]
    coeffs[2] = 0  # edge case from the reference test
    permutation = list(range(1, n + 1))
    random.shuffle(permutation)

    specialized = PermutationArgument.make_specialized_srs(
        [coeffs], [permutation], srs_small
    )
    argument = PermutationArgument([coeffs], [permutation])
    y = _rand()
    challenges = [_rand()]
    commitments = argument.commit(y, srs_small)
    s_commitments = [s for s, _ in commitments]
    s_prime_commitments = [sp for _, sp in commitments]

    z_prime = _rand()
    opening = argument.open_commitments_to_s_prime(challenges, y, z_prime, srs_small)
    randomness = [_rand(), _rand()]
    assert PermutationArgument.verify_s_prime_commitment(
        n, randomness, challenges, s_prime_commitments, opening, y, z_prime,
        specialized, srs_small,
    ), "s' commitment must be valid"

    beta, gamma = _rand(), _rand()
    gp_challenges = [_rand()]
    wf_challenges = [_rand(), _rand()]
    z = _rand()
    proof = argument.make_argument(
        beta, gamma, gp_challenges, wf_challenges, y, z, specialized, srs_small
    )
    assert PermutationArgument.verify(s_commitments, proof, z, srs_small)


def test_succinct_sonic_mimc():
    """sonics.rs:462-583: full succinct flow - proof and advice under the
    permutation driver, succinct aggregate, SuccinctMultiVerifier."""
    constants = [random.randrange(R_MOD) for _ in range(MiMC4.ROUNDS)]
    xl, xr = random.randrange(R_MOD), random.randrange(R_MOD)
    witness = MiMC4(constants, xl, xr)
    image = witness.image()
    circuit = AdaptorCircuit(witness)

    structure = create_permutation_structure(circuit)
    n = structure.n
    d = 2 * (3 * n + 1) + 12
    srs = sonic.SRS.new(d, 23923, 23728792)

    proof = sonic.create_proof_on_srs(circuit, srs, driver=permutation3_synthesize)
    advice = sonic.create_advice_on_srs(
        circuit, proof, srs, driver=permutation3_synthesize
    )
    proofs = [(proof, advice)]
    aggregate = unhelped.create_aggregate(
        circuit, proofs, srs, driver=permutation3_synthesize
    )

    verifier = unhelped.SuccinctMultiVerifier(
        circuit, srs, driver=permutation3_synthesize
    )
    for p, a in proofs:
        verifier.add_proof_with_advice(p, [image], a)
    verifier.add_aggregate(proofs, aggregate)
    assert verifier.check_all()

    # wrong public input must fail
    verifier = unhelped.SuccinctMultiVerifier(
        circuit, srs, driver=permutation3_synthesize
    )
    for p, a in proofs:
        verifier.add_proof_with_advice(p, [(image + 1) % R_MOD], a)
    verifier.add_aggregate(proofs, aggregate)
    assert not verifier.check_all()


def test_permutation_structure_vectors():
    """The permutation vectors reproduce s(z, y): naive evaluation of the
    extracted structure matches SxEval (the s1 part plus s2)."""
    constants = [random.randrange(R_MOD) for _ in range(MiMC4.ROUNDS)]
    xl, xr = random.randrange(R_MOD), random.randrange(R_MOD)
    circuit = AdaptorCircuit(MiMC4(constants, xl, xr))
    structure = create_permutation_structure(circuit)
    n = structure.n
    coeffs, perms = structure.create_permutation_vectors()
    y, z = _rand(), _rand()

    # naive S1 contribution (permutation_structure.rs:453-470)
    s_contrib = 0
    for c_vec, p_vec in zip(coeffs, perms):
        for variable_index, sigma_i in enumerate(p_vec):
            s_contrib += (
                c_vec[sigma_i - 1]
                * pow(z, variable_index + 1, R_MOD)
                * pow(y, sigma_i, R_MOD)
            )
    s_contrib %= R_MOD
    s1 = (
        s_contrib
        * pow(pow(z, n + 1, R_MOD), -1, R_MOD)
        % R_MOD
        * pow(y, n, R_MOD)
        % R_MOD
    )
    # s2 part: sum_i (y^i + y^-i) z^i, subtracted with z^n scaling
    y_inv = pow(y, -1, R_MOD)
    s2 = sum(
        (pow(y, i, R_MOD) + pow(y_inv, i, R_MOD)) * pow(z, i, R_MOD)
        for i in range(1, n + 1)
    ) % R_MOD
    expected = (s1 - pow(z, n, R_MOD) * s2) % R_MOD

    from phase2_bn254_tpu.sonic.poly import SxEval

    sx = SxEval(y, n)
    permutation3_synthesize(sx, circuit)
    assert sx.finalize(z) == expected
