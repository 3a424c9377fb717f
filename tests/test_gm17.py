"""GM17 scaffolding: SAP reduction + generator query consistency.

The reference's GM17 is feature-flagged and incomplete (generator computes
queries then discards them, /root/reference/bellman/src/gm17/generator.rs:
687-689); these tests pin our completed-query math against direct trapdoor
recomputation and the containers' byte round-trips."""

import random

from phase2_bn254_tpu.gm17 import (
    Gm17Proof,
    Gm17VerifyingKey,
    SapAssembly,
    generate_parameters,
)
from phase2_bn254_tpu.groth16.cs import LinearCombination as LC, Variable
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD
from phase2_bn254_tpu.refimpl.pairing import pairing

random.seed(5)

XOR_ONE = Variable("input", 0)


class XORDemo:
    def synthesize(self, cs):
        a_var = cs.alloc(None)
        cs.enforce(None, LC() + (1, XOR_ONE) - a_var, LC() + a_var, LC())
        b_var = cs.alloc(None)
        cs.enforce(None, LC() + (1, XOR_ONE) - b_var, LC() + b_var, LC())
        c_var = cs.alloc_input(None)
        cs.enforce(None, LC() + a_var + a_var, LC() + b_var, LC() + a_var + b_var - c_var)


def test_sap_reduction_counts():
    """Each R1CS constraint becomes 2 SAP constraints + 1 aux y
    (generator.rs:129-208); each extra input adds 2 constraints + 1 aux."""
    cs = SapAssembly()
    cs.alloc_input()
    XORDemo().synthesize(cs)
    assert cs.num_r1cs_constraints == 3
    assert cs.num_constraints == 6
    assert cs.num_r1cs_aux == 2  # a_var, b_var
    assert cs.num_aux == 5  # + 3 SAP reduction ys


def test_gm17_generator_queries():
    alpha, beta, gamma, tau = 48577, 22580, 53332, 3673
    params = generate_parameters(XORDemo(), rc.G1_GEN, rc.G2_GEN, alpha, beta, gamma, tau)

    # domain: 6 circuit SAP constraints + 1 (input0) + 2*1 (input c) = 9 -> 16
    m = 16
    z_at_tau = (pow(tau, m, R_MOD) - 1) % R_MOD
    # gamma^2 * Z(t) * t^i query against direct recompute
    g2zt = (gamma * gamma * z_at_tau) % R_MOD
    assert len(params.gamma2_z_t) == m - 1
    cur = g2zt
    for p in params.gamma2_z_t:
        assert p == rc.G1_GEN.mul(cur)
        cur = (cur * tau) % R_MOD

    # a_g1 / a_g2 share discrete logs: e(a_g1[i], g2) == e(g1, a_g2[i])
    for i in range(len(params.a_g1)):
        if params.a_g1[i].is_zero():
            assert params.a_g2[i].is_zero()
            continue
        assert pairing(params.a_g1[i], rc.G2_GEN) == pairing(rc.G1_GEN, params.a_g2[i])

    # constants
    ab = (alpha + beta) % R_MOD
    assert params.ab_gamma_z_g1 == rc.G1_GEN.mul((ab * gamma) % R_MOD)
    assert params.vk.alpha_g1 == rc.G1_GEN.mul(alpha)
    assert params.vk.beta_g2 == rc.G2_GEN.mul(beta)

    # container round-trips
    vk2 = Gm17VerifyingKey.read(params.vk.write())
    assert vk2 == params.vk

    pr = Gm17Proof(rc.G1_GEN.mul(5), rc.G2_GEN.mul(7), rc.G1_GEN.mul(9))
    assert Gm17Proof.read(pr.write()) == pr
