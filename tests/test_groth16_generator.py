"""Groth16 generator parity tests.

The reference validates its generator against hand-computed CRS elements with
fixed trapdoors (test_xordemo, bellman/src/groth16/tests/mod.rs:28-330, using
the tiny DummyEngine field). We run the same XOR circuit over BN254 itself
and check the CRS algebraically from the trapdoors via the exact host layer,
then run the full prove/verify loop (the MiMC-integration analog,
bellman/tests/mimc.rs).
"""

import random

from phase2_bn254_tpu.crypto.chacha import ChaChaRng
from phase2_bn254_tpu.groth16.cs import LinearCombination as LC
from phase2_bn254_tpu.groth16.generator import generate_parameters, generate_random_parameters
from phase2_bn254_tpu.groth16.prover import create_random_proof
from phase2_bn254_tpu.groth16.verifier import prepare_verifying_key, verify_proof
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(77)


class XORDemo:
    """bellman/src/tests/mod.rs:21-93: c = a XOR b."""

    def __init__(self, a=None, b=None):
        self.a = a
        self.b = b

    def synthesize(self, cs):
        a_var = cs.alloc(None, (lambda: int(self.a)) if self.a is not None else None)
        cs.enforce(None, LC() + (1, XOR_ONE) - a_var, LC() + a_var, LC())
        b_var = cs.alloc(None, (lambda: int(self.b)) if self.b is not None else None)
        cs.enforce(None, LC() + (1, XOR_ONE) - b_var, LC() + b_var, LC())
        c_val = (
            None if self.a is None else int(self.a) ^ int(self.b)
        )
        c_var = cs.alloc_input(None, (lambda: c_val) if c_val is not None else None)
        cs.enforce(None, LC() + a_var + a_var, LC() + b_var, LC() + a_var + b_var - c_var)


from phase2_bn254_tpu.groth16.cs import Variable

XOR_ONE = Variable("input", 0)


def test_xordemo_crs_structure():
    alpha, beta, gamma, delta, tau = 48577, 22580, 53332, 5481, 3673
    params = generate_parameters(
        XORDemo(), rc.G1_GEN, rc.G2_GEN, alpha, beta, gamma, delta, tau
    )
    # 5 constraints (3 circuit + 2 input) -> domain 8, H has 7 elements
    assert len(params.h) == 7
    t_at_tau = (pow(tau, 8, R_MOD) - 1) % R_MOD
    delta_inv = pow(delta, -1, R_MOD)
    coeff = (t_at_tau * delta_inv) % R_MOD
    cur = 1
    for h in params.h:
        assert h == rc.G1_GEN.mul((cur * coeff) % R_MOD)
        cur = (cur * tau) % R_MOD
    assert params.vk.alpha_g1 == rc.G1_GEN.mul(alpha)
    assert params.vk.delta_g2 == rc.G2_GEN.mul(delta)
    assert len(params.vk.ic) == 2
    assert len(params.l) == 2  # two aux variables


def test_xordemo_prove_verify():
    rng = ChaChaRng.from_digest_be(bytes(range(32)))
    params = generate_random_parameters(XORDemo(), rng)
    pvk = prepare_verifying_key(params.vk)
    for a in (False, True):
        for b in (False, True):
            proof = create_random_proof(XORDemo(a, b), params, rng)
            assert verify_proof(pvk, proof, [int(a) ^ int(b)])
            assert not verify_proof(pvk, proof, [1 - (int(a) ^ int(b))])


class MiMC:
    """bellman/tests/mimc.rs:45-116: x_{i+1} = (x_i + c_i)^3 + y (LongsightF
    round structure, reduced rounds for test speed)."""

    ROUNDS = 32

    def __init__(self, constants, xl=None, xr=None):
        assert len(constants) == self.ROUNDS
        self.constants = constants
        self.xl = xl
        self.xr = xr

    def image(self):
        xl, xr = self.xl, self.xr
        for c in self.constants:
            t = (xl + c) % R_MOD
            t3 = pow(t, 3, R_MOD)
            xl, xr = (xr + t3) % R_MOD, xl
        return xl

    def synthesize(self, cs):
        xl_val = self.xl
        xr_val = self.xr
        xl = cs.alloc(None, (lambda: xl_val) if xl_val is not None else None)
        xr = cs.alloc(None, (lambda: xr_val) if xr_val is not None else None)
        for i, c in enumerate(self.constants):
            # tmp = (xl + c)^2
            t_val = None if xl_val is None else (xl_val + c) % R_MOD
            tmp_val = None if t_val is None else (t_val * t_val) % R_MOD
            tmp = cs.alloc(None, (lambda v=tmp_val: v) if tmp_val is not None else None)
            cs.enforce(
                None, LC() + xl + (c, XOR_ONE), LC() + xl + (c, XOR_ONE), LC() + tmp
            )
            # new_xl = xr + tmp*(xl+c); last round exposes it as the image
            new_val = (
                None if tmp_val is None else (xr_val + tmp_val * t_val) % R_MOD
            )
            if i == self.ROUNDS - 1:
                new_xl = cs.alloc_input(None, (lambda v=new_val: v) if new_val is not None else None)
            else:
                new_xl = cs.alloc(None, (lambda v=new_val: v) if new_val is not None else None)
            cs.enforce(
                None, LC() + tmp, LC() + xl + (c, XOR_ONE), LC() + new_xl - xr
            )
            xl_val, xr_val = new_val, xl_val
            xl, xr = new_xl, xl


def test_mimc_integration():
    constants = [random.randrange(R_MOD) for _ in range(MiMC.ROUNDS)]
    rng = ChaChaRng.from_digest_be(bytes(range(1, 33)))
    params = generate_random_parameters(MiMC(constants), rng)
    pvk = prepare_verifying_key(params.vk)
    xl, xr = random.randrange(R_MOD), random.randrange(R_MOD)
    circ = MiMC(constants, xl, xr)
    image = circ.image()
    proof = create_random_proof(circ, params, rng)
    assert verify_proof(pvk, proof, [image])
    assert not verify_proof(pvk, proof, [(image + 1) % R_MOD])


def test_namespace_raii():
    """cs.rs:255-332 Namespace analog: path stack + error annotation."""
    from phase2_bn254_tpu.groth16.cs import (
        AssignmentMissing,
        LinearCombination,
        ProvingAssignment,
    )

    cs = ProvingAssignment()
    cs.alloc_input(None, lambda: 1)  # the ONE input
    with cs.namespace("outer"):
        with cs.namespace("inner"):
            assert cs.path == "outer/inner"
            v = cs.alloc(None, lambda: 3)
            cs.enforce(None, LinearCombination() + v, LinearCombination() + v,
                       LinearCombination() + (9, XOR_ONE))
        assert cs.path == "outer"
    assert cs.path == ""

    import pytest as _pytest

    with _pytest.raises(AssignmentMissing, match="outer/fail"):
        with cs.namespace("outer"):
            with cs.namespace("fail"):
                cs.alloc(None, None)


def test_prover_streaming_source_matches_list_path():
    """ParametersSource (streaming span reads, groth16/source.py) must yield
    the same proof as the materialized Parameters list path - same rng seed
    => identical r/s => byte-identical proof. Exercises the chunked host
    decode + checked read modes (bellman mod.rs:396-483 parity)."""
    from phase2_bn254_tpu.groth16.source import ParametersSource

    rng = ChaChaRng.from_digest_be(bytes(range(32)))
    params = generate_random_parameters(XORDemo(), rng)
    src = ParametersSource(params.write(), checked=True)
    assert src.count("h") == len(params.h)
    assert src.count("b_g2") == len(params.b_g2)
    assert src.vk == params.vk

    rng_a = ChaChaRng.from_digest_be(bytes(range(32, 64)))
    rng_b = ChaChaRng.from_digest_be(bytes(range(32, 64)))
    proof_list = create_random_proof(XORDemo(True, False), params, rng_a)
    proof_src = create_random_proof(XORDemo(True, False), src, rng_b)
    assert proof_src.write() == proof_list.write()
    pvk = prepare_verifying_key(src.vk)
    assert verify_proof(pvk, proof_src, [1])
