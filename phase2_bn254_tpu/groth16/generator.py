"""Groth16 parameter generator from explicit toxic waste.

Reimplements bellman's generate_parameters
(/root/reference/bellman/src/groth16/generator.rs:177-510): synthesize the
circuit into QAP matrices, evaluate the polynomials at tau in the Lagrange
basis (inverse NTT of the tau powers), and build the CRS queries. Mostly used
by tests (the ceremony replaces it with MPC), so the scalar work runs on the
device NTT and the point exponentiations on the host exact layer.
"""

from __future__ import annotations

import numpy as np

from ..crypto.chacha import ChaChaRng
from ..refimpl import curve as rc
from ..refimpl.field import R_MOD
from ..refimpl.sampling import rand_fr
from .containers import Parameters, VerifyingKey
from .cs import KeypairAssembly, LinearCombination, SynthesisError, UnconstrainedVariable, Variable


def generate_parameters(
    circuit,
    g1: rc.Point,
    g2: rc.Point,
    alpha: int,
    beta: int,
    gamma: int,
    delta: int,
    tau: int,
) -> Parameters:
    assembly = KeypairAssembly()
    assembly.alloc_input()
    circuit.synthesize(assembly)
    for i in range(assembly.num_inputs):
        assembly.enforce(
            None,
            LinearCombination([(Variable("input", i), 1)]),
            LinearCombination(),
            LinearCombination(),
        )

    m, exp = 1, 0
    while m < assembly.num_constraints:
        m *= 2
        exp += 1
        if exp > 28:
            raise SynthesisError("polynomial degree too large")

    gamma_inv = pow(gamma, -1, R_MOD)
    delta_inv = pow(delta, -1, R_MOD)

    # tau powers + H query: g1^{tau^i * t(tau) / delta}
    powers = [pow(tau, i, R_MOD) for i in range(m)]
    z_tau = (pow(tau, m, R_MOD) - 1) % R_MOD
    coeff = (z_tau * delta_inv) % R_MOD
    h = [g1.mul((p * coeff) % R_MOD) for p in powers[: m - 1]]

    # Lagrange coefficients of the tau powers (device scalar iNTT)
    lag = _intt_scalars(powers, exp)

    def eval_at_tau(terms):
        acc = 0
        for c, idx in terms:
            acc += lag[idx] * c
        return acc % R_MOD

    def eval_section(at, bt, ct, inv):
        n = len(at)
        a = [rc.point_zero("g1")] * n
        b_g1 = [rc.point_zero("g1")] * n
        b_g2 = [rc.point_zero("g2")] * n
        ext = [rc.point_zero("g1")] * n
        for i in range(n):
            at_v = eval_at_tau(at[i])
            bt_v = eval_at_tau(bt[i])
            ct_v = eval_at_tau(ct[i])
            if at_v:
                a[i] = g1.mul(at_v)
            if bt_v:
                b_g1[i] = g1.mul(bt_v)
                b_g2[i] = g2.mul(bt_v)
            e = (at_v * beta + bt_v * alpha + ct_v) * inv % R_MOD
            ext[i] = g1.mul(e)
        return a, b_g1, b_g2, ext

    a_in, b1_in, b2_in, ic = eval_section(
        assembly.at_inputs, assembly.bt_inputs, assembly.ct_inputs, gamma_inv
    )
    a_aux, b1_aux, b2_aux, l = eval_section(
        assembly.at_aux, assembly.bt_aux, assembly.ct_aux, delta_inv
    )
    if any(e.is_zero() for e in l):
        raise UnconstrainedVariable()

    vk = VerifyingKey(
        alpha_g1=g1.mul(alpha),
        beta_g1=g1.mul(beta),
        beta_g2=g2.mul(beta),
        gamma_g2=g2.mul(gamma),
        delta_g1=g1.mul(delta),
        delta_g2=g2.mul(delta),
        ic=ic,
    )
    a = [e for e in a_in + a_aux if not e.is_zero()]
    b_g1 = [e for e in b1_in + b1_aux if not e.is_zero()]
    b_g2 = [e for e in b2_in + b2_aux if not e.is_zero()]
    return Parameters(vk=vk, h=h, l=l, a=a, b_g1=b_g1, b_g2=b_g2)


def generate_random_parameters(circuit, rng: ChaChaRng) -> Parameters:
    """generator.rs:30-49: random g1/g2/trapdoors from the RNG."""
    from ..refimpl.sampling import rand_g1, rand_g2

    g1 = rand_g1(rng)
    g2 = rand_g2(rng)
    alpha = rand_fr(rng)
    beta = rand_fr(rng)
    gamma = rand_fr(rng)
    delta = rand_fr(rng)
    tau = rand_fr(rng)
    return generate_parameters(circuit, g1, g2, alpha, beta, gamma, delta, tau)


def _intt_scalars(vals: list[int], exp: int) -> list[int]:
    import jax.numpy as jnp

    from ..field import fp
    from ..ops import ntt

    m = 1 << exp
    arr = np.zeros((m, fp.NLIMBS), dtype=np.uint32)
    for i, v in enumerate(vals):
        arr[i] = fp.int_to_limbs(ntt.CTX_R.to_mont_int(v))
    out = ntt.ntt(exp, jnp.asarray(arr), True)
    can = np.asarray(fp.from_mont(ntt.CTX_R, out))
    return [fp.limbs_to_int(can[i]) for i in range(m)]
