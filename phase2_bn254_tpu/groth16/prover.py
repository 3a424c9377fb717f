"""Groth16 prover: h-polynomial via device NTTs + query multiexps.

Reimplements bellman's create_proof
(/root/reference/bellman/src/groth16/prover.rs:137-345): synthesize the
witness assignment, interpolate/evaluate a,b,c on a coset (6 NTTs + inverse),
divide by the vanishing polynomial, then combine seven multiexps with the
r/s blinding.
"""

from __future__ import annotations

import numpy as np

from ..crypto.chacha import ChaChaRng
from ..refimpl import curve as rc
from ..refimpl.field import R_MOD
from ..refimpl.sampling import rand_fr
from .containers import Parameters, Proof
from .cs import ProvingAssignment, SynthesisError


def prepare_prover(circuit) -> ProvingAssignment:
    """prover.rs:153-186 (including the x*0=0 input constraints)."""
    prover = ProvingAssignment()
    prover.alloc_input(None, lambda: 1)
    circuit.synthesize(prover)
    from .cs import LinearCombination, Variable

    for i in range(len(prover.input_assignment)):
        prover.enforce(
            None,
            LinearCombination([(Variable("input", i), 1)]),
            LinearCombination(),
            LinearCombination(),
        )
    return prover


def _h_coefficients(prover: ProvingAssignment) -> list[int]:
    """The (a*b - c)/z coset pipeline (prover.rs:216-251), on device."""
    import jax.numpy as jnp

    from ..field import fp
    from ..ops import ntt

    n = len(prover.a)
    exp, m = 0, 1
    while m < n:
        m *= 2
        exp += 1
    if exp > 28:
        raise SynthesisError("polynomial degree too large")

    def arr(vals):
        limbs = fp.ints_to_limbs_batch(vals)
        if len(vals) < m:
            limbs = np.vstack(
                [limbs, np.zeros((m - len(vals), fp.NLIMBS), dtype=np.uint32)]
            )
        # canonical -> Montgomery on device (one fused mont_mul by R^2)
        return fp.to_mont(ntt.CTX_R, jnp.asarray(limbs))

    a = arr(prover.a)
    b = arr(prover.b)
    c = arr(prover.c)
    a = ntt.coset_ntt(exp, ntt.ntt(exp, a, True))
    b = ntt.coset_ntt(exp, ntt.ntt(exp, b, True))
    c = ntt.coset_ntt(exp, ntt.ntt(exp, c, True))
    ab = fp.mont_mul(ntt.CTX_R, a, b)
    ab = fp.sub(ntt.CTX_R, ab, c)
    ab = ntt.divide_by_z_on_coset(exp, ab)
    h = ntt.icoset_ntt(exp, ab)
    h_can = np.asarray(fp.from_mont(ntt.CTX_R, h))
    return fp.limbs_to_ints_batch(h_can[: m - 1])  # truncate last


def _msm(bases: list[rc.Point], scalars: list[int], backend=None) -> rc.Point:
    assert len(bases) >= len(scalars), "not enough bases"
    bases = bases[: len(scalars)]
    if not bases:
        return rc.point_zero("g1")
    if backend is None:
        from ..refimpl.backend import ExactBackend

        return ExactBackend().msm(bases, scalars)
    return backend.msm(backend.from_points(bases, bases[0].group), scalars)


def create_proof(prover: ProvingAssignment, params: Parameters, r: int, s: int, backend=None) -> Proof:
    vk = params.vk
    if vk.delta_g1.is_zero() or vk.delta_g2.is_zero():
        raise SynthesisError("unexpected identity (CRS subversion)")

    h_scalars = _h_coefficients(prover)
    h = _msm(params.h, h_scalars, backend)

    inputs = prover.input_assignment
    auxs = prover.aux_assignment
    ninp = len(inputs)

    l = _msm(params.l, auxs, backend)

    a_inputs = _msm(params.a[:ninp], inputs, backend)
    a_aux_bases = params.a[ninp:]
    a_aux_scalars = [v for v, d in zip(auxs, prover.a_aux_density) if d]
    a_aux = _msm(a_aux_bases, a_aux_scalars, backend)

    b_in_total = sum(prover.b_input_density)
    b1_inputs = _msm(
        params.b_g1[:b_in_total],
        [v for v, d in zip(inputs, prover.b_input_density) if d],
        backend,
    )
    b1_aux = _msm(
        params.b_g1[b_in_total:],
        [v for v, d in zip(auxs, prover.b_aux_density) if d],
        backend,
    )
    b2_inputs = _msm(
        params.b_g2[:b_in_total],
        [v for v, d in zip(inputs, prover.b_input_density) if d],
        backend,
    )
    b2_aux = _msm(
        params.b_g2[b_in_total:],
        [v for v, d in zip(auxs, prover.b_aux_density) if d],
        backend,
    )

    g_a = vk.delta_g1.mul(r).add(vk.alpha_g1)
    g_b = vk.delta_g2.mul(s).add(vk.beta_g2)
    g_c = vk.delta_g1.mul((r * s) % R_MOD).add(vk.alpha_g1.mul(s)).add(vk.beta_g1.mul(r))

    a_answer = a_inputs.add(a_aux)
    g_a = g_a.add(a_answer)
    g_c = g_c.add(a_answer.mul(s))

    b1_answer = b1_inputs.add(b1_aux)
    b2_answer = b2_inputs.add(b2_aux)
    g_b = g_b.add(b2_answer)
    g_c = g_c.add(b1_answer.mul(r)).add(h).add(l)

    return Proof(a=g_a, b=g_b, c=g_c)


def create_random_proof(circuit, params: Parameters, rng: ChaChaRng, backend=None) -> Proof:
    """prover.rs:439-455: r, s = Fr::rand(rng)."""
    prover = prepare_prover(circuit)
    r = rand_fr(rng)
    s = rand_fr(rng)
    return create_proof(prover, params, r, s, backend)
