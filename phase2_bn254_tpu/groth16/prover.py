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


_SOURCE_CHUNK = 1 << 18  # bases decoded host->device per read (VERDICT r3 #6)


class _QueryMSMs:
    """The prover's query multiexps, dispatched together.

    Two independences from the reference recovered here (prover.rs:276-334):

    * All MSMs are DISPATCHED before any result is pulled: the JAX backend's
      msm_async queues every query's kernels back-to-back on device (the
      futures-join overlap analog); each `wait` then costs one host pull.
    * Bases can come from a streaming `ParametersSource` span instead of a
      materialized Point list: raw uncompressed bytes are decoded to device
      limb planes in 2^18-element chunks (no boxed host Points in the hot
      path), honoring the source's checked / infinity read modes.
    """

    def __init__(self, params, backend):
        from .source import ParametersSource

        self.params = params
        self.backend = backend
        self.streaming = isinstance(params, ParametersSource)

    def _bases_pointset(self, name: str, start: int, count: int):
        """Device PointSet for vector[start : start+count]."""
        be = self.backend
        if not self.streaming:
            vec = getattr(self.params, name)
            assert start + count <= len(vec), "not enough bases"
            group = "g2" if name == "b_g2" else "g1"
            return be.from_points(vec[start : start + count], group)
        src = self.params
        group = src.group(name)
        parts = []
        for off in range(start, start + count, _SOURCE_CHUNK):
            nn = min(_SOURCE_CHUNK, start + count - off)
            raw = src.read_chunk(name, off, nn)
            parts.append(be.decode(raw, group, nn, False, src.checked))
        ps = parts[0] if len(parts) == 1 else be.concat(parts)
        return ps

    def dispatch(self, name: str, start: int, scalars: list[int]):
        group = "g2" if name == "b_g2" else "g1"
        if not scalars:
            return ("value", rc.point_zero(group))
        if self.backend is None:
            from ..refimpl.backend import ExactBackend

            if self.streaming:
                # chunked partial sums: bounded host memory at any size
                acc = rc.point_zero(group)
                for off in range(0, len(scalars), _SOURCE_CHUNK):
                    nn = min(_SOURCE_CHUNK, len(scalars) - off)
                    pts = self.params.points(name, start + off, nn)
                    acc = acc.add(ExactBackend().msm(pts, scalars[off : off + nn]))
                return ("value", acc)
            vec = getattr(self.params, name)
            assert start + len(scalars) <= len(vec), "not enough bases"
            return ("value", ExactBackend().msm(vec[start : start + len(scalars)], scalars))
        ps = self._bases_pointset(name, start, len(scalars))
        if hasattr(self.backend, "msm_async"):
            return ("handle", self.backend.msm_async(ps, scalars))
        return ("value", self.backend.msm(ps, scalars))

    def wait(self, handle) -> rc.Point:
        kind, v = handle
        return v if kind == "value" else self.backend.msm_wait(v)


def create_proof(prover: ProvingAssignment, params, r: int, s: int, backend=None) -> Proof:
    """params: a containers.Parameters OR a source.ParametersSource."""
    vk = params.vk
    if vk.delta_g1.is_zero() or vk.delta_g2.is_zero():
        raise SynthesisError("unexpected identity (CRS subversion)")

    h_scalars = _h_coefficients(prover)

    inputs = prover.input_assignment
    auxs = prover.aux_assignment
    ninp = len(inputs)
    b_in_total = sum(prover.b_input_density)
    a_aux_scalars = [v for v, d in zip(auxs, prover.a_aux_density) if d]
    b_in_scalars = [v for v, d in zip(inputs, prover.b_input_density) if d]
    b_aux_scalars = [v for v, d in zip(auxs, prover.b_aux_density) if d]

    q = _QueryMSMs(params, backend)
    handles = {
        "h": q.dispatch("h", 0, h_scalars),
        "l": q.dispatch("l", 0, auxs),
        "a_inputs": q.dispatch("a", 0, inputs),
        "a_aux": q.dispatch("a", ninp, a_aux_scalars),
        "b1_inputs": q.dispatch("b_g1", 0, b_in_scalars),
        "b1_aux": q.dispatch("b_g1", b_in_total, b_aux_scalars),
        "b2_inputs": q.dispatch("b_g2", 0, b_in_scalars),
        "b2_aux": q.dispatch("b_g2", b_in_total, b_aux_scalars),
    }
    h = q.wait(handles["h"])
    l = q.wait(handles["l"])
    a_inputs = q.wait(handles["a_inputs"])
    a_aux = q.wait(handles["a_aux"])
    b1_inputs = q.wait(handles["b1_inputs"])
    b1_aux = q.wait(handles["b1_aux"])
    b2_inputs = q.wait(handles["b2_inputs"])
    b2_aux = q.wait(handles["b2_aux"])

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


def create_random_proof(circuit, params, rng: ChaChaRng, backend=None) -> Proof:
    """prover.rs:439-455: r, s = Fr::rand(rng).

    params: containers.Parameters or a streaming source.ParametersSource."""
    prover = prepare_prover(circuit)
    r = rand_fr(rng)
    s = rand_fr(rng)
    return create_proof(prover, params, r, s, backend)
