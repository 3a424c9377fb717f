"""GM17 (Groth-Maller 2017) SAP-based SNARK - scaffolding at feature parity
with the reference's incomplete, feature-flagged state.

The reference ships GM17 behind the `gm17` cargo feature with: complete
Proof/VerifyingKey containers + serialization
(/root/reference/bellman/src/gm17/mod.rs:27-250), a Parameters struct with
its serialization commented out (mod.rs:205-250+), a SAP-reducing
ConstraintSystem and a `generate_parameters` that computes every query but
returns `Ok(())` with vk assembly commented out
(/root/reference/bellman/src/gm17/generator.rs:229-700); prover and verifier
are commented out entirely (mod.rs:19-24).

This module mirrors that scope, idiomatically: containers with the same
byte formats, the same R1CS -> SAP reduction (one squaring pair + one `y`
aux variable per R1CS constraint, generator.rs:129-208), and a generator
that computes the same queries; unlike the reference we do assemble and
return the Parameters (the struct exists; dropping the result on the floor
reproduces a bug, not a feature). No prover/verifier, as upstream.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from ..groth16.cs import ConstraintSystem, LinearCombination, Variable
from ..ops.ntt import Domain
from ..refimpl import curve as rc
from ..refimpl.field import R_MOD


@dataclass
class Gm17Proof:
    """gm17/mod.rs:27-98: three compressed points, infinity rejected."""

    a: rc.Point
    b: rc.Point
    c: rc.Point

    def write(self) -> bytes:
        return (
            rc.point_to_bytes(self.a, True)
            + rc.point_to_bytes(self.b, True)
            + rc.point_to_bytes(self.c, True)
        )

    @classmethod
    def read(cls, data: bytes) -> "Gm17Proof":
        a = rc.point_from_bytes(data[0:32], "g1", True, check=True)
        b = rc.point_from_bytes(data[32:96], "g2", True, check=True)
        c = rc.point_from_bytes(data[96:128], "g1", True, check=True)
        for p in (a, b, c):
            if p.is_zero():
                raise ValueError("point at infinity in GM17 proof")
        return cls(a, b, c)


@dataclass
class Gm17VerifyingKey:
    """gm17/mod.rs:100-250: uncompressed points, u32-BE ic length."""

    h_g2: rc.Point
    alpha_g1: rc.Point
    beta_g2: rc.Point
    gamma_g1: rc.Point
    gamma_g2: rc.Point
    ic: list

    def write(self) -> bytes:
        out = [
            rc.point_to_bytes(self.h_g2, False),
            rc.point_to_bytes(self.alpha_g1, False),
            rc.point_to_bytes(self.beta_g2, False),
            rc.point_to_bytes(self.gamma_g1, False),
            rc.point_to_bytes(self.gamma_g2, False),
            struct.pack(">I", len(self.ic)),
        ]
        out += [rc.point_to_bytes(p, False) for p in self.ic]
        return b"".join(out)

    @classmethod
    def read(cls, data: bytes) -> "Gm17VerifyingKey":
        off = 0

        def rd(group):
            nonlocal off
            size = 64 if group == "g1" else 128
            p = rc.point_from_bytes(data[off : off + size], group, False, check=True)
            off += size
            return p

        h_g2 = rd("g2")
        alpha_g1 = rd("g1")
        beta_g2 = rd("g2")
        gamma_g1 = rd("g1")
        gamma_g2 = rd("g2")
        (n,) = struct.unpack_from(">I", data, off)
        off += 4
        ic = []
        for _ in range(n):
            p = rd("g1")
            if p.is_zero():
                raise ValueError("point at infinity in GM17 vk ic")
            ic.append(p)
        return cls(h_g2, alpha_g1, beta_g2, gamma_g1, gamma_g2, ic)


@dataclass
class Gm17Parameters:
    """gm17/mod.rs:205-250 (serialization commented out upstream; none here)."""

    vk: Gm17VerifyingKey
    a_g1: list
    a_g2: list
    c_1_g1: list
    c_2_g1: list
    gamma_z: rc.Point
    gamma_z_g2: rc.Point
    ab_gamma_z_g1: rc.Point
    gamma2_z2_g1: rc.Point
    gamma2_z_t: list


class SapAssembly(ConstraintSystem):
    """R1CS -> SAP reduction (generator.rs:71-228): every R1CS constraint
    <a,x>*<b,x>=<c,x> becomes one fresh aux y and the squaring pair

        <a-b,x>^2 = y
        <a+b,x>^2 = 4<c,x> + y
    """

    def __init__(self):
        self.num_inputs = 0
        self.num_aux = 0
        self.num_constraints = 0
        self.num_r1cs_aux = 0
        self.num_r1cs_constraints = 0
        self.at_inputs: list[list[tuple[int, int]]] = []
        self.ct_inputs: list[list[tuple[int, int]]] = []
        self.at_aux: list[list[tuple[int, int]]] = []
        self.ct_aux: list[list[tuple[int, int]]] = []

    def alloc(self, annotation=None, f=None) -> Variable:
        idx = self.num_aux
        self.num_aux += 1
        self.num_r1cs_aux += 1
        self.at_aux.append([])
        self.ct_aux.append([])
        return Variable("aux", idx)

    def alloc_input(self, annotation=None, f=None) -> Variable:
        idx = self.num_inputs
        self.num_inputs += 1
        self.at_inputs.append([])
        self.ct_inputs.append([])
        return Variable("input", idx)

    def enforce(self, annotation, a, b, c):
        y = self.alloc()
        self.num_r1cs_aux -= 1

        a_minus_b = a - b
        self._eval_lc(a_minus_b, "at")
        self._eval_lc(LinearCombination([(y, 1)]), "ct")
        self.num_constraints += 1

        a_plus_b = a + b
        c4 = LinearCombination([(v, (4 * co) % R_MOD) for v, co in c.terms] + [(y, 1)])
        self._eval_lc(a_plus_b, "at")
        self._eval_lc(c4, "ct")
        self.num_constraints += 1
        self.num_r1cs_constraints += 1

    def _eval_lc(self, lc: LinearCombination, which: str):
        for var, coeff in lc.terms:
            if which == "at":
                dst = self.at_inputs if var.kind == "input" else self.at_aux
            else:
                dst = self.ct_inputs if var.kind == "input" else self.ct_aux
            dst[var.index].append((coeff % R_MOD, self.num_constraints))


def generate_parameters(
    circuit,
    g1: rc.Point,
    g2: rc.Point,
    alpha: int,
    beta: int,
    gamma: int,
    tau: int,
) -> Gm17Parameters:
    """generator.rs:229-700 with the commented-out tail completed.

    Computes: the gamma^2*Z(t)*t^i G1 query, per-variable gamma*A_i(t) in
    G1/G2, c_1 = (gamma^2*C_i(t) + (alpha+beta)*gamma*A_i(t)) G1,
    c_2 = 2*gamma^2*Z(t)*A_i(t) G1, and the constant elements. The vk takes
    the natural GM17 assembly the reference leaves commented
    (generator.rs:675-686): ic = c_1 query over input variables,
    h_g2 = g2^(gamma*Z(t))."""
    assembly = SapAssembly()
    input_0 = assembly.alloc_input()
    circuit.synthesize(assembly)

    # input 0 constrained as 1*1=1 via a single A-entry (generator.rs:266-289)
    assembly.at_inputs[0].append((1, assembly.num_constraints))
    assembly.num_constraints += 1
    # other inputs: x_i * x_0 = x_i
    for i in range(1, assembly.num_inputs):
        assembly.enforce(
            None,
            LinearCombination([(Variable("input", i), 1)]),
            LinearCombination([(input_0, 1)]),
            LinearCombination([(Variable("input", i), 1)]),
        )

    m, exp = 1, 0
    while m < assembly.num_constraints:
        m *= 2
        exp += 1
        if exp > 28:
            raise ValueError("polynomial degree too large")

    d = Domain(exp)
    # powers of tau evaluations -> Lagrange coefficients (host exact; the
    # device path shares the phase-2 segmented-MSM machinery when needed)
    z_at_tau = (pow(tau, m, R_MOD) - 1) % R_MOD
    # Lagrange coefficients of the evaluation vector (tau^0..tau^(m-1)):
    # iNTT over the scalar field
    taus = [pow(tau, i, R_MOD) for i in range(m)]
    lag = _intt_host(taus, exp)

    gamma2 = (gamma * gamma) % R_MOD
    ab = (alpha + beta) % R_MOD

    gamma2_z_t = []
    coeff0 = (gamma2 * z_at_tau) % R_MOD
    cur = coeff0
    for _ in range(m - 1):
        gamma2_z_t.append(g1.mul(cur))
        cur = (cur * tau) % R_MOD

    nvars = assembly.num_inputs + assembly.num_aux
    a_g1 = [rc.point_zero("g1")] * nvars
    a_g2 = [rc.point_zero("g2")] * nvars
    c_1_g1 = [rc.point_zero("g1")] * nvars
    c_2_g1 = [rc.point_zero("g1")] * nvars

    def eval_poly(terms):
        acc = 0
        for coeff, cons in terms:
            acc = (acc + coeff * lag[cons]) % R_MOD
        return acc

    ats = assembly.at_inputs + assembly.at_aux
    cts = assembly.ct_inputs + assembly.ct_aux
    for i in range(nvars):
        t0 = (eval_poly(ats[i]) * gamma) % R_MOD
        t1 = (eval_poly(cts[i]) * gamma2) % R_MOD
        if t0 != 0:
            a_g1[i] = g1.mul(t0)
            a_g2[i] = g2.mul(t0)
        c1 = (t1 + ab * t0) % R_MOD
        c2 = (2 * gamma * z_at_tau * t0) % R_MOD
        c_1_g1[i] = g1.mul(c1)
        c_2_g1[i] = g1.mul(c2)

    vk = Gm17VerifyingKey(
        h_g2=g2.mul((gamma * z_at_tau) % R_MOD),
        alpha_g1=g1.mul(alpha),
        beta_g2=g2.mul(beta),
        gamma_g1=g1.mul(gamma),
        gamma_g2=g2.mul(gamma),
        ic=[p for p in c_1_g1[: assembly.num_inputs]],
    )
    return Gm17Parameters(
        vk=vk,
        a_g1=a_g1,
        a_g2=a_g2,
        c_1_g1=c_1_g1,
        c_2_g1=c_2_g1,
        gamma_z=g1.mul(gamma),
        gamma_z_g2=g2.mul(gamma),
        ab_gamma_z_g1=g1.mul((ab * gamma) % R_MOD),
        gamma2_z2_g1=g1.mul((gamma * z_at_tau * gamma * z_at_tau) % R_MOD),
        gamma2_z_t=gamma2_z_t,
    )


def _intt_host(evals: list[int], exp: int) -> list[int]:
    """Exact host inverse NTT (natural order), small sizes."""
    d = Domain(exp)
    m = 1 << exp
    wi = pow(d.omega, R_MOD - 2, R_MOD)
    minv = pow(m, R_MOD - 2, R_MOD)
    out = []
    for k in range(m):
        acc = 0
        wk = pow(wi, k, R_MOD)
        cur = 1
        for j in range(m):
            acc = (acc + evals[j] * cur) % R_MOD
            cur = (cur * wk) % R_MOD
        out.append((acc * minv) % R_MOD)
    return out
