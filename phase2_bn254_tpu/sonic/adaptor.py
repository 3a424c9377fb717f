"""Adaptor: run bellman-style R1CS circuits (groth16.cs interface) on a
SONIC constraint system.

Mirrors /root/reference/bellman/src/sonic/sonic/adaptor.rs: every R1CS
`enforce(a, b, c)` becomes one SONIC multiplication gate plus three
enforce_zero constraints tying the gate wires to the linear combinations.
R1CS variables map to SONIC wires: input i -> A(i), aux i -> B(i); the
R1CS ONE (input 0 in this framework) maps to SONIC's A(1).
"""

from __future__ import annotations

from ..groth16 import cs as r1cs
from ..refimpl.field import R_MOD
from .cs import A, B, AssignmentMissing, Circuit, LinearCombination, Variable


def _to_sonic_var(v: r1cs.Variable) -> Variable:
    if v.kind == "input":
        return A(1) if v.index in (0, 1) else A(v.index)
    return B(v.index)


class Adaptor:
    """adaptor.rs:17-146: presents the groth16 ConstraintSystem interface,
    forwards to a sonic ConstraintSystem."""

    def __init__(self, cs):
        self.cs = cs

    def alloc(self, annotation=None, f=None) -> r1cs.Variable:
        var = self.cs.alloc(f if f is not None else _missing)
        return _from_sonic_var(var)

    def alloc_input(self, annotation=None, f=None) -> r1cs.Variable:
        var = self.cs.alloc_input(f if f is not None else _missing)
        return _from_sonic_var(var)

    def enforce(self, annotation, a, b, c) -> None:
        a_lc = _convert(a)
        b_lc = _convert(b)
        c_lc = _convert(c)

        def values():
            return (
                _eval_or_raise(a_lc, self.cs),
                _eval_or_raise(b_lc, self.cs),
                _eval_or_raise(c_lc, self.cs),
            )

        va, vb, vc = self.cs.multiply(values)
        self.cs.enforce_zero(a_lc - va)
        self.cs.enforce_zero(b_lc - vb)
        self.cs.enforce_zero(c_lc - vc)


def _missing():
    raise AssignmentMissing()


def _from_sonic_var(var: Variable) -> r1cs.Variable:
    if var.kind == "A":
        return r1cs.Variable("input", var.index)
    if var.kind == "B":
        return r1cs.Variable("aux", var.index)
    raise AssertionError("sonic alloc returned a C wire")


def _convert(lc: r1cs.LinearCombination) -> LinearCombination:
    out = LinearCombination()
    for v, coeff in lc.terms:
        out = out + (coeff, _to_sonic_var(v))
    return out


def _eval_or_raise(lc: LinearCombination, cs) -> int:
    acc = 0
    for v, coeff in lc.terms:
        acc = (acc + coeff * cs.get_value(v)) % R_MOD
    return acc


class AdaptorCircuit(Circuit):
    """adaptor.rs:148-161: wraps a bellman-style circuit as a sonic one."""

    def __init__(self, circuit):
        self.circuit = circuit

    def synthesize(self, cs) -> None:
        self.circuit.synthesize(Adaptor(cs))


class CountingAdaptor(Adaptor):
    """GeneratorAssembly analog (generator.rs:89-229): counts R1CS
    inputs/aux/constraints while synthesizing."""

    def __init__(self, cs):
        super().__init__(cs)
        self.num_inputs = 0
        self.num_aux = 0
        self.num_constraints = 0

    def alloc_one(self) -> None:
        self.cs.alloc_input(lambda: 1)

    def alloc(self, annotation=None, f=None) -> r1cs.Variable:
        self.num_aux += 1
        return super().alloc(annotation, f)

    def alloc_input(self, annotation=None, f=None) -> r1cs.Variable:
        self.num_inputs += 1
        return super().alloc_input(annotation, f)

    def enforce(self, annotation, a, b, c) -> None:
        self.num_constraints += 1
        super().enforce(annotation, a, b, c)
