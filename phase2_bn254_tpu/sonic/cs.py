"""SONIC constraint system: A/B/C wire variables, linear combinations over
the three wire vectors of the multiplication gates, and the Backend /
SynthesisDriver abstractions the provers and verifiers plug into.

Mirrors the surface of /root/reference/bellman/src/sonic/cs/mod.rs and
cs/lc.rs. Python idiom: coefficients are plain ints mod r (the reference's
`Coeff` enum is a Rust arithmetic-dispatch optimization), variables are a
frozen dataclass, and backends are duck-typed classes with no-op defaults.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..refimpl.field import R_MOD


class SynthesisError(Exception):
    pass


class AssignmentMissing(SynthesisError):
    pass


@dataclass(frozen=True)
class Variable:
    """One wire of multiplication gate `index` (1-based); kind selects the
    a, b or c vector (cs/lc.rs:95-110)."""

    kind: str  # "A" | "B" | "C"
    index: int

    def __repr__(self):
        return f"{self.kind}({self.index})"


def A(i: int) -> Variable:
    return Variable("A", i)


def B(i: int) -> Variable:
    return Variable("B", i)


def C(i: int) -> Variable:
    return Variable("C", i)


ONE = A(1)


class LinearCombination:
    """Sparse sum of (Variable, coeff mod r) terms (cs/lc.rs:8-93)."""

    __slots__ = ("terms",)

    def __init__(self, terms=None):
        self.terms: list[tuple[Variable, int]] = list(terms or [])

    @classmethod
    def zero(cls) -> "LinearCombination":
        return cls()

    def __add__(self, other):
        if isinstance(other, Variable):
            return LinearCombination(self.terms + [(other, 1)])
        if isinstance(other, tuple):
            coeff, var = other
            return LinearCombination(self.terms + [(var, coeff % R_MOD)])
        if isinstance(other, LinearCombination):
            return LinearCombination(self.terms + other.terms)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, Variable):
            return LinearCombination(self.terms + [(other, R_MOD - 1)])
        if isinstance(other, tuple):
            coeff, var = other
            return LinearCombination(self.terms + [(var, (-coeff) % R_MOD)])
        if isinstance(other, LinearCombination):
            return LinearCombination(
                self.terms + [(v, (-c) % R_MOD) for v, c in other.terms]
            )
        return NotImplemented


class Backend:
    """Receives synthesis events (cs/mod.rs:41-68). `LinearConstraintIndex`
    is whatever new_linear_constraint returns (a y-power, a q index, ...)."""

    def get_var(self, var: Variable):
        return None

    def set_var(self, var: Variable, value_fn) -> None:
        pass

    def new_multiplication_gate(self) -> None:
        pass

    def new_linear_constraint(self):
        raise NotImplementedError

    def insert_coefficient(self, var: Variable, coeff: int, y) -> None:
        pass

    def get_for_q(self, q: int):
        raise NotImplementedError

    def new_k_power(self, index: int) -> None:
        pass


class ConstraintSystem:
    """The synthesis interface circuits are written against
    (cs/mod.rs:14-37): alloc / alloc_input / enforce_zero / multiply."""

    ONE = ONE

    def alloc(self, value_fn) -> Variable:
        raise NotImplementedError

    def alloc_input(self, value_fn) -> Variable:
        raise NotImplementedError

    def enforce_zero(self, lc: LinearCombination) -> None:
        raise NotImplementedError

    def multiply(self, values_fn) -> tuple[Variable, Variable, Variable]:
        raise NotImplementedError

    def get_value(self, var: Variable):
        raise AssignmentMissing


class Circuit:
    """cs/mod.rs:10-12."""

    def synthesize(self, cs: ConstraintSystem) -> None:
        raise NotImplementedError
