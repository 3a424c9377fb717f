"""SONIC synthesizers and standard synthesis backends.

Mirrors /root/reference/bellman/src/sonic/sonic/constraint_systems.rs,
synthesis_drivers.rs and backends.rs:

* `Synthesizer` - assigning synthesizer: pairs consecutive allocs into one
  multiplication gate (a, b wires; c = a*b).
* `NonassigningSynthesizer` - same gate bookkeeping without witness values
  (for preprocessing / S-polynomial evaluation).
* `PermutationSynthesizer` - the M=3 slot-tracking synthesizer that keeps
  every wire in at most M linear constraints and every linear constraint at
  most M wires wide, creating ephemeral equality wires as needed; this is
  the form the succinct (unhelped) protocol requires.
* drivers `basic_synthesize` / `nonassigning_synthesize` /
  `permutation3_synthesize`: alloc the ONE input then run the circuit.
* backends `Preprocess` (n, q, k_map), `Wires` (witness vectors),
  `CountN`, `CountNandQ`.
"""

from __future__ import annotations

from .cs import (
    A,
    B,
    C,
    AssignmentMissing,
    Backend,
    ConstraintSystem,
    LinearCombination,
    Variable,
)
from ..refimpl.field import R_MOD

M = 3  # permutation slots per wire (sonic/mod.rs:11)


class _BaseSynthesizer(ConstraintSystem):
    """Shared alloc pairing + gate/constraint counters."""

    def __init__(self, backend: Backend):
        self.backend = backend
        self.current_variable: int | None = None
        self.q = 0
        self.n = 0

    def _new_gate(self) -> int:
        self.n += 1
        self.backend.new_multiplication_gate()
        return self.n

    def get_value(self, var: Variable):
        v = self.backend.get_var(var)
        if v is None:
            raise AssignmentMissing(str(var))
        return v


def _pair_second_alloc(backend: Backend, index: int, value_fn):
    """Assign the b wire of a half-open gate and its c = a*b product.

    The closures are only evaluated if the backend actually consumes values
    (witness-free backends like Preprocess/SxEval ignore set_var), matching
    constraint_systems.rs:119-151."""
    var_a, var_b, var_c = A(index), B(index), C(index)
    state = {}

    def eval_b():
        value_a = backend.get_var(var_a)
        if value_a is None:
            raise AssignmentMissing(str(var_a))
        value_b = value_fn()
        state["c"] = value_a * value_b % R_MOD
        return value_b

    def eval_c():
        if "c" not in state:
            raise AssignmentMissing(str(var_c))
        return state["c"]

    backend.set_var(var_b, eval_b)
    backend.set_var(var_c, eval_c)
    return var_b


def _set_gate_values(backend: Backend, index: int, values_fn):
    """Lazily assign all three wires of a fresh gate from one closure
    (constraint_systems.rs:186-218)."""
    state = {}

    def eval_a():
        a, b, c = values_fn()
        state["b"], state["c"] = b, c
        return a

    def _eval(key):
        def run():
            if key not in state:
                raise AssignmentMissing(key)
            return state[key]

        return run

    backend.set_var(A(index), eval_a)
    backend.set_var(B(index), _eval("b"))
    backend.set_var(C(index), _eval("c"))


class Synthesizer(_BaseSynthesizer):
    """constraint_systems.rs:107-232 (assigning)."""

    def alloc(self, value_fn) -> Variable:
        if self.current_variable is not None:
            index = self.current_variable
            self.current_variable = None
            return _pair_second_alloc(self.backend, index, value_fn)
        index = self._new_gate()
        self.backend.set_var(A(index), value_fn)
        self.current_variable = index
        return A(index)

    def alloc_input(self, value_fn) -> Variable:
        var = self.alloc(value_fn)
        self.enforce_zero(LinearCombination() + var)
        self.backend.new_k_power(self.q)
        return var

    def enforce_zero(self, lc: LinearCombination) -> None:
        self.q += 1
        y = self.backend.new_linear_constraint()
        for var, coeff in lc.terms:
            self.backend.insert_coefficient(var, coeff, y)

    def multiply(self, values_fn):
        index = self._new_gate()
        _set_gate_values(self.backend, index, values_fn)
        return A(index), B(index), C(index)


class NonassigningSynthesizer(_BaseSynthesizer):
    """constraint_systems.rs:15-105: witness-free twin of Synthesizer."""

    def alloc(self, value_fn=None) -> Variable:
        if self.current_variable is not None:
            index = self.current_variable
            self.current_variable = None
            return B(index)
        index = self._new_gate()
        self.current_variable = index
        return A(index)

    def alloc_input(self, value_fn=None) -> Variable:
        var = self.alloc(value_fn)
        self.enforce_zero(LinearCombination() + var)
        self.backend.new_k_power(self.q)
        return var

    def enforce_zero(self, lc: LinearCombination) -> None:
        self.q += 1
        y = self.backend.new_linear_constraint()
        for var, coeff in lc.terms:
            self.backend.insert_coefficient(var, coeff, y)

    def multiply(self, values_fn=None):
        index = self._new_gate()
        return A(index), B(index), C(index)


class PermutationSynthesizer(_BaseSynthesizer):
    """constraint_systems.rs:236-637: the M-slot synthesizer.

    Each wire tracks which of the M permutation polynomials ("slots") it
    occupies, as (coeff, q) pairs. enforce_zero recursively splits over-wide
    linear combinations with ephemeral wires and relocates slot collisions
    by duplicating wires and enforcing equality."""

    def __init__(self, backend: Backend):
        super().__init__(backend)
        # slot tables per wire vector: list of [Optional[(coeff, q)]] * M
        self.a: list[list] = []
        self.b: list[list] = []
        self.c: list[list] = []

    # -- ConstraintSystem surface ------------------------------------------

    def alloc(self, value_fn) -> Variable:
        if self.current_variable is not None:
            index = self.current_variable
            self.current_variable = None
            return _pair_second_alloc(self.backend, index, value_fn)
        index = self._new_gate()
        self.a.append([None] * M)
        self.b.append([None] * M)
        self.c.append([None] * M)
        self.backend.set_var(A(index), value_fn)
        self.current_variable = index
        return A(index)

    def alloc_input(self, value_fn) -> Variable:
        var = self.alloc(value_fn)
        # the fresh variable has all slots free, so this adds exactly one
        # linear constraint
        self.enforce_zero(LinearCombination() + var)
        self.backend.new_k_power(self.q)
        return var

    def enforce_zero(self, lc: LinearCombination) -> None:
        self._enforce_equals(list(lc.terms), None)

    def multiply(self, values_fn):
        index = self._new_gate()
        self.a.append([None] * M)
        self.b.append([None] * M)
        self.c.append([None] * M)
        _set_gate_values(self.backend, index, values_fn)
        return A(index), B(index), C(index)

    # -- slot machinery ----------------------------------------------------

    def _slots(self, var: Variable) -> list:
        vec = {"A": self.a, "B": self.b, "C": self.c}[var.kind]
        return vec[var.index - 1]

    def _enforce_equals(self, terms: list, rhs: Variable | None):
        """Enforce sum(terms) == rhs (or 0), returning the lhs value when
        rhs is involved so the caller can assign it
        (constraint_systems.rs:443-531)."""
        self.q += 1
        q = self.q
        y = self.backend.new_linear_constraint()
        slots_available = [True] * M
        num_slots_available = M
        current_value = 0 if rhs is not None else None

        if rhs is not None:
            self._emplace_variable(slots_available, y, rhs, R_MOD - 1, q)
            num_slots_available -= 1

        i = 0
        while i < len(terms):
            var, coeff = terms[i]
            assert num_slots_available > 0
            if num_slots_available == 1 and i + 1 < len(terms):
                # out of slots: roll the remaining terms into an ephemeral
                # wire (which has all M slots free, so the recursion cannot
                # re-trigger the duplication path on it)
                ephemeral = self.alloc(lambda: 0)
                value = self._enforce_equals(terms[i:], ephemeral)

                def _value():
                    if value is None:
                        raise AssignmentMissing()
                    return value

                self.backend.set_var(ephemeral, _value)
                self._fix_variable_assignment(ephemeral)
                self._emplace_variable(slots_available, y, ephemeral, 1, q)
                num_slots_available -= 1
                if current_value is not None and value is not None:
                    current_value = (current_value + value) % R_MOD
                else:
                    current_value = None
                assert num_slots_available == 0
                return current_value
            self._emplace_variable(slots_available, y, var, coeff, q)
            num_slots_available -= 1
            if current_value is not None:
                v = self.backend.get_var(var)
                if v is None:
                    current_value = None
                else:
                    current_value = (current_value + coeff * v) % R_MOD
            i += 1
        return current_value

    def _emplace_variable(self, slots_available, y, var, coeff, q):
        """constraint_systems.rs:535-586."""
        wire_slots = [s is None for s in self._slots(var)]
        available_i = None
        for i in range(M):
            if slots_available[i]:
                if available_i is None:
                    available_i = i
                if wire_slots[i]:
                    self._emplace_slot(var, i, coeff, y, q)
                    slots_available[i] = False
                    return
        assert available_i is not None, "always at least one slot open"

        # slot available_i is free in the constraint but taken in the wire:
        # duplicate the wire into an ephemeral with the same value
        ephemeral_value = self.backend.get_var(var)
        ephemeral = self.alloc(
            (lambda: ephemeral_value)
            if ephemeral_value is not None
            else self._missing
        )
        self._emplace_slot(ephemeral, available_i, coeff, y, q)
        slots_available[available_i] = False

        # free a slot in the original wire by moving one term over
        free_i = (available_i + 1) % M
        self._move_slot(free_i, var, ephemeral)

        # ephemeral occupies available_i and maybe free_i; var has free_i
        # open; M>=3 leaves a distinct third slot so equality is enforceable
        self._enforce_equals([(var, 1), (ephemeral, R_MOD - 1)], None)

    @staticmethod
    def _missing():
        raise AssignmentMissing()

    def _move_slot(self, slot, src: Variable, dst: Variable):
        """constraint_systems.rs:589-612."""
        src_slots = self._slots(src)
        if src_slots[slot] is None:
            return
        coeff, q = src_slots[slot]
        src_slots[slot] = None
        y = self.backend.get_for_q(q)
        self.backend.insert_coefficient(src, (-coeff) % R_MOD, y)
        self._slots(dst)[slot] = (coeff, q)
        self.backend.insert_coefficient(dst, coeff, y)

    def _emplace_slot(self, var, slot_index, coeff, y, q):
        self._slots(var)[slot_index] = (coeff, q)
        self.backend.insert_coefficient(var, coeff, y)

    def _fix_variable_assignment(self, var: Variable):
        """Recompute the c-wire of var's gate after its value changed
        (constraint_systems.rs:627-637)."""
        a_value = self.backend.get_var(A(var.index))
        b_value = self.backend.get_var(B(var.index))
        if a_value is None or b_value is None:
            return
        self.backend.set_var(C(var.index), lambda: a_value * b_value % R_MOD)


# ---------------------------------------------------------------------------
# synthesis drivers (synthesis_drivers.rs)
# ---------------------------------------------------------------------------

def _drive(synth_cls, backend: Backend, circuit) -> None:
    cs = synth_cls(backend)
    one = cs.alloc_input(lambda: 1)
    assert one == A(1), "one variable is incorrect"
    circuit.synthesize(cs)


def basic_synthesize(backend: Backend, circuit) -> None:
    _drive(Synthesizer, backend, circuit)


def nonassigning_synthesize(backend: Backend, circuit) -> None:
    _drive(NonassigningSynthesizer, backend, circuit)


def permutation3_synthesize(backend: Backend, circuit) -> None:
    _drive(PermutationSynthesizer, backend, circuit)


BASIC = basic_synthesize
NONASSIGNING = nonassigning_synthesize
PERMUTATION3 = permutation3_synthesize


# ---------------------------------------------------------------------------
# standard backends (sonic/backends.rs)
# ---------------------------------------------------------------------------

class Preprocess(Backend):
    """Counts gates/constraints and records k_map (backends.rs:11-56)."""

    def __init__(self):
        self.k_map: list[int] = []
        self.n = 0
        self.q = 0

    def new_k_power(self, index: int) -> None:
        self.k_map.append(index)

    def new_multiplication_gate(self) -> None:
        self.n += 1

    def new_linear_constraint(self):
        self.q += 1

    def get_for_q(self, q: int):
        return None


class Wires(Backend):
    """Collects the witness vectors a, b, c (backends.rs:58-122)."""

    def __init__(self):
        self.a: list[int] = []
        self.b: list[int] = []
        self.c: list[int] = []

    def new_linear_constraint(self):
        return None

    def get_for_q(self, q: int):
        return None

    def new_multiplication_gate(self) -> None:
        self.a.append(0)
        self.b.append(0)
        self.c.append(0)

    def _vec(self, var: Variable):
        return {"A": self.a, "B": self.b, "C": self.c}[var.kind]

    def get_var(self, var: Variable):
        return self._vec(var)[var.index - 1]

    def set_var(self, var: Variable, value_fn) -> None:
        self._vec(var)[var.index - 1] = value_fn() % R_MOD


class CountN(Backend):
    """backends.rs:146-173."""

    def __init__(self):
        self.n = 0

    def new_linear_constraint(self):
        return None

    def get_for_q(self, q: int):
        return None

    def new_multiplication_gate(self) -> None:
        self.n += 1


class CountNandQ(Backend):
    """backends.rs:124-144."""

    def __init__(self):
        self.n = 0
        self.q = 0

    def new_multiplication_gate(self) -> None:
        self.n += 1

    def new_linear_constraint(self):
        self.q += 1

    def get_for_q(self, q: int):
        return None
