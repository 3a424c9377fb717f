"""Extract the s1(X, Y) permutation structure from a circuit synthesized
through the M=3 permutation synthesizer.

Each of the M slots becomes one permutation polynomial over 3n+1 variable
positions (A gates reversed at the front, the X^0 slot empty, then B and C
gates); the slot's (coeff, q) entries define sigma. Mirrors
/root/reference/bellman/src/sonic/unhelped/permutation_structure.rs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...refimpl import curve as rc
from .. import SRS
from ..synthesis import M, PermutationSynthesizer, Preprocess
from ..cs import A
from .permutation import (
    PermutationArgument,
    SignatureOfCorrectComputation,
    SpecializedSRS,
)
from .s2 import S2Eval, S2Proof


@dataclass
class PermutationStructure:
    """permutation_structure.rs:24-31."""

    n: int
    q: int
    a: list[list]
    b: list[list]
    c: list[list]

    def calculate_s2_commitment_value(self, srs: SRS) -> rc.Point:
        return S2Eval.calculate_commitment_element(self.n, srs)

    def calculate_s2_proof(self, x: int, y: int, srs: SRS) -> S2Proof:
        return S2Eval(self.n).evaluate(x, y, srs)

    def _scan_slots(self, keep_coeff_at_place: bool):
        """Shared walk over the slot tables: returns (coeffs, permutations)
        of length 3n+1 per non-empty slot. keep_coeff_at_place places
        coefficients at index place-1 (create_permutation_vectors) rather
        than at the variable position (create_inverse_permutation_vectors)."""
        n = self.n
        size = 3 * n + 1
        coeffs = [[0] * size for _ in range(M)]
        perms = [[0] * size for _ in range(M)]
        not_empty = [False] * M

        def place_all(table, position_of):
            for gate_index, info in enumerate(table):
                for i in range(M):
                    if info[i] is None:
                        continue
                    coeff, place = info[i]
                    assert place != 0
                    pos = position_of(gate_index)
                    if coeff == 0:
                        continue
                    not_empty[i] = True
                    coeffs[i][place - 1 if keep_coeff_at_place else pos] = coeff
                    perms[i][pos] = place

        place_all(self.a, lambda g: (n - 1) - g)  # A: reversed at the front
        place_all(self.b, lambda g: (n + 1) + g)
        place_all(self.c, lambda g: (2 * n + 1) + g)

        # drop empty slots
        for i in reversed(range(M)):
            if not not_empty[i]:
                coeffs.pop(i)
                perms.pop(i)
        assert coeffs, "circuit has no constraints"

        # complete each sigma into a full permutation of 1..3n+1 by routing
        # unused images onto the zero positions
        for perm in perms:
            used = [False] * (size + 1)
            for p in perm:
                if p:
                    used[p] = True
            fill = (i for i in range(1, size + 1) if not used[i])
            for idx, p in enumerate(perm):
                if p == 0:
                    perm[idx] = next(fill)
        return coeffs, perms

    def create_permutation_vectors(self):
        """permutation_structure.rs:246-411: coefficients live at index
        sigma(i)-1, so s_j(X, y)[i] = coeff[sigma(i)-1] y^{sigma(i)}."""
        return self._scan_slots(keep_coeff_at_place=True)

    def create_inverse_permutation_vectors(self):
        """permutation_structure.rs:83-244: coefficients at the variable
        position itself."""
        coeffs, perms = self._scan_slots(keep_coeff_at_place=False)
        n = self.n
        for c, p in zip(coeffs, perms):
            assert c[n] == 0, "no constant term allowed"
        return coeffs, perms

    def create_permutation_special_reference(self, srs: SRS) -> SpecializedSRS:
        """permutation_structure.rs:438-448."""
        coeffs, perms = self.create_permutation_vectors()
        return PermutationArgument.make_specialized_srs(coeffs, perms, srs)

    def make_signature(self, y: int, z: int, srs: SRS) -> SignatureOfCorrectComputation:
        """permutation_structure.rs:451-494."""
        coeffs, perms = self.create_permutation_vectors()
        return PermutationArgument.make_signature(coeffs, perms, y, z, srs)


def create_permutation_structure(circuit) -> PermutationStructure:
    """permutation_structure.rs:33-69: synthesize through the permutation
    synthesizer, keep the slot tables."""
    backend = Preprocess()
    cs = PermutationSynthesizer(backend)
    one = cs.alloc_input(lambda: 1)
    assert one == A(1), "one variable is incorrect"
    circuit.synthesize(cs)
    return PermutationStructure(n=backend.n, q=backend.q, a=cs.a, b=cs.b, c=cs.c)
