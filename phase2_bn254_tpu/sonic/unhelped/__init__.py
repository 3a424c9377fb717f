"""SONIC unhelped (succinct) layer: signatures of correct computation.

The helped protocol trusts a "helper" to evaluate s(z, y); this layer
replaces the helper with succinct arguments
(/root/reference/bellman/src/sonic/unhelped/):

s(X, Y) factors as s2 + s1, where s2(X, Y) = sum_i (Y^i + Y^{-i}) X^i is
verifier-evaluable (`s2`), and s1 is proven with wellformedness
(`wellformed`), grand-product (`grand_product`) and permutation
(`permutation`) arguments, glued per-proof by `aggregate` and checked by
`verifier.SuccinctMultiVerifier`.
"""

from __future__ import annotations

from ...refimpl.field import R_MOD


def mul_add_polynomials(acc: list[int], other, scalar: int) -> None:
    """acc[i] += other[i] * scalar, in place (util.rs:255-280)."""
    assert len(acc) == len(other)
    for i, v in enumerate(other):
        acc[i] = (acc[i] + v * scalar) % R_MOD


def scaled(poly, scalar: int) -> list[int]:
    return [v * scalar % R_MOD for v in poly]


from .s2 import S2Eval, S2Proof  # noqa: E402
from .wellformed import (  # noqa: E402
    WellformednessArgument,
    WellformednessProof,
    WellformednessSignature,
)
from .grand_product import (  # noqa: E402
    GrandProductArgument,
    GrandProductProof,
    GrandProductSignature,
)
from .permutation import (  # noqa: E402
    PermutationArgument,
    PermutationArgumentProof,
    PermutationProof,
    SpecializedSRS,
)
from .permutation_structure import PermutationStructure  # noqa: E402
from .aggregate import SuccinctAggregate, create_aggregate  # noqa: E402
from .verifier import SuccinctMultiVerifier  # noqa: E402
