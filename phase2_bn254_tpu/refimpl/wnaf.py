"""wNAF scalar recoding + table utilities (host reference).

Parity with /root/reference/pairing/src/wnaf.rs: `wnaf_table` (odd multiples
table, wnaf.rs:4-15), `wnaf_form` (signed-digit recoding, wnaf.rs:18-43),
`wnaf_exp` (evaluation, wnaf.rs:49-71), plus the empirical window
recommendations (ec.rs:970-998, ec.rs:1387-1413).

The TPU compute path uses fixed-window ladders instead (wNAF's per-point
branching does not vectorize), but the recoding is exposed for host-side use
and as the spec for future signed-window device kernels.
"""

from __future__ import annotations

from .curve import Jacobian, Point, affine_to_jacobian, jacobian_add, jacobian_double, jacobian_to_affine, jacobian_zero


def wnaf_table(base: Point, window: int) -> list[Jacobian]:
    """[P, 3P, 5P, ...] - odd multiples up to 2^(window+1) (wnaf.rs:4-15)."""
    table = []
    dbl = jacobian_double(affine_to_jacobian(base))
    cur = affine_to_jacobian(base)
    for _ in range(1 << (window - 1)):
        table.append(cur)
        cur = jacobian_add(cur, dbl)
    return table


def wnaf_form(scalar: int, window: int) -> list[int]:
    """Signed odd digits in (-2^window, 2^window) (wnaf.rs:18-43)."""
    assert scalar >= 0
    out = []
    c = scalar
    while c > 0:
        if c & 1:
            u = c & ((1 << (window + 1)) - 1)
            if u > (1 << window):
                u -= 1 << (window + 1)
            c -= u
            out.append(u)
        else:
            out.append(0)
        c >>= 1
    return out

def wnaf_exp(table: list[Jacobian], wnaf: list[int]) -> Point:
    """Evaluate from the MSB end (wnaf.rs:49-71)."""
    group = "g1" if table else "g1"
    if table:
        group = jacobian_to_affine(table[0]).group
    result = jacobian_zero(group)
    found_one = False
    for n in reversed(wnaf):
        if found_one:
            result = jacobian_double(result)
        if n != 0:
            found_one = True
            if n > 0:
                result = jacobian_add(result, table[n // 2])
            else:
                entry = table[(-n) // 2]
                neg = Jacobian(entry.x, entry.ops.neg(entry.y), entry.z, entry.group)
                result = jacobian_add(result, neg)
    return jacobian_to_affine(result)


def recommended_wnaf_for_scalar(num_bits: int, group: str = "g1") -> int:
    """ec.rs:970-982 (G1) / ec.rs:1373-1385 (G2)."""
    threshold = 130 if group == "g1" else 103
    mid = 34 if group == "g1" else 37
    if num_bits >= threshold:
        return 4
    if num_bits >= mid:
        return 3
    return 2


_G1_RECOMMENDATIONS = [1, 3, 7, 20, 43, 120, 273, 563, 1630, 3128, 7933, 62569]
_G2_RECOMMENDATIONS = [1, 3, 8, 20, 47, 126, 260, 826, 1501, 4555, 84071]


def recommended_wnaf_for_num_scalars(num_scalars: int, group: str = "g1") -> int:
    recs = _G1_RECOMMENDATIONS if group == "g1" else _G2_RECOMMENDATIONS
    ret = 4
    for r in recs:
        if num_scalars > r:
            ret += 1
        else:
            break
    return ret
