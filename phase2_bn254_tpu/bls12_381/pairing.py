"""Exact host-side BLS12-381 optimal ate pairing.

Computes e(P, Q) for P in G1(Fq), Q in G2(Fq2, on the M-twist
y^2 = x^3 + 4(1+u)) with the reference's structure
(/root/reference/pairing/src/bls12_381/mod.rs:45-230): inversion-free
Jacobian steps on the twist (eprint 2010/354 Alg 26/27), sparse
`mul_by_014` line multiplications, and the Frobenius/x-power
final-exponentiation chain.

The chain computes f^(3*(q^12-1)/r) - the *cube* of the plain reduced
value (gcd(3, r) = 1, so it is the same pairing up to a fixed power and
stays non-degenerate; the conventional BLS12 optimization). The value is
pinned by the RELIC known-answer test (tests/mod.rs:4-55) in
tests/test_bls12_381.py.
"""

from __future__ import annotations

from .curve import Point
from .field import (
    BLS_X,
    BLS_X_IS_NEGATIVE,
    FQ12_ONE,
    Fq2,
    Fq6,
    Fq12,
    Q,
    R_MOD,
)

# kept for cross-checks: the chain below produces f^FINAL_EXP
FINAL_EXP = 3 * ((Q**12 - 1) // R_MOD)
assert (Q**12 - 1) % R_MOD == 0


# ---------------------------------------------------------------------------
# sparse Fq12 multiplication: f * (a + b*v + c*v*w)  (mul_by_014,
# fq12.rs positions c0.c0, c0.c1, c1.c1)
# ---------------------------------------------------------------------------

def _fq6_mul_by_01(x: Fq6, a: Fq2, b: Fq2) -> Fq6:
    """(x0 + x1 v + x2 v^2)(a + b v), v^3 = xi (fq6.rs mul_by_01)."""
    return Fq6(
        x.c0 * a + (x.c2 * b).mul_by_nonresidue(),
        x.c0 * b + x.c1 * a,
        x.c1 * b + x.c2 * a,
    )


def _fq6_mul_by_1(x: Fq6, c: Fq2) -> Fq6:
    """(x0 + x1 v + x2 v^2) * c v (fq6.rs mul_by_1)."""
    return Fq6((x.c2 * c).mul_by_nonresidue(), x.c0 * c, x.c1 * c)


def _mul_by_014(f: Fq12, c0: Fq2, c1: Fq2, c4: Fq2) -> Fq12:
    """f * (c0 + c1 v + c4 v w) (fq12.rs:37-68)."""
    aa = _fq6_mul_by_01(f.c0, c0, c1)
    bb = _fq6_mul_by_1(f.c1, c4)
    t = _fq6_mul_by_01(f.c0 + f.c1, c0, c1 + c4)
    return Fq12(aa + bb.mul_by_nonresidue(), t - aa - bb)


# ---------------------------------------------------------------------------
# Miller loop: Alg 26/27 twist-Jacobian steps (mod.rs:176-467)
# ---------------------------------------------------------------------------

def _double_step(X: Fq2, Y: Fq2, Z: Fq2):
    A = X.square()
    B = Y.square()
    C = B.square()
    D = (B + X).square() - A - C
    D = D + D
    E = A + A + A
    G = X + E
    F = E.square()
    Zsq = Z.square()
    X3 = F - D - D
    Z3 = (Z + Y).square() - B - Zsq
    Y3 = (D - X3) * E
    eightC = C + C
    eightC = eightC + eightC
    eightC = eightC + eightC
    Y3 = Y3 - eightC
    c0 = (Z3 * Zsq)
    c0 = c0 + c0  # x p.y
    c1 = -(E * Zsq)
    c1 = c1 + c1  # x p.x
    c2 = G.square() - A - F - (B + B + B + B)
    return (X3, Y3, Z3), (c0, c1, c2)


def _add_step(X: Fq2, Y: Fq2, Z: Fq2, qx: Fq2, qy: Fq2):
    Zsq = Z.square()
    Ysq = qy.square()
    t0 = Zsq * qx
    t1 = ((qy + Z).square() - Ysq - Zsq) * Zsq
    t2 = t0 - X
    t3 = t2.square()
    t4 = t3 + t3
    t4 = t4 + t4
    t5 = t4 * t2
    t6 = t1 - Y - Y
    t9 = t6 * qx
    t7 = t4 * X
    X3 = t6.square() - t5 - t7 - t7
    Z3 = (Z + t2).square() - Zsq - t3
    t10 = qy + Z3
    t8 = (t7 - X3) * t6
    t0b = Y * t5
    Y3 = t8 - (t0b + t0b)
    t10 = t10.square() - Ysq - Z3.square()
    t9 = t9 + t9 - t10
    c0 = Z3 + Z3  # x p.y
    c1 = -(t6 + t6)  # x p.x
    c2 = t9
    return (X3, Y3, Z3), (c0, c1, c2)


def _ell(f: Fq12, coeffs, px: int, py: int) -> Fq12:
    """mod.rs:61-74: scale c0 by p.y, c1 by p.x, then mul_by_014."""
    c0, c1, c2 = coeffs
    return _mul_by_014(f, c2, Fq2(c1.c0 * px, c1.c1 * px), Fq2(c0.c0 * py, c0.c1 * py))


def miller_loop(p: Point, q: Point) -> Fq12:
    """f_{|x|,Q}(P), conjugated because x < 0 (mod.rs:45-107)."""
    if p.inf or q.inf:
        return FQ12_ONE
    px, py = p.x, p.y
    T = (q.x, q.y, Fq2(1, 0))
    f = FQ12_ONE
    # the reference iterates bits of BLS_X >> 1 (skipping the leading one),
    # does ell(dbl) [+ ell(add)] then squares, with one final non-squared
    # ell(dbl) after the loop
    for bit in bin(BLS_X >> 1)[3:]:
        T, coeffs = _double_step(*T)
        f = _ell(f, coeffs, px, py)
        if bit == "1":
            T, coeffs = _add_step(*T, q.x, q.y)
            f = _ell(f, coeffs, px, py)
        f = f.square()
    T, coeffs = _double_step(*T)
    f = _ell(f, coeffs, px, py)
    if BLS_X_IS_NEGATIVE:
        f = f.conjugate()
    return f


def _exp_by_x(f: Fq12) -> Fq12:
    out = f.pow(BLS_X)
    return out.conjugate() if BLS_X_IS_NEGATIVE else out


def final_exponentiation(f: Fq12) -> Fq12:
    """The reference's chain (mod.rs:109-190): easy part then the BLS12
    x-power ladder; equals f^(3*(q^12-1)/r)."""
    r = f.conjugate() * f.inverse()
    r = r.frobenius(2) * r

    y0 = r.square()
    y1 = _exp_by_x(y0)
    # exp by x >> 1, without the sign flip semantics change: BLS_X >> 1
    y2 = y1.pow(BLS_X >> 1)
    if BLS_X_IS_NEGATIVE:
        y2 = y2.conjugate()
    y3 = r.conjugate()
    y1 = (y1 * y3).conjugate() * y2
    y2 = _exp_by_x(y1)
    y3 = _exp_by_x(y2)
    y3 = y3 * y1.conjugate()
    y1 = y1.frobenius(3)
    y2f = y2.frobenius(2)
    y1 = y1 * y2f
    y2 = _exp_by_x(y3) * y0 * r
    y1 = y1 * y2
    return y1 * y3.frobenius(1)


def pairing(p: Point, q: Point) -> Fq12:
    """Reduced optimal ate pairing e(P, Q)."""
    return final_exponentiation(miller_loop(p, q))


def same_ratio(pair_g1: tuple[Point, Point], pair_g2: tuple[Point, Point]) -> bool:
    """e(a1, b2) == e(a2, b1) - the ceremony's ratio-equality primitive,
    provided for engine parity with the BN254 backend."""
    (a1, a2), (b1, b2) = pair_g1, pair_g2
    return pairing(a1, b2) == pairing(a2, b1)
