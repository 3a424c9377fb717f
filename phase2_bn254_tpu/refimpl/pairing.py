"""Host-side BN254 pairing for ceremony ratio checks.

The ceremony uses pairings ONLY inside boolean `same_ratio` checks
(/root/reference/powersoftau/src/utils.rs:151-159); pairing values are never
serialized, so bit-parity with the reference's optimal-ate implementation
(/root/reference/pairing/src/bn256/mod.rs:57-226) is not required - any
non-degenerate bilinear pairing gives identical accept/reject behavior.

We implement the reduced Tate pairing e(P, Q) = f_{r,P}(psi(Q))^((q^12-1)/r)
with denominator elimination, over the tower

    Fq2  = Fq[u]/(u^2+1)
    Fq12 = Fq2[w]/(w^6 - xi),  xi = 9 + u

and the sextic untwist psi(x', y') = (x' w^2, y' w^3) mapping the twist
E'/Fq2: y^2 = x^3 + 3/xi (where G2 lives) into E/Fq12.

Verticals evaluate into the subfield Fq2[w^2] = Fq6, which the final
exponentiation kills ((q^6-1) | (q^12-1)/r), so they are omitted.
"""

from __future__ import annotations

from .field import FQ2_ONE, FQ2_ZERO, Fq2, Q, R_MOD
from .curve import Point

# ---------------------------------------------------------------------------
# Fq12 = Fq2[w]/(w^6 - xi): elements are tuples of 6 Fq2 coefficients
# ---------------------------------------------------------------------------

XI = Fq2(9, 1)

Fq12 = tuple  # tuple[Fq2 x 6]

FQ12_ONE: Fq12 = (FQ2_ONE,) + (FQ2_ZERO,) * 5
FQ12_ZERO: Fq12 = (FQ2_ZERO,) * 6


def fq12_mul(a: Fq12, b: Fq12) -> Fq12:
    c = [FQ2_ZERO] * 11
    for i in range(6):
        ai = a[i]
        if ai.is_zero():
            continue
        for j in range(6):
            if b[j].is_zero():
                continue
            c[i + j] = c[i + j] + ai * b[j]
    out = list(c[:6])
    for k in range(6, 11):
        out[k - 6] = out[k - 6] + c[k] * XI
    return tuple(out)


def fq12_sqr(a: Fq12) -> Fq12:
    return fq12_mul(a, a)


def fq12_conj_w(a: Fq12) -> Fq12:
    """w -> -w conjugation (the q^6 Frobenius): negate odd coefficients."""
    return tuple(ci if i % 2 == 0 else -ci for i, ci in enumerate(a))


def _fq6_inv(b0: Fq2, b1: Fq2, b2: Fq2) -> tuple[Fq2, Fq2, Fq2]:
    """Inverse in Fq2[v]/(v^3 - xi) by the standard norm formula."""
    c0 = b0.square() - b1 * b2 * XI
    c1 = b2.square() * XI - b0 * b1
    c2 = b1.square() - b0 * b2
    t = (b0 * c0 + (b2 * c1 + b1 * c2) * XI).inverse()
    return c0 * t, c1 * t, c2 * t


def fq12_inv(a: Fq12) -> Fq12:
    """a^-1 = conj(a) / (a * conj(a)); the product lies in Fq2[w^2] = Fq6."""
    ac = fq12_conj_w(a)
    n = fq12_mul(a, ac)
    assert n[1].is_zero() and n[3].is_zero() and n[5].is_zero()
    i0, i1, i2 = _fq6_inv(n[0], n[2], n[4])
    ninv = (i0, FQ2_ZERO, i1, FQ2_ZERO, i2, FQ2_ZERO)
    return fq12_mul(ac, ninv)


# Frobenius coefficients: (Sum a_i w^i)^q = Sum frob(a_i) * G_i * w^i,
# G_i = xi^(i*(q-1)/6)
_FROB_GAMMA = [XI.pow(i * (Q - 1) // 6) for i in range(6)]


def fq12_frobenius(a: Fq12, power: int = 1) -> Fq12:
    out = a
    for _ in range(power):
        out = tuple(out[i].conjugate() * _FROB_GAMMA[i] for i in range(6))
    return out


def fq12_pow(a: Fq12, e: int) -> Fq12:
    result = FQ12_ONE
    base = a
    while e > 0:
        if e & 1:
            result = fq12_mul(result, base)
        base = fq12_sqr(base)
        e >>= 1
    return result


# ---------------------------------------------------------------------------
# Tate pairing
# ---------------------------------------------------------------------------

def _psi(q: Point) -> tuple[Fq12, Fq12]:
    """Untwist a G2 point into E(Fq12): (x w^2, y w^3)."""
    xw2 = (FQ2_ZERO, FQ2_ZERO, q.x, FQ2_ZERO, FQ2_ZERO, FQ2_ZERO)
    yw3 = (FQ2_ZERO, FQ2_ZERO, FQ2_ZERO, q.y, FQ2_ZERO, FQ2_ZERO)
    return xw2, yw3


def _fq12_scale_fq(a: Fq12, s: int) -> Fq12:
    return tuple(ci * s for ci in a)


def _line(fx: int, fy: int, lam: int, xq: Fq12, yq: Fq12) -> Fq12:
    """Evaluate the line through (fx, fy) with Fq slope lam at (xq, yq):
    (yq - fy) - lam * (xq - fx). All Fq-coefficient terms sit in w^0."""
    const = (lam * fx - fy) % Q  # -fy + lam*fx
    out = list(yq)
    # subtract lam * xq
    lx = _fq12_scale_fq(xq, lam)
    out = [o - l for o, l in zip(out, lx)]
    out[0] = out[0] + Fq2(const, 0)
    return tuple(out)


_FINAL_EXP = (Q**12 - 1) // R_MOD
_HARD_EXP = (Q**4 - Q**2 + 1) // R_MOD


def final_exponentiation(f: Fq12) -> Fq12:
    """f^((q^12-1)/r) = easy part (q^6-1)(q^2+1) then hard part."""
    # f^(q^6 - 1)
    t = fq12_mul(fq12_conj_w(f), fq12_inv(f))
    # ^(q^2 + 1)
    t = fq12_mul(fq12_frobenius(t, 2), t)
    # hard part (q^4 - q^2 + 1)/r (direct; refimpl is not perf-critical)
    return fq12_pow(t, _HARD_EXP)


def pairing(p: Point, q: Point) -> Fq12:
    """Reduced Tate pairing; accepts infinity (returns 1)."""
    if p.is_zero() or q.is_zero():
        return FQ12_ONE
    return final_exponentiation(_miller_safe(p, q))


def _miller_safe(p: Point, q: Point) -> Fq12:
    """Miller loop with the T == +-P corner cases handled explicitly."""
    xq, yq = _psi(q)
    f = FQ12_ONE
    tx, ty, tinf = p.x, p.y, False
    bits = bin(R_MOD)[3:]
    for b in bits:
        if not tinf:
            if ty == 0:
                # vertical tangent; doubling gives O, line is vertical: elide
                tinf = True
                f = fq12_sqr(f)
            else:
                lam = (3 * tx * tx * pow(2 * ty, -1, Q)) % Q
                f = fq12_mul(fq12_sqr(f), _line(tx, ty, lam, xq, yq))
                nx = (lam * lam - 2 * tx) % Q
                ny = (lam * (tx - nx) - ty) % Q
                tx, ty = nx, ny
        else:
            f = fq12_sqr(f)
        if b == "1":
            if tinf:
                tx, ty, tinf = p.x, p.y, False
            elif tx == p.x:
                if ty == p.y:
                    # doubling disguised as add (cannot happen for prime r)
                    lam = (3 * tx * tx * pow(2 * ty, -1, Q)) % Q
                    f = fq12_mul(f, _line(tx, ty, lam, xq, yq))
                    nx = (lam * lam - 2 * tx) % Q
                    ny = (lam * (tx - nx) - ty) % Q
                    tx, ty = nx, ny
                else:
                    # T == -P: vertical line, elided; T becomes O
                    tinf = True
            else:
                lam = ((ty - p.y) * pow(tx - p.x, -1, Q)) % Q
                f = fq12_mul(f, _line(tx, ty, lam, xq, yq))
                nx = (lam * lam - tx - p.x) % Q
                ny = (lam * (tx - nx) - ty) % Q
                tx, ty = nx, ny
    return f


# ---------------------------------------------------------------------------
# Optimal ate pairing (the reference's pairing, bn256/mod.rs:29-226)
#
# The reduced optimal-ate VALUE is canonical for BN curves, so a from-scratch
# textbook implementation reproduces the reference's Fq12 output exactly
# (needed by the snarkjs `vk_alfabeta_12` JSON export,
# /root/reference/phase2/src/circom_circuit.rs:303-317). The Tate pairing
# above differs by a fixed power coprime to r - fine for same_ratio booleans,
# not for serialized values.
# ---------------------------------------------------------------------------

BN_U = 4965661367192848881  # mod.rs:29
ATE_LOOP = 6 * BN_U + 2


def _emb_point(q: Point) -> tuple[Fq12, Fq12]:
    return _psi(q)


def _fq12_of_fq(v: int) -> Fq12:
    return (Fq2(v, 0),) + (FQ2_ZERO,) * 5


def _emb_double(ax: Fq12, ay: Fq12) -> tuple[Fq12, Fq12, Fq12]:
    """Affine doubling in E(Fq12); returns (x3, y3, lambda)."""
    three_x2 = fq12_mul(fq12_mul(ax, ax), _fq12_of_fq(3))
    lam = fq12_mul(three_x2, fq12_inv(fq12_mul(ay, _fq12_of_fq(2))))
    x3 = tuple(a - b for a, b in zip(fq12_mul(lam, lam), tuple(2 * c for c in ax)))
    y3 = tuple(
        a - b
        for a, b in zip(fq12_mul(lam, tuple(a - b for a, b in zip(ax, x3))), ay)
    )
    return x3, y3, lam


def _emb_add(ax: Fq12, ay: Fq12, bx: Fq12, by: Fq12) -> tuple[Fq12, Fq12, Fq12]:
    """Affine addition (distinct x) in E(Fq12); returns (x3, y3, lambda)."""
    lam = fq12_mul(
        tuple(a - b for a, b in zip(by, ay)),
        fq12_inv(tuple(a - b for a, b in zip(bx, ax))),
    )
    x3 = tuple(
        a - b - c for a, b, c in zip(fq12_mul(lam, lam), ax, bx)
    )
    y3 = tuple(
        a - b
        for a, b in zip(fq12_mul(lam, tuple(a - b for a, b in zip(ax, x3))), ay)
    )
    return x3, y3, lam


def miller_loop_ate(p: Point, q: Point) -> Fq12:
    """f_{6u+2,Q}(P) * l_{T,piQ}(P) * l_{T+piQ,-pi2Q}(P), verticals elided."""
    qx, qy = _emb_point(q)
    tx, ty = qx, qy
    f = FQ12_ONE
    px, py = p.x, p.y
    for bit in bin(ATE_LOOP)[3:]:
        tx2, ty2, lam = _emb_double(tx, ty)
        f = fq12_mul(fq12_sqr(f), _line_fq12(tx, ty, lam, px, py))
        tx, ty = tx2, ty2
        if bit == "1":
            tx2, ty2, lam = _emb_add(tx, ty, qx, qy)
            f = fq12_mul(f, _line_fq12(tx, ty, lam, px, py))
            tx, ty = tx2, ty2
    # Frobenius correction lines
    q1x, q1y = fq12_frobenius(qx, 1), fq12_frobenius(qy, 1)
    q2x, q2y = fq12_frobenius(qx, 2), fq12_frobenius(qy, 2)
    nq2y = tuple(-c for c in q2y)
    tx2, ty2, lam = _emb_add(tx, ty, q1x, q1y)
    f = fq12_mul(f, _line_fq12(tx, ty, lam, px, py))
    tx, ty = tx2, ty2
    _, _, lam = _emb_add(tx, ty, q2x, nq2y)
    f = fq12_mul(f, _line_fq12(tx, ty, lam, px, py))
    return f


def _line_fq12(ax: Fq12, ay: Fq12, lam: Fq12, px: int, py: int) -> Fq12:
    """Line through A with slope lam, evaluated at P=(px,py) in G1:
    (py - ay) - lam*(px - ax)."""
    lam_ax = fq12_mul(lam, ax)
    lam_px = tuple(ci * px for ci in lam)
    out = [a - b for a, b in zip(lam_ax, lam_px)]
    out = [o - a for o, a in zip(out, ay)]
    out[0] = out[0] + Fq2(py, 0)
    return tuple(out)


def ate_pairing(p: Point, q: Point) -> Fq12:
    """Reduced optimal ate pairing - the reference's `Bn256::pairing`."""
    if p.is_zero() or q.is_zero():
        return FQ12_ONE
    return final_exponentiation(miller_loop_ate(p, q))


def fq12_to_tower_coeffs(a: Fq12) -> list[int]:
    """Map w-basis coefficients to the reference's Fq6/Fq2 tower layout
    (c0.c0.c0, c0.c0.c1, c0.c1.c0, ..., c1.c2.c1) as canonical ints - the
    order used by `pairing_to_vec` (phase2/src/utils.rs:153-185):
    c0 = a0 + a2 v + a4 v^2, c1 = a1 + a3 v + a5 v^2 (v = w^2, w^3 = v w)."""
    order = [0, 2, 4, 1, 3, 5]
    out = []
    for i in order:
        out.append(a[i].c0)
        out.append(a[i].c1)
    return out


def same_ratio(g1_pair: tuple[Point, Point], g2_pair: tuple[Point, Point]) -> bool:
    """e(a, d) == e(b, c) check with the reference's zero-rejection
    (/root/reference/powersoftau/src/utils.rs:151-159)."""
    a, b = g1_pair
    c, d = g2_pair
    if a.is_zero() or b.is_zero() or c.is_zero() or d.is_zero():
        return False
    return pairing(a, d) == pairing(b, c)
