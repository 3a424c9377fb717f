"""Batched BN254 optimal-ate pairing on device.

Vectorizes the full reduced pairing over N (G1, G2) pairs: Miller loop with
eprint-2010/354 Alg 26/27 inversion-free steps on the twist (mirroring the
reference's prepared coefficients, /root/reference/pairing/src/bn256/
mod.rs:230-467), sparse line multiplications, and the Frobenius/exp-by-u
final-exponentiation chain (mod.rs:132-227).

Element layouts (row-major limb arrays; Montgomery form):
  Fq   uint32[N, 16]      Fq2  uint32[N, 2, 16]     Fq12 uint32[N, 6, 2, 16]
Fq12 uses the w-basis (coefficient i of w^i), matching refimpl.pairing;
conversion helpers at the bottom bridge host tuples.

At ceremony scale this powers the random-linear-combination verification
checks (O(tens) of pairings per verify after batching) - a single scan
program instead of per-pairing host Python. Host `refimpl.pairing` stays
the oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import codecs
from ..field import fp
from ..field.fq2 import Fq2Ops
from ..refimpl.field import Q
from ..refimpl.pairing import ATE_LOOP, BN_U, XI

CTX = codecs.CTX
F2 = Fq2Ops(CTX)


def _const2(v0: int, v1: int, batch_shape=()):
    """Fq2 constant (canonical ints) -> Montgomery [*, 2, 16]."""
    arr = np.stack(
        [
            fp.int_to_limbs(CTX.to_mont_int(v0)),
            fp.int_to_limbs(CTX.to_mont_int(v1)),
        ]
    )
    return jnp.broadcast_to(jnp.asarray(arr), (*batch_shape, 2, fp.NLIMBS))


# twist Frobenius multipliers (refimpl.pairing._TW_*)
_G2_INT = XI.pow((Q - 1) // 3)
_G3_INT = XI.pow((Q - 1) // 2)
_G2SQ_INT = XI.pow((Q * Q - 1) // 3)
_G3SQ_INT = XI.pow((Q * Q - 1) // 2)


def _nine(x):
    """9x by doubling: 9 = 8 + 1."""
    x2 = fp.add(CTX, x, x)
    x4 = fp.add(CTX, x2, x2)
    x8 = fp.add(CTX, x4, x4)
    return fp.add(CTX, x8, x)


def _mul_by_xi(a):
    """(c0 + c1 u) * (9 + u) = (9c0 - c1) + (9c1 + c0) u."""
    c0, c1 = Fq2Ops.c(a, 0), Fq2Ops.c(a, 1)
    return Fq2Ops.pack(
        fp.sub(CTX, _nine(c0), c1), fp.add(CTX, _nine(c1), c0)
    )


# ---------------------------------------------------------------------------
# Fq12 arithmetic over [*, 6, 2, 16] w-basis arrays (tower Karatsuba,
# mirroring refimpl.pairing.fq12_mul/fq12_sqr)
# ---------------------------------------------------------------------------

def _w(a, i):
    return a[..., i, :, :]


def _pack12(coeffs):
    return jnp.stack(coeffs, axis=-3)


def fq12_ones(batch_shape=()):
    one = F2.ones(batch_shape)
    zero = F2.zeros(batch_shape)
    return _pack12([one] + [zero] * 5)


def _fq6_mul(a0, a1, a2, b0, b1, b2):
    v0, v1, v2 = F2.mul(a0, b0), F2.mul(a1, b1), F2.mul(a2, b2)
    t = F2.mul(F2.add(a1, a2), F2.add(b1, b2))
    c0 = F2.add(v0, _mul_by_xi(F2.sub(F2.sub(t, v1), v2)))
    t = F2.mul(F2.add(a0, a1), F2.add(b0, b1))
    c1 = F2.add(F2.sub(F2.sub(t, v0), v1), _mul_by_xi(v2))
    t = F2.mul(F2.add(a0, a2), F2.add(b0, b2))
    c2 = F2.add(F2.sub(F2.sub(t, v0), v2), v1)
    return c0, c1, c2


def _fq6_mul_by_v(a0, a1, a2):
    return _mul_by_xi(a2), a0, a1


def fq12_mul(a, b):
    a0 = (_w(a, 0), _w(a, 2), _w(a, 4))
    a1 = (_w(a, 1), _w(a, 3), _w(a, 5))
    b0 = (_w(b, 0), _w(b, 2), _w(b, 4))
    b1 = (_w(b, 1), _w(b, 3), _w(b, 5))
    aa = _fq6_mul(*a0, *b0)
    bb = _fq6_mul(*a1, *b1)
    cc = _fq6_mul(*(F2.add(x, y) for x, y in zip(a0, a1)),
                  *(F2.add(x, y) for x, y in zip(b0, b1)))
    vb = _fq6_mul_by_v(*bb)
    c0 = tuple(F2.add(x, y) for x, y in zip(aa, vb))
    c1 = tuple(F2.sub(F2.sub(c, x), y) for c, x, y in zip(cc, aa, bb))
    return _pack12([c0[0], c1[0], c0[1], c1[1], c0[2], c1[2]])


def fq12_sqr(a):
    a0 = (_w(a, 0), _w(a, 2), _w(a, 4))
    a1 = (_w(a, 1), _w(a, 3), _w(a, 5))
    v0 = _fq6_mul(*a0, *a1)
    t = _fq6_mul_by_v(*a1)
    s0 = tuple(F2.add(x, y) for x, y in zip(a0, a1))
    s1 = tuple(F2.add(x, y) for x, y in zip(a0, t))
    c0 = _fq6_mul(*s0, *s1)
    vv0 = _fq6_mul_by_v(*v0)
    c0 = tuple(F2.sub(F2.sub(c, x), y) for c, x, y in zip(c0, v0, vv0))
    c1 = tuple(F2.double(x) for x in v0)
    return _pack12([c0[0], c1[0], c0[1], c1[1], c0[2], c1[2]])


def fq12_conj(a):
    return _pack12([
        _w(a, i) if i % 2 == 0 else F2.neg(_w(a, i)) for i in range(6)
    ])


_FROB_GAMMA = [XI.pow(i * (Q - 1) // 6) for i in range(6)]


def fq12_frobenius(a, power: int = 1):
    out = a
    for _ in range(power):
        coeffs = []
        for i in range(6):
            g = _const2(_FROB_GAMMA[i].c0, _FROB_GAMMA[i].c1)
            coeffs.append(F2.mul(F2.conjugate(_w(out, i)), g))
        out = _pack12(coeffs)
    return out


def fq12_inv(a):
    """conj(a) / Norm over Fq6 (refimpl.pairing.fq12_inv)."""
    ac = fq12_conj(a)
    n = fq12_mul(a, ac)  # lands in Fq2[w^2]
    b0, b1, b2 = _w(n, 0), _w(n, 2), _w(n, 4)
    c0 = F2.sub(F2.sqr(b0), _mul_by_xi(F2.mul(b1, b2)))
    c1 = F2.sub(_mul_by_xi(F2.sqr(b2)), F2.mul(b0, b1))
    c2 = F2.sub(F2.sqr(b1), F2.mul(b0, b2))
    t = F2.add(F2.mul(b0, c0), _mul_by_xi(F2.add(F2.mul(b2, c1), F2.mul(b1, c2))))
    tinv = F2.batch_inv(t)
    i0, i1, i2 = F2.mul(c0, tinv), F2.mul(c1, tinv), F2.mul(c2, tinv)
    zero = F2.zeros(i0.shape[:-2])
    ninv = _pack12([i0, zero, i1, zero, i2, zero])
    return fq12_mul(ac, ninv)


def fq12_mul_line(f, c0, c1, c3):
    """f * (c0 + c1 w + c3 w^3), all ci Fq2 (sparse: 18+ muls vs 54)."""
    parts = []
    for i in range(6):
        acc = F2.mul(_w(f, i), c0)
        j1 = (i - 1) % 6
        t = F2.mul(_w(f, j1), c1)
        if i - 1 < 0:
            t = _mul_by_xi(t)
        acc = F2.add(acc, t)
        j3 = (i - 3) % 6
        t = F2.mul(_w(f, j3), c3)
        if i - 3 < 0:
            t = _mul_by_xi(t)
        acc = F2.add(acc, t)
        parts.append(acc)
    return _pack12(parts)


# ---------------------------------------------------------------------------
# Miller loop: inversion-free twist steps (Alg 26/27, eprint 2010/354)
# ---------------------------------------------------------------------------

def _naf(value: int) -> list[int]:
    digits = []
    while value:
        if value & 1:
            d = 2 - (value % 4)
            value -= d
        else:
            d = 0
        digits.append(d)
        value >>= 1
    return digits


_NAF_6U2 = _naf(ATE_LOOP)  # LSB-first, as SIX_U_PLUS_2_NAF


def _double_step(X, Y, Z):
    """Alg 26 (mod.rs:243-318): Jacobian doubling on the twist + line
    coefficients (c0, c1, c3) with the G1 scale factors left out (applied
    in _ell)."""
    A = F2.sqr(X)
    B = F2.sqr(Y)
    C = F2.sqr(B)
    D = F2.sqr(F2.add(B, X))
    D = F2.double(F2.sub(F2.sub(D, A), C))  # 2((B+X)^2 - A - C)
    E = F2.add(F2.double(A), A)  # 3A
    G = F2.add(X, E)
    F_ = F2.sqr(E)
    Zsq = F2.sqr(Z)
    X3 = F2.sub(F2.sub(F_, D), D)
    Z3 = F2.sub(F2.sub(F2.sqr(F2.add(Z, Y)), B), Zsq)  # 2YZ
    Y3 = F2.mul(F2.sub(D, X3), E)
    eightC = F2.double(F2.double(F2.double(C)))
    Y3 = F2.sub(Y3, eightC)
    # line: c0 = 2*Z3*Zsq (x py), c1 = -2*E*Zsq (x px), c3 = G^2 - A - F - 4B
    c0 = F2.double(F2.mul(Z3, Zsq))
    c1 = F2.neg(F2.double(F2.mul(E, Zsq)))
    c3 = F2.sub(F2.sub(F2.sqr(G), A), F_)
    c3 = F2.sub(c3, F2.double(F2.double(B)))
    return (X3, Y3, Z3), (c0, c1, c3)


def _add_step(X, Y, Z, qx, qy):
    """Alg 27 (mod.rs:320-466): mixed addition T += Q + line coefficients."""
    Zsq = F2.sqr(Z)
    Ysq = F2.sqr(qy)
    t0 = F2.mul(Zsq, qx)
    t1 = F2.mul(F2.sub(F2.sub(F2.sqr(F2.add(qy, Z)), Ysq), Zsq), Zsq)
    t2 = F2.sub(t0, X)
    t3 = F2.sqr(t2)
    t4 = F2.double(F2.double(t3))
    t5 = F2.mul(t4, t2)
    t6 = F2.sub(F2.sub(t1, Y), Y)
    t9 = F2.mul(t6, qx)
    t7 = F2.mul(t4, X)
    X3 = F2.sub(F2.sub(F2.sub(F2.sqr(t6), t5), t7), t7)
    Z3 = F2.sub(F2.sub(F2.sqr(F2.add(Z, t2)), Zsq), t3)
    t10 = F2.add(qy, Z3)
    t8 = F2.mul(F2.sub(t7, X3), t6)
    t0b = F2.double(F2.mul(Y, t5))
    Y3 = F2.sub(t8, t0b)
    t10 = F2.sub(F2.sub(F2.sqr(t10), Ysq), F2.sqr(Z3))
    t9 = F2.sub(F2.double(t9), t10)
    c0 = F2.double(Z3)  # x py
    c1 = F2.double(F2.neg(t6))  # x px
    c3 = t9
    return (X3, Y3, Z3), (c0, c1, c3)


def _ell(f, coeffs, px, py):
    """mod.rs:70-84: scale c0 by py, c1 by px (both Fq), sparse-multiply."""
    c0, c1, c3 = coeffs
    c0 = Fq2Ops.pack(
        fp.mont_mul(CTX, Fq2Ops.c(c0, 0), py), fp.mont_mul(CTX, Fq2Ops.c(c0, 1), py)
    )
    c1 = Fq2Ops.pack(
        fp.mont_mul(CTX, Fq2Ops.c(c1, 0), px), fp.mont_mul(CTX, Fq2Ops.c(c1, 1), px)
    )
    return fq12_mul_line(f, c0, c1, c3)


@jax.jit
def batch_miller_loop(px, py, qx, qy):
    """N-lane Miller loop f_{6u+2,Q}(P) with Frobenius correction lines.

    px, py: uint32[N, 16] G1 affine (Montgomery); qx, qy: uint32[N, 2, 16]
    G2 affine. No infinities (filter on host like the reference's
    miller_loop does, mod.rs:66-69)."""
    f = fq12_ones(px.shape[:-1])
    T = (qx, qy, F2.ones(qx.shape[:-2]))
    negqy = F2.neg(qy)

    # static NAF schedule, MSB-first below the leading digit
    schedule = _NAF_6U2[-2::-1]
    digits = jnp.asarray(np.array(schedule, dtype=np.int32))

    def body(carry, digit):
        f, X, Y, Z = carry
        f = fq12_sqr(f)
        (X, Y, Z), coeffs = _double_step(X, Y, Z)
        f = _ell(f, coeffs, px, py)
        # conditional addition with Q or -Q
        qy_sel = F2.select(jnp.broadcast_to(digit < 0, qy.shape[:-2]), negqy, qy)
        (Xa, Ya, Za), coeffs_a = _add_step(X, Y, Z, qx, qy_sel)
        fa = _ell(f, coeffs_a, px, py)
        take = jnp.broadcast_to(digit != 0, qy.shape[:-2])
        f = jnp.where(take[..., None, None, None], fa, f)
        X = F2.select(take, Xa, X)
        Y = F2.select(take, Ya, Y)
        Z = F2.select(take, Za, Z)
        return (f, X, Y, Z), None

    # first digit of the schedule is the leading 1: skip the initial
    # square (reference miller_loop does the same, mod.rs:87-89) by
    # starting from the first doubling of Q
    (f, X, Y, Z), _ = jax.lax.scan(body, (f, *T), digits)

    # q1 = psi(Q), q2 = -psi^2(Q)
    g2 = _const2(_G2_INT.c0, _G2_INT.c1)
    g3 = _const2(_G3_INT.c0, _G3_INT.c1)
    g2sq = _const2(_G2SQ_INT.c0, _G2SQ_INT.c1)
    g3sq = _const2(_G3SQ_INT.c0, _G3SQ_INT.c1)
    q1x = F2.mul(F2.conjugate(qx), g2)
    q1y = F2.mul(F2.conjugate(qy), g3)
    q2x = F2.mul(qx, g2sq)
    q2y = F2.neg(F2.mul(qy, g3sq))
    (X, Y, Z), coeffs = _add_step(X, Y, Z, q1x, q1y)
    f = _ell(f, coeffs, px, py)
    _, coeffs = _add_step(X, Y, Z, q2x, q2y)
    return _ell(f, coeffs, px, py)


# ---------------------------------------------------------------------------
# final exponentiation (chain of refimpl.pairing.final_exponentiation)
# ---------------------------------------------------------------------------

def _pow_u(a):
    """a^BN_U via scan over the static bit pattern."""
    bits = jnp.asarray(
        np.array([int(b) for b in bin(BN_U)[3:]], dtype=np.int32)
    )

    def body(acc, bit):
        acc = fq12_sqr(acc)
        mul = fq12_mul(acc, a)
        take = jnp.broadcast_to(bit != 0, acc.shape[:-3])
        acc = jnp.where(take[..., None, None, None], mul, acc)
        return acc, None

    out, _ = jax.lax.scan(body, a, bits)
    return out


@jax.jit
def batch_final_exponentiation(f):
    r = fq12_mul(fq12_conj(f), fq12_inv(f))
    r = fq12_mul(fq12_frobenius(r, 2), r)

    fp_ = fq12_frobenius(r, 1)
    fp2 = fq12_frobenius(r, 2)
    fp3 = fq12_frobenius(fp2, 1)
    fu = _pow_u(r)
    fu2 = _pow_u(fu)
    fu3 = _pow_u(fu2)
    y0 = fq12_mul(fq12_mul(fp_, fp2), fp3)
    y1 = fq12_conj(r)
    y2 = fq12_frobenius(fu2, 2)
    y3 = fq12_conj(fq12_frobenius(fu, 1))
    y4 = fq12_conj(fq12_mul(fu, fq12_frobenius(fu2, 1)))
    y5 = fq12_conj(fu2)
    y6 = fq12_conj(fq12_mul(fu3, fq12_frobenius(fu3, 1)))
    t = fq12_mul(fq12_mul(fq12_sqr(y6), y4), y5)
    t1 = fq12_mul(fq12_mul(y3, y5), t)
    t = fq12_mul(t, y2)
    t1 = fq12_sqr(fq12_mul(fq12_sqr(t1), t))
    t0 = fq12_mul(t1, y1)
    t1 = fq12_mul(t1, y0)
    return fq12_mul(fq12_sqr(t0), t1)


def batch_pairing(px, py, qx, qy):
    """Reduced optimal-ate pairing over N lanes; value identical to
    refimpl.pairing.pairing per lane."""
    return batch_final_exponentiation(batch_miller_loop(px, py, qx, qy))


# ---------------------------------------------------------------------------
# host bridges (tests / verification glue)
# ---------------------------------------------------------------------------

def points_to_arrays(g1_points, g2_points):
    """Affine host points (no infinities) -> device coordinate arrays."""
    from ..refimpl import curve as rc

    px = np.stack([fp.int_to_limbs(CTX.to_mont_int(p.x)) for p in g1_points])
    py = np.stack([fp.int_to_limbs(CTX.to_mont_int(p.y)) for p in g1_points])
    qx = np.stack(
        [
            np.stack(
                [
                    fp.int_to_limbs(CTX.to_mont_int(q.x.c0)),
                    fp.int_to_limbs(CTX.to_mont_int(q.x.c1)),
                ]
            )
            for q in g2_points
        ]
    )
    qy = np.stack(
        [
            np.stack(
                [
                    fp.int_to_limbs(CTX.to_mont_int(q.y.c0)),
                    fp.int_to_limbs(CTX.to_mont_int(q.y.c1)),
                ]
            )
            for q in g2_points
        ]
    )
    return jnp.asarray(px), jnp.asarray(py), jnp.asarray(qx), jnp.asarray(qy)


def fq12_to_host(arr):
    """uint32[N, 6, 2, 16] -> list of refimpl Fq12 tuples (canonical)."""
    from ..refimpl.field import Fq2 as HostFq2

    a = np.asarray(arr)
    out = []
    for lane in range(a.shape[0]):
        coeffs = []
        for i in range(6):
            c0 = CTX.from_mont_int(fp.limbs_to_int(a[lane, i, 0]))
            c1 = CTX.from_mont_int(fp.limbs_to_int(a[lane, i, 1]))
            coeffs.append(HostFq2(c0, c1))
        out.append(tuple(coeffs))
    return out
