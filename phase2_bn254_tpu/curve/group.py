"""Vectorized, branchless Jacobian group law + windowed batch scalar-mul.

TPU-first reimplementation of the reference's `curve_impl!` group law
(/root/reference/pairing/src/bn256/ec.rs:301-563): the same dbl-2009-l /
add-2007-bl formulas, but every exceptional case (infinity, doubling,
P + (-P)) is handled with masked selects so the whole batch stays on the
vector units - no data-dependent branching, which XLA cannot tile.

Points are pytrees of limb arrays:
    Jacobian: (x, y, z) field elements; infinity <=> z == 0 (ec.rs:227-236)
    Affine:   (x, y, inf_mask)

The scalar multiplier is a fixed-window (w=4) ladder driven by lax.scan -
the vectorized replacement for the reference's per-point wNAF
(/root/reference/powersoftau/src/batched_accumulator.rs:1130-1181). Affine
results are identical (coordinates are unique), so serialized bytes match.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp


class JacobianBatch(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class AffineBatch(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray  # bool mask over batch dims


def jac_zero(f, batch_shape=()) -> JacobianBatch:
    return JacobianBatch(f.zeros(batch_shape), f.ones(batch_shape), f.zeros(batch_shape))


def jac_is_zero(f, p: JacobianBatch):
    return f.is_zero(p.z)


def affine_to_jac(f, p: AffineBatch) -> JacobianBatch:
    shape = p.inf.shape
    one = f.ones(shape)
    zero = f.zeros(shape)
    return JacobianBatch(
        f.select(p.inf, zero, p.x),
        f.select(p.inf, one, p.y),
        f.select(p.inf, zero, one),
    )


def jac_double(f, p: JacobianBatch) -> JacobianBatch:
    """dbl-2009-l; maps infinity to infinity without branching (z3 = 2yz = 0)."""
    a = f.sqr(p.x)
    b = f.sqr(p.y)
    c = f.sqr(b)
    d = f.sub(f.sub(f.sqr(f.add(p.x, b)), a), c)
    d = f.double(d)
    e = f.add(f.double(a), a)
    ff = f.sqr(e)
    z3 = f.double(f.mul(p.z, p.y))
    x3 = f.sub(ff, f.double(d))
    c8 = f.double(f.double(f.double(c)))
    y3 = f.sub(f.mul(f.sub(d, x3), e), c8)
    return JacobianBatch(x3, y3, z3)


def jac_add(f, p: JacobianBatch, q: JacobianBatch) -> JacobianBatch:
    """add-2007-bl with masked handling of the reference's branch structure
    (ec.rs:360-454): P+O, O+Q, doubling, and P+(-P)."""
    p_inf = jac_is_zero(f, p)
    q_inf = jac_is_zero(f, q)

    z1z1 = f.sqr(p.z)
    z2z2 = f.sqr(q.z)
    u1 = f.mul(p.x, z2z2)
    u2 = f.mul(q.x, z1z1)
    s1 = f.mul(f.mul(p.y, q.z), z2z2)
    s2 = f.mul(f.mul(q.y, p.z), z1z1)

    eq_x = f.eq(u1, u2)
    eq_y = f.eq(s1, s2)

    h = f.sub(u2, u1)
    i = f.sqr(f.double(h))
    j = f.mul(h, i)
    r = f.double(f.sub(s2, s1))
    v = f.mul(u1, i)
    x3 = f.sub(f.sub(f.sqr(r), j), f.double(v))
    s1j = f.mul(s1, j)
    y3 = f.sub(f.mul(f.sub(v, x3), r), f.double(s1j))
    z3 = f.mul(f.sub(f.sub(f.sqr(f.add(p.z, q.z)), z1z1), z2z2), h)

    dbl = jac_double(f, p)

    # same x: double if same y else infinity
    is_dbl = eq_x & eq_y & ~p_inf & ~q_inf
    is_cancel = eq_x & ~eq_y & ~p_inf & ~q_inf

    x = f.select(is_dbl, dbl.x, x3)
    y = f.select(is_dbl, dbl.y, y3)
    z = f.select(is_dbl, dbl.z, z3)
    z = f.select(is_cancel, f.zeros(is_cancel.shape), z)
    # P + O = P ; O + Q = Q
    x = f.select(q_inf, p.x, x)
    y = f.select(q_inf, p.y, y)
    z = f.select(q_inf, p.z, z)
    x = f.select(p_inf, q.x, x)
    y = f.select(p_inf, q.y, y)
    z = f.select(p_inf, q.z, z)
    return JacobianBatch(x, y, z)


def jac_neg(f, p: JacobianBatch) -> JacobianBatch:
    return JacobianBatch(p.x, f.neg(p.y), p.z)


def jac_normalize(f, p: JacobianBatch) -> AffineBatch:
    """Batched Jacobian -> affine via one batched inverse
    (TPU version of batch_normalization, ec.rs:251-299)."""
    inf = jac_is_zero(f, p)
    zinv = f.batch_inv(p.z)  # zeros map to zero
    zinv2 = f.sqr(zinv)
    x = f.mul(p.x, zinv2)
    y = f.mul(p.y, f.mul(zinv2, zinv))
    return AffineBatch(x, y, inf)


# ---------------------------------------------------------------------------
# Scalar digits
# ---------------------------------------------------------------------------

WINDOW = 4
N_WINDOWS = fp.MONT_BITS // WINDOW  # 64


def scalar_windows(scalars_canon: jnp.ndarray) -> jnp.ndarray:
    """uint32[batch,nlimbs] canonical digits -> uint32[batch,4*nlimbs] 4-bit
    windows, window 0 = least significant. The limb count follows the input
    shape (16 for BN254 Fr; other engines pass wider scalars)."""
    outs = []
    per_limb = fp.LIMB_BITS // WINDOW  # 4
    for k in range(scalars_canon.shape[-1]):
        limb = scalars_canon[..., k]
        for s in range(per_limb):
            outs.append((limb >> (WINDOW * s)) & (2**WINDOW - 1))
    return jnp.stack(outs, axis=-1)


def batch_scalar_mul(f, points: AffineBatch, scalars_canon: jnp.ndarray) -> JacobianBatch:
    """points[i] * scalars[i] for a batch, fixed 4-bit windows.

    Cost per point: ~252 doublings + 64 unified adds + 15-entry table build.
    """
    batch_shape = points.inf.shape

    # table[d] = d * P as Jacobian, d in 0..16; entry 0 is infinity.
    # Built as an add-chain under lax.scan to keep the traced program small.
    base = affine_to_jac(f, points)

    def chain(prev, _):
        nxt = jac_add(f, prev, base)
        return nxt, nxt

    _, rest = jax.lax.scan(chain, base, None, length=14)  # 2P..15P
    zero = jac_zero(f, batch_shape)
    table = jax.tree.map(
        lambda z, b, r: jnp.concatenate([z[None], b[None], r], axis=0), zero, base, rest
    )

    digits = scalar_windows(scalars_canon)  # (*batch, 64)
    # scan MSB window -> LSB window
    digit_seq = jnp.moveaxis(digits, -1, 0)[::-1]  # (64, *batch)

    def gather_entry(d):
        # d: (*batch,) int; gather along table axis 0
        def g(arr):
            # arr: (16, *batch, ...) ; take per-batch-element entry
            idx = d.reshape(d.shape + (1,) * (arr.ndim - 1 - d.ndim))
            return jnp.take_along_axis(arr, idx[None].astype(jnp.int32), axis=0)[0]

        return jax.tree.map(g, table)

    def body(acc, d):
        acc = jac_double(f, acc)
        acc = jac_double(f, acc)
        acc = jac_double(f, acc)
        acc = jac_double(f, acc)
        entry = gather_entry(d)
        acc = jac_add(f, acc, entry)
        return acc, None

    acc0 = jac_zero(f, batch_shape)
    acc, _ = jax.lax.scan(body, acc0, digit_seq)
    return acc
