"""Pallas TPU kernel: fused windowed batch scalar multiplication.

The phase-1 contribute hot loop (batch_exp) as ONE kernel per batch tile:
table build + 64-window ladder + all field arithmetic live in VMEM, with
hardware loops instead of XLA launch sequences.

Layout: transposed limbs - a field element batch is uint32[16, T] with the
16 limbs on sublanes and the batch on lanes (full 128-lane utilization; the
XLA path's [..., 16] layout wastes 7/8 of each vector).

The group law is the same masked dbl-2009-l / add-2007-bl as curve/group.py
(bit-identical results); per-lane table lookups are select chains (gathers
with per-lane indices do not vectorize on the VPU). Field constants (modulus
column, Montgomery one) enter as kernel inputs - Pallas kernels may not
capture array constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fp
from ..refimpl.field import Q

NLIMBS = fp.NLIMBS
MASK = fp.LIMB_MASK
U32 = jnp.uint32

_P_LIMBS = fp.int_to_limbs(Q)  # (16,) uint32
_ONE_MONT = fp.int_to_limbs((1 << 256) % Q)
_PPRIME = (-pow(Q, -1, 1 << 16)) % (1 << 16)


class TOps:
    """Transposed-layout Fq ops on uint32[16, ...] blocks: limbs on axis 0
    (sublanes), batch on the trailing axes (lanes). Shape-generic: the G1/G2
    ladder kernels use (16, T) tiles, the NTT kernel (16, W, C) tiles.

    `p` is the modulus as a (16, 1...) column broadcastable against element
    blocks (a traced kernel input); `pprime` = -p^-1 mod 2^16 (defaults to
    the BN254 Fq factor; the Fr NTT kernel passes its own).

    `lazy=True` keeps values in the redundant range [0, 2p) (standard lazy
    reduction): mont_mul skips its final conditional subtract (CIOS output
    < p + 4p^2/R < 2p since R = 2^256 > 4p), add reduces mod 2p, sub wraps
    by 2p, and eq/is_zero treat p as an alias of 0. Call `canon_out` on
    kernel outputs to return to canonical form."""

    def __init__(self, p_col, pprime: int = _PPRIME, lazy: bool = False):
        self.p = p_col
        self.n = p_col.shape[0]  # limb count (16 for BN254, 24 for BLS Fq)
        self.pprime = jnp.uint32(pprime)
        self.lazy = lazy
        if lazy:
            self.p2 = self._double_limbs(p_col)

    def _double_limbs(self, p):
        c = jnp.zeros_like(p[0:1])
        out = []
        for j in range(self.n):
            v = (p[j : j + 1] << 1) + c
            out.append(v & MASK)
            c = v >> 16
        return jnp.concatenate(out, axis=0)

    # -- field ------------------------------------------------------------
    def mont_mul(self, a, b):
        shape = jnp.broadcast_shapes(a.shape, b.shape, self.p.shape)
        tail = shape[1:]
        p = self.p
        pprime = self.pprime

        # t: rows 0..15 = low digits, row 16 = running top digit. Unrolled
        # CIOS written with slices/concats only (Mosaic has no scatter-add,
        # and cannot dynamic-slice loaded values).
        t16 = jnp.zeros((self.n, *tail), U32)
        top = jnp.zeros((1, *tail), U32)
        for i in range(self.n):
            prod = a[i : i + 1] * b  # (16, ...)
            lo = prod & MASK
            hi = prod >> 16
            t16 = t16 + lo
            m = (t16[0:1] * pprime) & MASK
            qprod = m * p
            t16 = t16 + (qprod & MASK)
            hi_sum = hi + (qprod >> 16)  # contributes to rows 1..16
            carry = t16[0:1] >> 16
            shifted = jnp.concatenate([t16[1 : self.n], top], axis=0) + hi_sum
            t16 = jnp.concatenate([shifted[0:1] + carry, shifted[1:]], axis=0)
            top = jnp.zeros((1, *tail), U32)
        t = self._canon(t16)
        return t if self.lazy else self._sub_p_if_ge(t)

    def _canon(self, t):
        digits = []
        c = jnp.zeros((1, *t.shape[1:]), U32)
        for j in range(self.n):
            v = t[j : j + 1] + c
            digits.append(v & MASK)
            c = v >> 16
        return jnp.concatenate(digits, axis=0)

    def _sub_m_if_ge(self, a, m):
        ai = a.astype(jnp.int32)
        pi = jnp.broadcast_to(m, a.shape).astype(jnp.int32)
        borrow = jnp.zeros((1, *a.shape[1:]), jnp.int32)
        digits = []
        for j in range(self.n):
            d = ai[j : j + 1] - pi[j : j + 1] - borrow
            borrow = (d < 0).astype(jnp.int32)
            digits.append((d + (borrow << 16)).astype(U32))
        diff = jnp.concatenate(digits, axis=0)
        return jnp.where(borrow == 0, diff, a)

    def _sub_p_if_ge(self, a):
        return self._sub_m_if_ge(a, self.p)

    def canon_out(self, a):
        """Redundant [0, 2p) -> canonical [0, p) (no-op when not lazy)."""
        return self._sub_p_if_ge(a) if self.lazy else a

    def add(self, a, b):
        s = []
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        c = jnp.zeros((1, *shape[1:]), U32)
        for j in range(self.n):
            v = a[j : j + 1] + b[j : j + 1] + c
            s.append(v & MASK)
            c = v >> 16
        return self._sub_m_if_ge(
            jnp.concatenate(s, axis=0), self.p2 if self.lazy else self.p
        )

    def sub(self, a, b):
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        ai = jnp.broadcast_to(a, shape).astype(jnp.int32)
        bi = jnp.broadcast_to(b, shape).astype(jnp.int32)
        borrow = jnp.zeros((1, *shape[1:]), jnp.int32)
        digits = []
        for j in range(self.n):
            d = ai[j : j + 1] - bi[j : j + 1] - borrow
            borrow = (d < 0).astype(jnp.int32)
            digits.append((d + (borrow << 16)).astype(U32))
        diff = jnp.concatenate(digits, axis=0)
        pi = jnp.broadcast_to(self.p2 if self.lazy else self.p, shape)
        carry = jnp.zeros((1, *shape[1:]), U32)
        digits2 = []
        for j in range(self.n):
            v = diff[j : j + 1] + pi[j : j + 1] + carry
            digits2.append(v & MASK)
            carry = v >> 16
        wrapped = jnp.concatenate(digits2, axis=0)
        return jnp.where(borrow != 0, wrapped, diff)

    def dbl(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        z = jnp.all(a == 0, axis=0, keepdims=True)  # (1,T)
        if not self.lazy:
            return z
        # in [0, 2p) the value p is an alias of zero
        return z | jnp.all(a == jnp.broadcast_to(self.p, a.shape), axis=0, keepdims=True)

    def eq(self, a, b):
        if not self.lazy:
            return jnp.all(a == b, axis=0, keepdims=True)
        return self.is_zero(self.sub(a, b))

    @staticmethod
    def sel(mask, a, b):
        return jnp.where(mask, a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    # alias so group-law code reads uniformly over TOps / T2Ops
    def mul(self, a, b):
        return self.mont_mul(a, b)


class T2Ops:
    """Fq2 ops over pairs (c0, c1) of uint32[16, T] planes (fq2.rs tower:
    u^2 = -1, Karatsuba as fq2.rs:112-204)."""

    def __init__(self, base: TOps):
        self.f = base

    def mul(self, a, b):
        f = self.f
        a0, a1 = a
        b0, b1 = b
        v0 = f.mont_mul(a0, b0)
        v1 = f.mont_mul(a1, b1)
        c0 = f.sub(v0, v1)
        t = f.mont_mul(f.add(a0, a1), f.add(b0, b1))
        c1 = f.sub(f.sub(t, v0), v1)
        return c0, c1

    def add(self, a, b):
        return self.f.add(a[0], b[0]), self.f.add(a[1], b[1])

    def sub(self, a, b):
        return self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1])

    def dbl(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        return self.f.is_zero(a[0]) & self.f.is_zero(a[1])

    def eq(self, a, b):
        return self.f.eq(a[0], b[0]) & self.f.eq(a[1], b[1])

    def sel(self, mask, a, b):
        return self.f.sel(mask, a[0], b[0]), self.f.sel(mask, a[1], b[1])

    def zero_like(self, a):
        return jnp.zeros_like(a[0]), jnp.zeros_like(a[1])

    def canon_out(self, a):
        return self.f.canon_out(a[0]), self.f.canon_out(a[1])


# -- Jacobian group law, generic over TOps / T2Ops --------------------------

def jac_double(ops, P):
    x, y, z = P
    a = ops.mul(x, x)
    b = ops.mul(y, y)
    c = ops.mul(b, b)
    xb = ops.add(x, b)
    d = ops.sub(ops.sub(ops.mul(xb, xb), a), c)
    d = ops.add(d, d)
    e = ops.add(ops.add(a, a), a)
    f = ops.mul(e, e)
    z3 = ops.dbl(ops.mul(z, y))
    x3 = ops.sub(f, ops.add(d, d))
    c8 = ops.dbl(ops.dbl(ops.dbl(c)))
    y3 = ops.sub(ops.mul(ops.sub(d, x3), e), c8)
    return x3, y3, z3


def jac_add(ops, P, Qp):
    px, py, pz = P
    qx, qy, qz = Qp
    p_inf = ops.is_zero(pz)
    q_inf = ops.is_zero(qz)
    z1z1 = ops.mul(pz, pz)
    z2z2 = ops.mul(qz, qz)
    u1 = ops.mul(px, z2z2)
    u2 = ops.mul(qx, z1z1)
    s1 = ops.mul(ops.mul(py, qz), z2z2)
    s2 = ops.mul(ops.mul(qy, pz), z1z1)
    eq_x = ops.eq(u1, u2)
    eq_y = ops.eq(s1, s2)
    h = ops.sub(u2, u1)
    hh = ops.add(h, h)
    i = ops.mul(hh, hh)
    j = ops.mul(h, i)
    r = ops.dbl(ops.sub(s2, s1))
    v = ops.mul(u1, i)
    x3 = ops.sub(ops.sub(ops.mul(r, r), j), ops.add(v, v))
    s1j = ops.mul(s1, j)
    y3 = ops.sub(ops.mul(ops.sub(v, x3), r), ops.add(s1j, s1j))
    zz = ops.add(pz, qz)
    z3 = ops.mul(ops.sub(ops.sub(ops.mul(zz, zz), z1z1), z2z2), h)

    is_dbl = eq_x & eq_y & ~p_inf & ~q_inf
    is_cancel = eq_x & ~eq_y & ~p_inf & ~q_inf
    # P == Q is measure-zero in ladder traffic: branch around the embedded
    # doubling (~6 of 22 muls) instead of paying it every add. Both sides
    # are compiled; the doubling executes only when some lane needs it.
    dx, dy, dz = jax.lax.cond(
        jnp.max(is_dbl.astype(jnp.int32)) > 0,
        lambda: jac_double(ops, P),
        lambda: jax.tree.map(jnp.zeros_like, tuple(P)),
    )
    x = ops.sel(is_dbl, dx, x3)
    y = ops.sel(is_dbl, dy, y3)
    z = ops.sel(is_dbl, dz, z3)
    z = ops.sel(is_cancel, ops.zero_like(z), z)
    x = ops.sel(q_inf, px, x)
    y = ops.sel(q_inf, py, y)
    z = ops.sel(q_inf, pz, z)
    x = ops.sel(p_inf, qx, x)
    y = ops.sel(p_inf, qy, y)
    z = ops.sel(p_inf, qz, z)
    return x, y, z


# keep method-style access used by the G1 kernel
TOps.jac_double = lambda self, P: jac_double(self, P)
TOps.jac_add = lambda self, P, Q: jac_add(self, P, Q)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

N_WINDOWS = 64


def _batch_exp_kernel(pprime, p_ref, one_ref, x_ref, y_ref, dig_ref, ox_ref, oy_ref, oz_ref, table_ref):
    """One batch tile; dig_ref[w] holds 4-bit window n_windows-1-w (MSB
    first). Limb count and window count come from the ref shapes (shared by
    the BN254 and BLS12-381 engines)."""
    T = x_ref.shape[1]
    NL = x_ref.shape[0]
    n_windows = dig_ref.shape[0]
    ops = TOps(p_ref[:], pprime, lazy=True)
    ones = one_ref[:]  # Montgomery one, replicated (NL, T) block
    zeros = jnp.zeros((NL, T), U32)

    # table[0] = infinity, table[1] = P, table[d] = table[d-1] + P
    table_ref[0, 0] = zeros
    table_ref[0, 1] = ones
    table_ref[0, 2] = zeros
    base = (x_ref[:], y_ref[:], ones)
    table_ref[1, 0], table_ref[1, 1], table_ref[1, 2] = base

    def build(d, prev):
        nxt = ops.jac_add(prev, base)
        table_ref[pl.ds(d, 1), 0] = nxt[0][None]
        table_ref[pl.ds(d, 1), 1] = nxt[1][None]
        table_ref[pl.ds(d, 1), 2] = nxt[2][None]
        return nxt

    jax.lax.fori_loop(2, 16, build, base)

    def window(w, acc):
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        d = dig_ref[pl.ds(w, 1), :]  # (1,T) int32
        ex, ey, ez = zeros, ones, zeros
        for k in range(1, 16):
            m = d == k
            ex = ops.sel(m, table_ref[k, 0], ex)
            ey = ops.sel(m, table_ref[k, 1], ey)
            ez = ops.sel(m, table_ref[k, 2], ez)
        return ops.jac_add(acc, (ex, ey, ez))

    acc = jax.lax.fori_loop(0, n_windows, window, (zeros, ones, zeros))
    ox_ref[:] = ops.canon_out(acc[0])
    oy_ref[:] = ops.canon_out(acc[1])
    oz_ref[:] = ops.canon_out(acc[2])


@functools.partial(jax.jit, static_argnums=(3, 4))
def pallas_batch_exp(x_t, y_t, digits_msb, tile: int = 512, fld=None):
    """x_t, y_t: uint32[NL, N] transposed affine coords (Montgomery form, no
    infinities); digits_msb: int32[n_windows, N] windows MSB-first. Returns
    transposed Jacobian (x, y, z) uint32[NL, N].

    `fld` = (p_limbs tuple, one_mont tuple, pprime) selects the base field;
    None = BN254 Fq. BLS12-381 G1 passes its 24-limb constants."""
    p_limbs, one_mont, pprime = fld if fld is not None else (
        tuple(_P_LIMBS), tuple(_ONE_MONT), _PPRIME
    )
    nl = len(p_limbs)
    nw = digits_msb.shape[0]
    n = x_t.shape[1]
    tile = min(tile, n)
    assert n % tile == 0
    grid = (n // tile,)
    spec_const = pl.BlockSpec((nl, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec16 = pl.BlockSpec((nl, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_dig = pl.BlockSpec((nw, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nl, n), U32)] * 3
    p_col = jnp.broadcast_to(jnp.asarray(p_limbs, U32)[:, None], (nl, tile))
    one_col = jnp.broadcast_to(jnp.asarray(one_mont, U32)[:, None], (nl, tile))
    return pl.pallas_call(
        functools.partial(_batch_exp_kernel, pprime),
        grid=grid,
        in_specs=[spec_const, spec_const, spec16, spec16, spec_dig],
        out_specs=[spec16] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((16, 3, nl, tile), U32)],
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, x_t, y_t, digits_msb)


def _batch_exp_kernel_g2(
    pprime, p_ref, one_ref, x0_ref, x1_ref, y0_ref, y1_ref, dig_ref,
    ox0_ref, ox1_ref, oy0_ref, oy1_ref, oz0_ref, oz1_ref, table_ref,
):
    """G2 variant: Fq2 coordinates as (c0, c1) limb planes; table scratch
    holds 6 planes per entry (x0,x1,y0,y1,z0,z1). Shape-generic: works for
    any u^2 = -1 quadratic tower (BN254 and BLS12-381 both qualify)."""
    T = x0_ref.shape[1]
    NL = x0_ref.shape[0]
    n_windows = dig_ref.shape[0]
    fops = TOps(p_ref[:], pprime, lazy=True)
    ops = T2Ops(fops)
    onep = one_ref[:]
    zerop = jnp.zeros((NL, T), U32)
    one2 = (onep, zerop)
    zero2 = (zerop, zerop)

    def store(d_static_or_ds, P):
        (x0, x1), (y0, y1), (z0, z1) = P
        planes = (x0, x1, y0, y1, z0, z1)
        for c, v in enumerate(planes):
            if isinstance(d_static_or_ds, int):
                table_ref[d_static_or_ds, c] = v
            else:
                table_ref[d_static_or_ds, c] = v[None]

    store(0, (zero2, one2, zero2))
    base = ((x0_ref[:], x1_ref[:]), (y0_ref[:], y1_ref[:]), one2)
    store(1, base)

    def build(d, prev):
        nxt = jac_add(ops, prev, base)
        store(pl.ds(d, 1), nxt)
        return nxt

    jax.lax.fori_loop(2, 16, build, base)

    def window(w, acc):
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        d = dig_ref[pl.ds(w, 1), :]
        ex, ey, ez = zero2, one2, zero2
        for k in range(1, 16):
            m = d == k
            ex = ops.sel(m, (table_ref[k, 0], table_ref[k, 1]), ex)
            ey = ops.sel(m, (table_ref[k, 2], table_ref[k, 3]), ey)
            ez = ops.sel(m, (table_ref[k, 4], table_ref[k, 5]), ez)
        return jac_add(ops, acc, (ex, ey, ez))

    acc = jax.lax.fori_loop(0, n_windows, window, (zero2, one2, zero2))
    (ox0_ref[:], ox1_ref[:]) = ops.canon_out(acc[0])
    (oy0_ref[:], oy1_ref[:]) = ops.canon_out(acc[1])
    (oz0_ref[:], oz1_ref[:]) = ops.canon_out(acc[2])


@functools.partial(jax.jit, static_argnums=(5, 6))
def pallas_batch_exp_g2(x0, x1, y0, y1, digits_msb, tile: int = 128, fld=None):
    """Transposed Fq2 coordinate planes uint32[NL, N] -> Jacobian planes.

    `fld` selects the base field as in pallas_batch_exp."""
    p_limbs, one_mont, pprime = fld if fld is not None else (
        tuple(_P_LIMBS), tuple(_ONE_MONT), _PPRIME
    )
    nl = len(p_limbs)
    nw = digits_msb.shape[0]
    n = x0.shape[1]
    tile = min(tile, n)
    assert n % tile == 0
    grid = (n // tile,)
    spec_const = pl.BlockSpec((nl, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec16 = pl.BlockSpec((nl, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_dig = pl.BlockSpec((nw, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nl, n), U32)] * 6
    p_col = jnp.broadcast_to(jnp.asarray(p_limbs, U32)[:, None], (nl, tile))
    one_col = jnp.broadcast_to(jnp.asarray(one_mont, U32)[:, None], (nl, tile))
    return pl.pallas_call(
        functools.partial(_batch_exp_kernel_g2, pprime),
        grid=grid,
        in_specs=[spec_const, spec_const, spec16, spec16, spec16, spec16, spec_dig],
        out_specs=[spec16] * 6,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((16, 6, nl, tile), U32)],
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, x0, x1, y0, y1, digits_msb)


def batch_exp_transposed_g2(batch_x, batch_y, scalars_canon, tile: int = 128):
    """AffineBatch Fq2 coord arrays ((N,2,16) layout) + canonical scalars ->
    JacobianBatch ((N,2,16) layout) via the fused G2 kernel."""
    from ..curve import group as G

    digits = G.scalar_windows(scalars_canon)
    digits_msb = jnp.flip(digits, axis=-1).T.astype(jnp.int32)
    x0, x1 = batch_x[:, 0].T, batch_x[:, 1].T
    y0, y1 = batch_y[:, 0].T, batch_y[:, 1].T
    ox0, ox1, oy0, oy1, oz0, oz1 = pallas_batch_exp_g2(x0, x1, y0, y1, digits_msb, tile)

    def pack(c0, c1):
        return jnp.stack([c0.T, c1.T], axis=-2)

    return G.JacobianBatch(pack(ox0, ox1), pack(oy0, oy1), pack(oz0, oz1))


# ---------------------------------------------------------------------------
# GLV ladder: k = k1 + k2*lambda, phi(X,Y,Z) = (beta*X, Y, Z)
# ---------------------------------------------------------------------------

GLV_WINDOWS = 33  # ceil(129+pad / 4) bits of |k1|,|k2|


def _batch_exp_glv_kernel(
    pprime, n_windows, p_ref, one_ref, beta_ref, x_ref, y_ref, d1_ref,
    d2_ref, neg_ref, ox_ref, oy_ref, oz_ref, table_ref,
):
    """Half-length double ladder: per window add table[d1] and
    phi(table[d2]), with per-lane sign masks (neg_ref rows: 0 -> k1, 1 -> k2).

    Table plane 3 holds beta*X per entry (phi applied once at build time
    instead of one mont_mul per window). Limb-count generic: BN254 (16
    limbs) and BLS12-381 (24 limbs) both instantiate it.
    """
    T = x_ref.shape[1]
    ops = TOps(p_ref[:], pprime, lazy=True)
    ones = one_ref[:]
    beta = beta_ref[:]
    zeros = jnp.zeros((x_ref.shape[0], T), U32)

    table_ref[0, 0] = zeros
    table_ref[0, 1] = ones
    table_ref[0, 2] = zeros
    table_ref[0, 3] = zeros
    base = (x_ref[:], y_ref[:], ones)
    table_ref[1, 0], table_ref[1, 1], table_ref[1, 2] = base
    table_ref[1, 3] = ops.mont_mul(base[0], beta)

    def build(d, prev):
        nxt = ops.jac_add(prev, base)
        table_ref[pl.ds(d, 1), 0] = nxt[0][None]
        table_ref[pl.ds(d, 1), 1] = nxt[1][None]
        table_ref[pl.ds(d, 1), 2] = nxt[2][None]
        table_ref[pl.ds(d, 1), 3] = ops.mont_mul(nxt[0], beta)[None]
        return nxt

    jax.lax.fori_loop(2, 16, build, base)

    neg1 = neg_ref[0:1, :] != 0  # (1,T)
    neg2 = neg_ref[1:2, :] != 0

    def gather(dig_ref, w, x_plane):
        d = dig_ref[pl.ds(w, 1), :]
        ex, ey, ez = zeros, ones, zeros
        for k in range(1, 16):
            m = d == k
            ex = ops.sel(m, table_ref[k, x_plane], ex)
            ey = ops.sel(m, table_ref[k, 1], ey)
            ez = ops.sel(m, table_ref[k, 2], ez)
        return ex, ey, ez

    def window(w, acc):
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        e1x, e1y, e1z = gather(d1_ref, w, 0)
        e1y = ops.sel(neg1, ops.sub(jnp.zeros_like(e1y), e1y), e1y)
        acc = ops.jac_add(acc, (e1x, e1y, e1z))
        e2x, e2y, e2z = gather(d2_ref, w, 3)  # phi: beta*X plane
        e2y = ops.sel(neg2, ops.sub(jnp.zeros_like(e2y), e2y), e2y)
        acc = ops.jac_add(acc, (e2x, e2y, e2z))
        return acc

    acc = jax.lax.fori_loop(0, n_windows, window, (zeros, ones, zeros))
    ox_ref[:] = ops.canon_out(acc[0])
    oy_ref[:] = ops.canon_out(acc[1])
    oz_ref[:] = ops.canon_out(acc[2])


@functools.partial(jax.jit, static_argnums=(5, 6))
def pallas_batch_exp_glv(x_t, y_t, d1_msb, d2_msb, negs, tile: int = 512,
                         fld=None):
    """GLV windowed ladder. d1_msb/d2_msb: int32[W, N] 4-bit windows of
    |k1|/|k2| (MSB first); negs: int32[2, N] sign flags.

    `fld` = (p_limbs tuple, one_mont tuple, pprime, beta_mont tuple)
    selects the curve; None = BN254 G1. BLS12-381 G1 passes its 24-limb
    constants and cube root (bls12_381/device.py)."""
    if fld is None:
        from ..refimpl.glv import BETA

        fld = (
            tuple(_P_LIMBS),
            tuple(_ONE_MONT),
            _PPRIME,
            tuple(fp.int_to_limbs(BETA * (1 << 256) % Q)),
        )
    p_limbs, one_mont, pprime, beta_mont = fld
    nl = len(p_limbs)
    nw = d1_msb.shape[0]
    n = x_t.shape[1]
    tile = min(tile, n)
    assert n % tile == 0
    grid = (n // tile,)
    spec_const = pl.BlockSpec((nl, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec16 = pl.BlockSpec((nl, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_dig = pl.BlockSpec((nw, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_neg = pl.BlockSpec((2, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nl, n), U32)] * 3
    p_col = jnp.broadcast_to(jnp.asarray(p_limbs, U32)[:, None], (nl, tile))
    one_col = jnp.broadcast_to(jnp.asarray(one_mont, U32)[:, None], (nl, tile))
    beta_col = jnp.broadcast_to(
        jnp.asarray(beta_mont, U32)[:, None], (nl, tile)
    )
    return pl.pallas_call(
        functools.partial(_batch_exp_glv_kernel, pprime, nw),
        grid=grid,
        in_specs=[spec_const, spec_const, spec_const, spec16, spec16, spec_dig, spec_dig, spec_neg],
        out_specs=[spec16] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((16, 4, nl, tile), U32)],
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, beta_col, x_t, y_t, d1_msb, d2_msb, negs)


def glv_digit_arrays(scalars: list[int]):
    """Decompose canonical scalars, return (d1_msb, d2_msb, negs) numpy arrays
    for pallas_batch_exp_glv. Vectorized nibble extraction via to_bytes."""
    from ..refimpl import glv as rglv

    n = len(scalars)
    nbytes = (GLV_WINDOWS * 4 + 7) // 8  # 17 bytes
    raw1 = bytearray(n * nbytes)
    raw2 = bytearray(n * nbytes)
    negs = np.zeros((2, n), dtype=np.int32)
    for i, s in enumerate(scalars):
        k1, k2 = rglv.decompose(s)
        if k1 < 0:
            negs[0, i] = 1
            k1 = -k1
        if k2 < 0:
            negs[1, i] = 1
            k2 = -k2
        raw1[i * nbytes : (i + 1) * nbytes] = k1.to_bytes(nbytes, "little")
        raw2[i * nbytes : (i + 1) * nbytes] = k2.to_bytes(nbytes, "little")

    def nibbles(raw):
        b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(n, nbytes)
        lo = (b & 0xF).astype(np.int32)
        hi = (b >> 4).astype(np.int32)
        digs = np.empty((n, nbytes * 2), dtype=np.int32)
        digs[:, 0::2] = lo
        digs[:, 1::2] = hi
        # LSB-first nibble list; keep GLV_WINDOWS, MSB first, transposed
        return digs[:, :GLV_WINDOWS][:, ::-1].T.copy()

    return nibbles(raw1), nibbles(raw2), negs


def batch_exp_transposed_glv(batch_x, batch_y, scalars: list[int], tile: int = 512):
    from ..curve import group as G

    d1, d2, negs = glv_digit_arrays(scalars)
    ox, oy, oz = pallas_batch_exp_glv(
        batch_x.T, batch_y.T, jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(negs), tile
    )
    return G.JacobianBatch(ox.T, oy.T, oz.T)


# ---------------------------------------------------------------------------
# signed-digit GLV ladder: base-32 windows, digits in [-16, 15] (lane sign
# folded in) - 26 windows of 5 doublings + 2 adds vs 33 windows of 4 + 2:
# ~10% fewer mont_muls per point than the unsigned 4-bit double ladder
# ---------------------------------------------------------------------------


def _batch_exp_glv_signed_kernel(
    pprime, n_windows, p_ref, one_ref, beta_ref, x_ref, y_ref, d1_ref,
    d2_ref, ox_ref, oy_ref, oz_ref, table_ref,
):
    """Signed double ladder: per window add sign(d1)*table[|d1|] and
    sign(d2)*phi(table[|d2|]). Table holds entries 0..16 (17 slots, plane 3
    = beta*X); y is negated post-gather where the digit is negative.
    Limb-count generic like the unsigned kernel."""
    T = x_ref.shape[1]
    ops = TOps(p_ref[:], pprime, lazy=True)
    ones = one_ref[:]
    beta = beta_ref[:]
    zeros = jnp.zeros((x_ref.shape[0], T), U32)

    table_ref[0, 0] = zeros
    table_ref[0, 1] = ones
    table_ref[0, 2] = zeros
    table_ref[0, 3] = zeros
    base = (x_ref[:], y_ref[:], ones)
    table_ref[1, 0], table_ref[1, 1], table_ref[1, 2] = base
    table_ref[1, 3] = ops.mont_mul(base[0], beta)

    def build(d, prev):
        nxt = ops.jac_add(prev, base)
        table_ref[pl.ds(d, 1), 0] = nxt[0][None]
        table_ref[pl.ds(d, 1), 1] = nxt[1][None]
        table_ref[pl.ds(d, 1), 2] = nxt[2][None]
        table_ref[pl.ds(d, 1), 3] = ops.mont_mul(nxt[0], beta)[None]
        return nxt

    jax.lax.fori_loop(2, 17, build, base)

    def gather(dig_ref, w, x_plane):
        d = dig_ref[pl.ds(w, 1), :]  # (1,T) int32 in [-16, 15]
        da = jnp.abs(d)
        ex, ey, ez = zeros, ones, zeros
        for k in range(1, 17):
            m = da == k
            ex = ops.sel(m, table_ref[k, x_plane], ex)
            ey = ops.sel(m, table_ref[k, 1], ey)
            ez = ops.sel(m, table_ref[k, 2], ez)
        ey = ops.sel(d < 0, ops.sub(jnp.zeros_like(ey), ey), ey)
        return ex, ey, ez

    def window(w, acc):
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        acc = ops.jac_double(acc)
        acc = ops.jac_add(acc, gather(d1_ref, w, 0))
        acc = ops.jac_add(acc, gather(d2_ref, w, 3))  # phi: beta*X plane
        return acc

    acc = jax.lax.fori_loop(0, n_windows, window, (zeros, ones, zeros))
    ox_ref[:] = ops.canon_out(acc[0])
    oy_ref[:] = ops.canon_out(acc[1])
    oz_ref[:] = ops.canon_out(acc[2])


@functools.partial(jax.jit, static_argnums=(4, 5))
def pallas_batch_exp_glv_signed(x_t, y_t, d1_msb, d2_msb, tile: int = 512,
                                fld=None):
    """Signed GLV windowed ladder. d1_msb/d2_msb: int32[W, N] signed base-32
    digits (MSB first, lane sign folded in; glv_device.decompose_signed_*).

    `fld` as in pallas_batch_exp_glv."""
    if fld is None:
        from ..refimpl.glv import BETA

        fld = (
            tuple(_P_LIMBS),
            tuple(_ONE_MONT),
            _PPRIME,
            tuple(fp.int_to_limbs(BETA * (1 << 256) % Q)),
        )
    p_limbs, one_mont, pprime, beta_mont = fld
    nl = len(p_limbs)
    nw = d1_msb.shape[0]
    n = x_t.shape[1]
    tile = min(tile, n)
    assert n % tile == 0
    grid = (n // tile,)
    spec_const = pl.BlockSpec((nl, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec16 = pl.BlockSpec((nl, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_dig = pl.BlockSpec((nw, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nl, n), U32)] * 3
    p_col = jnp.broadcast_to(jnp.asarray(p_limbs, U32)[:, None], (nl, tile))
    one_col = jnp.broadcast_to(jnp.asarray(one_mont, U32)[:, None], (nl, tile))
    beta_col = jnp.broadcast_to(
        jnp.asarray(beta_mont, U32)[:, None], (nl, tile)
    )
    return pl.pallas_call(
        functools.partial(_batch_exp_glv_signed_kernel, pprime, nw),
        grid=grid,
        in_specs=[spec_const, spec_const, spec_const, spec16, spec16, spec_dig, spec_dig],
        out_specs=[spec16] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((17, 4, nl, tile), U32)],
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, beta_col, x_t, y_t, d1_msb, d2_msb)


def glv_signed_digit_arrays(scalars: list[int], nwin: int | None = None):
    """Host-side signed-digit recode (test oracle for the device path):
    decompose each scalar, emit signed base-32 digits MSB-first with the
    component sign folded in."""
    from ..refimpl import glv as rglv

    if nwin is None:
        from .glv_device import BN_PLAN

        nwin = BN_PLAN.windows5
    n = len(scalars)
    d1 = np.zeros((nwin, n), dtype=np.int32)
    d2 = np.zeros((nwin, n), dtype=np.int32)

    def recode(k, out, i):
        sign = -1 if k < 0 else 1
        k = abs(k)
        carry = 0
        digs = []
        for _ in range(nwin):
            t = (k & 0x1F) + carry
            k >>= 5
            carry = 1 if t >= 16 else 0
            digs.append(t - (carry << 5))
        assert k == 0 and carry == 0, "signed window count too small"
        out[:, i] = [sign * d for d in digs[::-1]]

    for i, s in enumerate(scalars):
        k1, k2 = rglv.decompose(s)
        recode(k1, d1, i)
        recode(k2, d2, i)
    return d1, d2


def batch_exp_transposed_glv_signed(batch_x, batch_y, scalars: list[int], tile: int = 512):
    from ..curve import group as G

    d1, d2 = glv_signed_digit_arrays(scalars)
    ox, oy, oz = pallas_batch_exp_glv_signed(
        batch_x.T, batch_y.T, jnp.asarray(d1), jnp.asarray(d2), tile
    )
    return G.JacobianBatch(ox.T, oy.T, oz.T)


# ---------------------------------------------------------------------------
# GLS quarter-length G2 ladder: k = k0 + k1*L + k2*L^2 + k3*L^3,
# psi(x, y) = (conj(x)*C1, conj(y)*C2) acts as [L] on G2 (refimpl/gls.py)
# ---------------------------------------------------------------------------
#
# psi powers collapse to cheap plane ops because conj . conj = id and
# Norm(c) = c*conj(c) lands in Fq:
#   psi^1(x,y,z) = (conj(x)*C1,      conj(y)*C2,      conj(z))
#   psi^2(x,y,z) = (x*N1,            y*N2,            z)        N_i in Fq
#   psi^3(x,y,z) = (conj(x)*N1*C1,   conj(y)*N2*C2,   conj(z))
# (valid on Jacobian coords: conj is a field automorphism, so
# x_aff = X/Z^2 conjugates coordinate-wise).

GLS_WINDOWS = 17  # ceil(67+pad / 4) bits of |k_i|


def _gls_constants():
    from ..refimpl.gls import G2C1, G2C2

    n1 = G2C1 * G2C1.conjugate()
    n2 = G2C2 * G2C2.conjugate()
    assert n1.c1 == 0 and n2.c1 == 0  # norms are Fq scalars
    c31 = G2C1 * n1.c0
    c32 = G2C2 * n2.c0
    vals = [
        G2C1.c0, G2C1.c1, G2C2.c0, G2C2.c1,
        n1.c0, n2.c0, c31.c0, c31.c1, c32.c0, c32.c1,
    ]
    return np.stack([fp.int_to_limbs(v * (1 << 256) % Q) for v in vals])


def _batch_exp_gls_kernel(
    p_ref, one_ref, c_ref, x0_ref, x1_ref, y0_ref, y1_ref,
    d0_ref, d1_ref, d2_ref, d3_ref, neg_ref,
    ox0_ref, ox1_ref, oy0_ref, oy1_ref, oz0_ref, oz1_ref, table_ref,
):
    """Quarter-length quad ladder: per window add psi^i(table[d_i]) for
    i = 0..3 with per-lane sign masks (neg_ref rows 0..3 -> k0..k3).

    c_ref planes: 0,1 = C1; 2,3 = C2; 4 = N1; 5 = N2; 6,7 = N1*C1;
    8,9 = N2*C2 (all Montgomery form)."""
    T = x0_ref.shape[1]
    NL = x0_ref.shape[0]
    fops = TOps(p_ref[:], lazy=True)
    ops = T2Ops(fops)
    onep = one_ref[:]
    zerop = jnp.zeros((NL, T), U32)
    one2 = (onep, zerop)
    zero2 = (zerop, zerop)
    C1 = (c_ref[0], c_ref[1])
    C2 = (c_ref[2], c_ref[3])
    N1 = c_ref[4]
    N2 = c_ref[5]
    C31 = (c_ref[6], c_ref[7])
    C32 = (c_ref[8], c_ref[9])

    def store(d, P):
        (x0, x1), (y0, y1), (z0, z1) = P
        for c, v in enumerate((x0, x1, y0, y1, z0, z1)):
            if isinstance(d, int):
                table_ref[d, c] = v
            else:
                table_ref[d, c] = v[None]

    store(0, (zero2, one2, zero2))
    base = ((x0_ref[:], x1_ref[:]), (y0_ref[:], y1_ref[:]), one2)
    store(1, base)

    def build(d, prev):
        nxt = jac_add(ops, prev, base)
        store(pl.ds(d, 1), nxt)
        return nxt

    jax.lax.fori_loop(2, 16, build, base)

    def conj2(a):
        return (a[0], fops.sub(zerop, a[1]))

    def psi_apply(i, x, y, z):
        if i == 0:
            return x, y, z
        if i == 1:
            return ops.mul(conj2(x), C1), ops.mul(conj2(y), C2), conj2(z)
        if i == 2:
            return (
                (fops.mont_mul(x[0], N1), fops.mont_mul(x[1], N1)),
                (fops.mont_mul(y[0], N2), fops.mont_mul(y[1], N2)),
                z,
            )
        return ops.mul(conj2(x), C31), ops.mul(conj2(y), C32), conj2(z)

    digs = (d0_ref, d1_ref, d2_ref, d3_ref)

    def window(w, acc):
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        for i in range(4):
            d = digs[i][pl.ds(w, 1), :]
            ex, ey, ez = zero2, one2, zero2
            for k in range(1, 16):
                m = d == k
                ex = ops.sel(m, (table_ref[k, 0], table_ref[k, 1]), ex)
                ey = ops.sel(m, (table_ref[k, 2], table_ref[k, 3]), ey)
                ez = ops.sel(m, (table_ref[k, 4], table_ref[k, 5]), ez)
            ex, ey, ez = psi_apply(i, ex, ey, ez)
            ng = neg_ref[i : i + 1, :] != 0
            ey = ops.sel(ng, (fops.sub(zerop, ey[0]), fops.sub(zerop, ey[1])), ey)
            acc = jac_add(ops, acc, (ex, ey, ez))
        return acc

    acc = jax.lax.fori_loop(0, GLS_WINDOWS, window, (zero2, one2, zero2))
    (ox0_ref[:], ox1_ref[:]) = ops.canon_out(acc[0])
    (oy0_ref[:], oy1_ref[:]) = ops.canon_out(acc[1])
    (oz0_ref[:], oz1_ref[:]) = ops.canon_out(acc[2])


@functools.partial(jax.jit, static_argnums=(6,))
def pallas_batch_exp_gls(x0, x1, y0, y1, digits, negs, tile: int = 128):
    """GLS quad ladder over transposed Fq2 planes uint32[16, N].

    digits: int32[4, 17, N] 4-bit windows of |k_i| (MSB first);
    negs: int32[4, N] sign flags. BN254-only (the psi constants)."""
    n = x0.shape[1]
    tile = min(tile, n)
    assert n % tile == 0
    grid = (n // tile,)
    spec_const = pl.BlockSpec((NLIMBS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_c10 = pl.BlockSpec((10, NLIMBS, tile), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    spec16 = pl.BlockSpec((NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_dig = pl.BlockSpec((GLS_WINDOWS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_neg = pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((NLIMBS, n), U32)] * 6
    p_col = jnp.broadcast_to(jnp.asarray(_P_LIMBS)[:, None], (NLIMBS, tile))
    one_col = jnp.broadcast_to(jnp.asarray(_ONE_MONT)[:, None], (NLIMBS, tile))
    c_cols = jnp.broadcast_to(
        jnp.asarray(_gls_constants())[:, :, None], (10, NLIMBS, tile)
    )
    return pl.pallas_call(
        _batch_exp_gls_kernel,
        grid=grid,
        in_specs=[spec_const, spec_const, spec_c10, spec16, spec16, spec16, spec16,
                  spec_dig, spec_dig, spec_dig, spec_dig, spec_neg],
        out_specs=[spec16] * 6,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((16, 6, NLIMBS, tile), U32)],
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, c_cols, x0, x1, y0, y1,
      digits[0], digits[1], digits[2], digits[3], negs)


def batch_exp_transposed_gls(batch_x, batch_y, scalars: list[int], tile: int = 128):
    """AffineBatch Fq2 coord arrays ((N,2,16) layout) + scalar ints ->
    JacobianBatch via the GLS quad ladder (host decomposition)."""
    from ..curve import group as G
    from . import gls_device

    digits, negs = gls_device.gls_digit_arrays(scalars)
    x0, x1 = batch_x[:, 0].T, batch_x[:, 1].T
    y0, y1 = batch_y[:, 0].T, batch_y[:, 1].T
    ox0, ox1, oy0, oy1, oz0, oz1 = pallas_batch_exp_gls(
        x0, x1, y0, y1, jnp.asarray(digits), jnp.asarray(negs), tile
    )

    def pack(c0, c1):
        return jnp.stack([c0.T, c1.T], axis=-2)

    return G.JacobianBatch(pack(ox0, ox1), pack(oy0, oy1), pack(oz0, oz1))


def _batch_exp_gls_signed_kernel(
    n_windows, p_ref, one_ref, c_ref, x0_ref, x1_ref, y0_ref, y1_ref,
    d0_ref, d1_ref, d2_ref, d3_ref,
    ox0_ref, ox1_ref, oy0_ref, oy1_ref, oz0_ref, oz1_ref, table_ref,
):
    """Signed quad ladder: per window add sign(d_i)*psi^i(table[|d_i|]),
    d_i in [-16, 16] (component signs folded into the digits upstream).
    14 windows of 5 doublings + 4 adds vs the unsigned 17 x 4 + 4."""
    T = x0_ref.shape[1]
    NL = x0_ref.shape[0]
    fops = TOps(p_ref[:], lazy=True)
    ops = T2Ops(fops)
    onep = one_ref[:]
    zerop = jnp.zeros((NL, T), U32)
    one2 = (onep, zerop)
    zero2 = (zerop, zerop)
    C1 = (c_ref[0], c_ref[1])
    C2 = (c_ref[2], c_ref[3])
    N1 = c_ref[4]
    N2 = c_ref[5]
    C31 = (c_ref[6], c_ref[7])
    C32 = (c_ref[8], c_ref[9])

    def store(d, P):
        (x0, x1), (y0, y1), (z0, z1) = P
        for c, v in enumerate((x0, x1, y0, y1, z0, z1)):
            if isinstance(d, int):
                table_ref[d, c] = v
            else:
                table_ref[d, c] = v[None]

    store(0, (zero2, one2, zero2))
    base = ((x0_ref[:], x1_ref[:]), (y0_ref[:], y1_ref[:]), one2)
    store(1, base)

    def build(d, prev):
        nxt = jac_add(ops, prev, base)
        store(pl.ds(d, 1), nxt)
        return nxt

    jax.lax.fori_loop(2, 17, build, base)

    def conj2(a):
        return (a[0], fops.sub(zerop, a[1]))

    def psi_apply(i, x, y, z):
        if i == 0:
            return x, y, z
        if i == 1:
            return ops.mul(conj2(x), C1), ops.mul(conj2(y), C2), conj2(z)
        if i == 2:
            return (
                (fops.mont_mul(x[0], N1), fops.mont_mul(x[1], N1)),
                (fops.mont_mul(y[0], N2), fops.mont_mul(y[1], N2)),
                z,
            )
        return ops.mul(conj2(x), C31), ops.mul(conj2(y), C32), conj2(z)

    digs = (d0_ref, d1_ref, d2_ref, d3_ref)

    def window(w, acc):
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        acc = jac_double(ops, acc)
        for i in range(4):
            d = digs[i][pl.ds(w, 1), :]
            da = jnp.abs(d)
            ex, ey, ez = zero2, one2, zero2
            for k in range(1, 17):
                m = da == k
                ex = ops.sel(m, (table_ref[k, 0], table_ref[k, 1]), ex)
                ey = ops.sel(m, (table_ref[k, 2], table_ref[k, 3]), ey)
                ez = ops.sel(m, (table_ref[k, 4], table_ref[k, 5]), ez)
            ex, ey, ez = psi_apply(i, ex, ey, ez)
            ng = d < 0
            ey = ops.sel(ng, (fops.sub(zerop, ey[0]), fops.sub(zerop, ey[1])), ey)
            acc = jac_add(ops, acc, (ex, ey, ez))
        return acc

    acc = jax.lax.fori_loop(0, n_windows, window, (zero2, one2, zero2))
    (ox0_ref[:], ox1_ref[:]) = ops.canon_out(acc[0])
    (oy0_ref[:], oy1_ref[:]) = ops.canon_out(acc[1])
    (oz0_ref[:], oz1_ref[:]) = ops.canon_out(acc[2])


@functools.partial(jax.jit, static_argnums=(5,))
def pallas_batch_exp_gls_signed(x0, x1, y0, y1, digits, tile: int = 128):
    """Signed GLS quad ladder over transposed Fq2 planes uint32[16, N].

    digits: int32[4, W, N] signed base-32 windows (MSB first, component
    signs folded in; gls_device.decompose_signed_device_t)."""
    n = x0.shape[1]
    nw = digits.shape[1]
    tile = min(tile, n)
    assert n % tile == 0
    grid = (n // tile,)
    spec_const = pl.BlockSpec((NLIMBS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_c10 = pl.BlockSpec((10, NLIMBS, tile), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    spec16 = pl.BlockSpec((NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_dig = pl.BlockSpec((nw, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((NLIMBS, n), U32)] * 6
    p_col = jnp.broadcast_to(jnp.asarray(_P_LIMBS)[:, None], (NLIMBS, tile))
    one_col = jnp.broadcast_to(jnp.asarray(_ONE_MONT)[:, None], (NLIMBS, tile))
    c_cols = jnp.broadcast_to(
        jnp.asarray(_gls_constants())[:, :, None], (10, NLIMBS, tile)
    )
    return pl.pallas_call(
        functools.partial(_batch_exp_gls_signed_kernel, nw),
        grid=grid,
        in_specs=[spec_const, spec_const, spec_c10, spec16, spec16, spec16, spec16,
                  spec_dig, spec_dig, spec_dig, spec_dig],
        out_specs=[spec16] * 6,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((17, 6, NLIMBS, tile), U32)],
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, c_cols, x0, x1, y0, y1,
      digits[0], digits[1], digits[2], digits[3])


def batch_exp_transposed_gls_signed(batch_x, batch_y, scalars: list[int], tile: int = 128):
    """Signed-digit GLS quad ladder (host recode oracle path)."""
    from ..curve import group as G
    from . import gls_device

    digits = gls_device.gls_signed_digit_arrays(scalars)
    x0, x1 = batch_x[:, 0].T, batch_x[:, 1].T
    y0, y1 = batch_y[:, 0].T, batch_y[:, 1].T
    ox0, ox1, oy0, oy1, oz0, oz1 = pallas_batch_exp_gls_signed(
        x0, x1, y0, y1, jnp.asarray(digits), tile
    )

    def pack(c0, c1):
        return jnp.stack([c0.T, c1.T], axis=-2)

    return G.JacobianBatch(pack(ox0, ox1), pack(oy0, oy1), pack(oz0, oz1))


# ---------------------------------------------------------------------------
# host-facing wrapper matching ops.backend conventions
# ---------------------------------------------------------------------------

def batch_exp_transposed(batch_x, batch_y, scalars_canon, tile: int = 512):
    """AffineBatch coord arrays ((N,16) layout) + canonical scalars ->
    JacobianBatch ((N,16) layout) via the fused kernel."""
    from ..curve import group as G

    x_t = batch_x.T
    y_t = batch_y.T
    digits = G.scalar_windows(scalars_canon)  # (N, 64) LSB-first
    digits_msb = jnp.flip(digits, axis=-1).T.astype(jnp.int32)  # (64, N)
    ox, oy, oz = pallas_batch_exp(x_t, y_t, digits_msb, tile)
    return G.JacobianBatch(ox.T, oy.T, oz.T)


# ---------------------------------------------------------------------------
# transposed Fr scalar glue (tau powers, Montgomery exit, window extraction)
# ---------------------------------------------------------------------------
#
# The tau-power ladder and windowing used to run through the row-major
# [N, 16] fp kernels, wasting 7/8 of every vector and costing more wall
# clock than the ladder kernel itself. TOps is plain jnp, so the same
# transposed-limb code runs as regular XLA ops outside pallas_call.

from ..refimpl.field import R_MOD as _R_MOD  # noqa: E402

_FR_P_LIMBS = fp.int_to_limbs(_R_MOD)
_FR_PPRIME = (-pow(_R_MOD, -1, 1 << 16)) % (1 << 16)


def fr_tops() -> TOps:
    """Transposed-limb Fr ops usable under plain jit (non-lazy: canonical)."""
    return TOps(jnp.asarray(_FR_P_LIMBS)[:, None], _FR_PPRIME)


def tau_powers_t(tau_start, tau_pows, coeff, log2n: int) -> jnp.ndarray:
    """coeff * tau^(start+i) for i in [0, 2^log2n), canonical, transposed.

    tau_start/coeff: (16,) Montgomery Fr limbs; tau_pows[j]: (16,) Montgomery
    limbs of tau^(2^j). Log-doubling: P_{2k} = [P_k, P_k * tau^k]. Returns
    uint32[16, 2^log2n] CANONICAL scalars (Montgomery exit fused: one REDC
    by integer 1)."""
    ops = fr_tops()
    out = tau_start[:, None]
    for j in range(log2n):
        out = jnp.concatenate([out, ops.mont_mul(out, tau_pows[j][:, None])], axis=1)
    out = ops.mont_mul(out, coeff[:, None])
    one_int = jnp.concatenate(
        [jnp.ones((1, 1), U32), jnp.zeros((NLIMBS - 1, 1), U32)], axis=0
    )
    return ops.mont_mul(out, one_int)  # REDC(x * 1) = from_mont


def scalar_windows_t_msb(scalars_t: jnp.ndarray) -> jnp.ndarray:
    """uint32[16, N] canonical -> int32[64, N] 4-bit windows, MSB first
    (the digit layout of pallas_batch_exp / the G2 ladder)."""
    rows = []
    for w in range(N_WINDOWS):
        limb, s = divmod(4 * w, 16)
        rows.append(((scalars_t[limb : limb + 1] >> s) & 0xF).astype(jnp.int32))
    return jnp.concatenate(rows[::-1], axis=0)
