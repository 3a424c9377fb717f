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
    """Transposed-layout Fq ops on uint32[16, T] blocks.

    `p` is the modulus as a (16, 1) column (a traced kernel input)."""

    def __init__(self, p_col):
        self.p = p_col
        self.pprime = jnp.uint32(_PPRIME)

    # -- field ------------------------------------------------------------
    def mont_mul(self, a, b):
        T = a.shape[1]
        p = self.p
        pprime = self.pprime

        # t: rows 0..15 = low digits, row 16 = running top digit. Unrolled
        # CIOS written with slices/concats only (Mosaic has no scatter-add,
        # and cannot dynamic-slice loaded values).
        t16 = jnp.zeros((NLIMBS, T), U32)
        top = jnp.zeros((1, T), U32)
        for i in range(NLIMBS):
            prod = a[i : i + 1] * b  # (16,T)
            lo = prod & MASK
            hi = prod >> 16
            t16 = t16 + lo
            m = (t16[0:1] * pprime) & MASK
            qprod = m * p
            t16 = t16 + (qprod & MASK)
            hi_sum = hi + (qprod >> 16)  # contributes to rows 1..16
            carry = t16[0:1] >> 16
            shifted = jnp.concatenate([t16[1:NLIMBS], top], axis=0) + hi_sum
            t16 = jnp.concatenate([shifted[0:1] + carry, shifted[1:]], axis=0)
            top = jnp.zeros((1, T), U32)
        return self._sub_p_if_ge(self._canon(t16))

    @staticmethod
    def _canon(t):
        digits = []
        c = jnp.zeros((1, t.shape[1]), U32)
        for j in range(NLIMBS):
            v = t[j : j + 1] + c
            digits.append(v & MASK)
            c = v >> 16
        return jnp.concatenate(digits, axis=0)

    def _sub_p_if_ge(self, a):
        ai = a.astype(jnp.int32)
        pi = self.p.astype(jnp.int32)
        borrow = jnp.zeros((1, a.shape[1]), jnp.int32)
        digits = []
        for j in range(NLIMBS):
            d = ai[j : j + 1] - pi[j : j + 1] - borrow
            borrow = (d < 0).astype(jnp.int32)
            digits.append((d + (borrow << 16)).astype(U32))
        diff = jnp.concatenate(digits, axis=0)
        return jnp.where(borrow == 0, diff, a)

    def add(self, a, b):
        s = []
        c = jnp.zeros((1, a.shape[1]), U32)
        for j in range(NLIMBS):
            v = a[j : j + 1] + b[j : j + 1] + c
            s.append(v & MASK)
            c = v >> 16
        return self._sub_p_if_ge(jnp.concatenate(s, axis=0))

    def sub(self, a, b):
        ai = a.astype(jnp.int32)
        bi = b.astype(jnp.int32)
        borrow = jnp.zeros((1, a.shape[1]), jnp.int32)
        digits = []
        for j in range(NLIMBS):
            d = ai[j : j + 1] - bi[j : j + 1] - borrow
            borrow = (d < 0).astype(jnp.int32)
            digits.append((d + (borrow << 16)).astype(U32))
        diff = jnp.concatenate(digits, axis=0)
        pi = self.p
        carry = jnp.zeros((1, a.shape[1]), U32)
        digits2 = []
        for j in range(NLIMBS):
            v = diff[j : j + 1] + pi[j : j + 1] + carry
            digits2.append(v & MASK)
            carry = v >> 16
        wrapped = jnp.concatenate(digits2, axis=0)
        return jnp.where(borrow != 0, wrapped, diff)

    def dbl(self, a):
        return self.add(a, a)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=0, keepdims=True)  # (1,T)

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=0, keepdims=True)

    @staticmethod
    def sel(mask, a, b):
        return jnp.where(mask, a, b)

    # -- Jacobian group law -----------------------------------------------
    def jac_double(self, P):
        x, y, z = P
        a = self.mont_mul(x, x)
        b = self.mont_mul(y, y)
        c = self.mont_mul(b, b)
        xb = self.add(x, b)
        d = self.sub(self.sub(self.mont_mul(xb, xb), a), c)
        d = self.add(d, d)
        e = self.add(self.add(a, a), a)
        f = self.mont_mul(e, e)
        z3 = self.dbl(self.mont_mul(z, y))
        x3 = self.sub(f, self.add(d, d))
        c8 = self.dbl(self.dbl(self.dbl(c)))
        y3 = self.sub(self.mont_mul(self.sub(d, x3), e), c8)
        return x3, y3, z3

    def jac_add(self, P, Qp):
        px, py, pz = P
        qx, qy, qz = Qp
        p_inf = self.is_zero(pz)
        q_inf = self.is_zero(qz)
        z1z1 = self.mont_mul(pz, pz)
        z2z2 = self.mont_mul(qz, qz)
        u1 = self.mont_mul(px, z2z2)
        u2 = self.mont_mul(qx, z1z1)
        s1 = self.mont_mul(self.mont_mul(py, qz), z2z2)
        s2 = self.mont_mul(self.mont_mul(qy, pz), z1z1)
        eq_x = self.eq(u1, u2)
        eq_y = self.eq(s1, s2)
        h = self.sub(u2, u1)
        hh = self.add(h, h)
        i = self.mont_mul(hh, hh)
        j = self.mont_mul(h, i)
        r = self.dbl(self.sub(s2, s1))
        v = self.mont_mul(u1, i)
        x3 = self.sub(self.sub(self.mont_mul(r, r), j), self.add(v, v))
        s1j = self.mont_mul(s1, j)
        y3 = self.sub(self.mont_mul(self.sub(v, x3), r), self.add(s1j, s1j))
        zz = self.add(pz, qz)
        z3 = self.mont_mul(self.sub(self.sub(self.mont_mul(zz, zz), z1z1), z2z2), h)

        dx, dy, dz = self.jac_double(P)
        is_dbl = eq_x & eq_y & ~p_inf & ~q_inf
        is_cancel = eq_x & ~eq_y & ~p_inf & ~q_inf
        x = self.sel(is_dbl, dx, x3)
        y = self.sel(is_dbl, dy, y3)
        z = self.sel(is_dbl, dz, z3)
        z = self.sel(is_cancel, jnp.zeros_like(z), z)
        x = self.sel(q_inf, px, x)
        y = self.sel(q_inf, py, y)
        z = self.sel(q_inf, pz, z)
        x = self.sel(p_inf, qx, x)
        y = self.sel(p_inf, qy, y)
        z = self.sel(p_inf, qz, z)
        return x, y, z


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

N_WINDOWS = 64


def _batch_exp_kernel(p_ref, one_ref, x_ref, y_ref, dig_ref, ox_ref, oy_ref, oz_ref, table_ref):
    """One batch tile; dig_ref[w] holds 4-bit window 63-w (MSB first)."""
    T = x_ref.shape[1]
    ops = TOps(p_ref[:])
    ones = one_ref[:]  # Montgomery one, replicated (16, T) block
    zeros = jnp.zeros((NLIMBS, T), U32)

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

    acc = jax.lax.fori_loop(0, N_WINDOWS, window, (zeros, ones, zeros))
    ox_ref[:], oy_ref[:], oz_ref[:] = acc


@functools.partial(jax.jit, static_argnums=(3,))
def pallas_batch_exp(x_t, y_t, digits_msb, tile: int = 256):
    """x_t, y_t: uint32[16, N] transposed affine coords (Montgomery form, no
    infinities); digits_msb: int32[64, N] windows MSB-first. Returns
    transposed Jacobian (x, y, z) uint32[16, N]."""
    n = x_t.shape[1]
    assert n % tile == 0
    grid = (n // tile,)
    spec_const = pl.BlockSpec((NLIMBS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec16 = pl.BlockSpec((NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_dig = pl.BlockSpec((N_WINDOWS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((NLIMBS, n), U32)] * 3
    p_col = jnp.broadcast_to(jnp.asarray(_P_LIMBS)[:, None], (NLIMBS, tile))
    one_col = jnp.broadcast_to(jnp.asarray(_ONE_MONT)[:, None], (NLIMBS, tile))
    return pl.pallas_call(
        _batch_exp_kernel,
        grid=grid,
        in_specs=[spec_const, spec_const, spec16, spec16, spec_dig],
        out_specs=[spec16] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((16, 3, NLIMBS, tile), U32)],
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, x_t, y_t, digits_msb)


# ---------------------------------------------------------------------------
# host-facing wrapper matching ops.backend conventions
# ---------------------------------------------------------------------------

def batch_exp_transposed(batch_x, batch_y, scalars_canon, tile: int = 256):
    """AffineBatch coord arrays ((N,16) layout) + canonical scalars ->
    JacobianBatch ((N,16) layout) via the fused kernel."""
    from ..curve import group as G

    x_t = batch_x.T
    y_t = batch_y.T
    digits = G.scalar_windows(scalars_canon)  # (N, 64) LSB-first
    digits_msb = jnp.flip(digits, axis=-1).T.astype(jnp.int32)  # (64, N)
    ox, oy, oz = pallas_batch_exp(x_t, y_t, digits_msb, tile)
    return G.JacobianBatch(ox.T, oy.T, oz.T)
