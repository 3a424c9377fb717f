"""Field-ops adapters: a uniform vectorized interface over Fq and Fq2.

The curve layer (curve/group.py) is generic over a `FieldOps` object, the
TPU analog of the reference's `curve_impl!` macro being instantiated for both
G1/Fq and G2/Fq2 (/root/reference/pairing/src/bn256/ec.rs:631-650,1070-1089).

Element layout: Fq = uint32[..., 16]; Fq2 = uint32[..., 2, 16] (c0 at index 0).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import fp
from .fp import FpContext


class FqOps:
    """Vectorized Fq ops (thin veneer over field.fp)."""

    def __init__(self, ctx: FpContext):
        self.ctx = ctx
        self.components = 1

    def __hash__(self):
        return hash(("fq", self.ctx))

    def __eq__(self, o):
        return isinstance(o, FqOps) and o.ctx == self.ctx

    def add(self, a, b):
        return fp.add(self.ctx, a, b)

    def sub(self, a, b):
        return fp.sub(self.ctx, a, b)

    def mul(self, a, b):
        return fp.mont_mul(self.ctx, a, b)

    def sqr(self, a):
        return fp.mont_mul(self.ctx, a, a)

    def neg(self, a):
        return fp.neg(self.ctx, a)

    def is_zero(self, a):
        return fp.is_zero(a)

    def eq(self, a, b):
        return fp.eq(a, b)

    def zeros(self, batch_shape=()):
        return self.ctx.zeros(batch_shape)

    def ones(self, batch_shape=()):
        return self.ctx.ones_mont(batch_shape)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None], a, b)

    def batch_inv(self, a):
        return fp.batch_inv(self.ctx, a)

    def pow_fixed(self, a, e: int):
        return fp.pow_fixed(self.ctx, a, e)

    def double(self, a):
        return fp.add(self.ctx, a, a)


class Fq2Ops:
    """Vectorized Fq2 = Fq[u]/(u^2+1) ops (Karatsuba mul, as fq2.rs:112-204)."""

    def __init__(self, ctx: FpContext):
        self.ctx = ctx
        self.components = 2

    def __hash__(self):
        return hash(("fq2", self.ctx))

    def __eq__(self, o):
        return isinstance(o, Fq2Ops) and o.ctx == self.ctx

    # component helpers
    @staticmethod
    def c(a, i):
        return a[..., i, :]

    @staticmethod
    def pack(c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def add(self, a, b):
        return self.pack(
            fp.add(self.ctx, self.c(a, 0), self.c(b, 0)),
            fp.add(self.ctx, self.c(a, 1), self.c(b, 1)),
        )

    def sub(self, a, b):
        return self.pack(
            fp.sub(self.ctx, self.c(a, 0), self.c(b, 0)),
            fp.sub(self.ctx, self.c(a, 1), self.c(b, 1)),
        )

    def mul(self, a, b):
        a0, a1 = self.c(a, 0), self.c(a, 1)
        b0, b1 = self.c(b, 0), self.c(b, 1)
        v0 = fp.mont_mul(self.ctx, a0, b0)
        v1 = fp.mont_mul(self.ctx, a1, b1)
        c0 = fp.sub(self.ctx, v0, v1)
        t = fp.mont_mul(self.ctx, fp.add(self.ctx, a0, a1), fp.add(self.ctx, b0, b1))
        c1 = fp.sub(self.ctx, fp.sub(self.ctx, t, v0), v1)
        return self.pack(c0, c1)

    def sqr(self, a):
        a0, a1 = self.c(a, 0), self.c(a, 1)
        # (a0+a1)(a0-a1) + 2 a0 a1 u
        c0 = fp.mont_mul(self.ctx, fp.add(self.ctx, a0, a1), fp.sub(self.ctx, a0, a1))
        m = fp.mont_mul(self.ctx, a0, a1)
        c1 = fp.add(self.ctx, m, m)
        return self.pack(c0, c1)

    def neg(self, a):
        return self.pack(fp.neg(self.ctx, self.c(a, 0)), fp.neg(self.ctx, self.c(a, 1)))

    def conjugate(self, a):
        return self.pack(self.c(a, 0), fp.neg(self.ctx, self.c(a, 1)))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def zeros(self, batch_shape=()):
        return jnp.zeros((*batch_shape, 2, self.ctx.nlimbs), dtype=fp.U32)

    def ones(self, batch_shape=()):
        return self.pack(self.ctx.ones_mont(batch_shape), self.ctx.zeros(batch_shape))

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    def batch_inv(self, a):
        """Batched Fq2 inverse via the norm map (fq2.rs norm/inverse)."""
        a0, a1 = self.c(a, 0), self.c(a, 1)
        n = fp.add(
            self.ctx, fp.mont_mul(self.ctx, a0, a0), fp.mont_mul(self.ctx, a1, a1)
        )
        ninv = fp.batch_inv(self.ctx, n)
        return self.pack(
            fp.mont_mul(self.ctx, a0, ninv),
            fp.neg(self.ctx, fp.mont_mul(self.ctx, a1, ninv)),
        )

    def pow_fixed(self, a, e: int):
        import numpy as np
        import jax

        nbits = max(e.bit_length(), 1)
        ebits = jnp.asarray(np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32))
        res0 = self.ones(a.shape[:-2])

        def body(i, carry):
            res, base = carry
            bit = ebits[i]
            res = self.select((bit == 1) & jnp.ones(a.shape[:-2], dtype=bool), self.mul(res, base), res)
            return res, self.sqr(base)

        res, _ = jax.lax.fori_loop(0, nbits, body, (res0, a))
        return res

    def double(self, a):
        return self.add(a, a)
