"""Device field kernels vs the exact Python spec (refimpl.field).

Mirror of the reference's random field property tests
(/root/reference/pairing/src/tests/field.rs:56-266), executed as cross-checks
between the vectorized limb kernels and Python bigints.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.field.fq2 import Fq2Ops, FqOps
from phase2_bn254_tpu.refimpl.field import Q, R_MOD, Fq2

random.seed(42)

CTX_Q = fp.FpContext(Q, "fq")
CTX_R = fp.FpContext(R_MOD, "fr")


def mont_arr(ctx, vals):
    return jnp.asarray(np.stack([fp.int_to_limbs(ctx.to_mont_int(v)) for v in vals]))


def out_ints(ctx, arr):
    arr = np.asarray(arr)
    return [ctx.from_mont_int(fp.limbs_to_int(arr[i])) for i in range(arr.shape[0])]


@pytest.mark.parametrize("ctx", [CTX_Q, CTX_R], ids=["fq", "fr"])
def test_field_ops(ctx):
    N = 32
    xs = [random.randrange(ctx.p) for _ in range(N)]
    ys = [random.randrange(ctx.p) for _ in range(N)]
    xs[0] = 0  # exercise zero handling
    ys[1] = ctx.p - 1
    A, B = mont_arr(ctx, xs), mont_arr(ctx, ys)

    assert out_ints(ctx, fp.mont_mul(ctx, A, B)) == [(x * y) % ctx.p for x, y in zip(xs, ys)]
    assert out_ints(ctx, fp.add(ctx, A, B)) == [(x + y) % ctx.p for x, y in zip(xs, ys)]
    assert out_ints(ctx, fp.sub(ctx, A, B)) == [(x - y) % ctx.p for x, y in zip(xs, ys)]
    assert out_ints(ctx, fp.neg(ctx, A)) == [(-x) % ctx.p for x in xs]
    assert out_ints(ctx, fp.pow_fixed(ctx, A, 17)) == [pow(x, 17, ctx.p) for x in xs]


def test_inverse_and_batch_inverse():
    N = 16
    xs = [random.randrange(1, Q) for _ in range(N)]
    xs[3] = 0
    A = mont_arr(CTX_Q, xs)
    expect = [pow(x, -1, Q) if x else 0 for x in xs]
    assert out_ints(CTX_Q, fp.inv(CTX_Q, A)) == expect
    assert out_ints(CTX_Q, fp.batch_inv(CTX_Q, A)) == expect


def test_mont_roundtrip_and_compare():
    N = 16
    xs = [random.randrange(Q) for _ in range(N)]
    ys = [random.randrange(Q) for _ in range(N)]
    A = mont_arr(CTX_Q, xs)
    C = fp.from_mont(CTX_Q, A)
    assert [fp.limbs_to_int(np.asarray(C)[i]) for i in range(N)] == xs
    assert bool(jnp.all(fp.to_mont(CTX_Q, C) == A))
    D = fp.from_mont(CTX_Q, mont_arr(CTX_Q, ys))
    g = np.asarray(fp.gt(C, D))
    assert [bool(v) for v in g] == [x > y for x, y in zip(xs, ys)]


def test_fq2_ops():
    f2 = Fq2Ops(CTX_Q)
    N = 8
    a2 = [Fq2(random.randrange(Q), random.randrange(Q)) for _ in range(N)]
    b2 = [Fq2(random.randrange(Q), random.randrange(Q)) for _ in range(N)]

    def pack(vals):
        return jnp.stack(
            [mont_arr(CTX_Q, [v.c0 for v in vals]), mont_arr(CTX_Q, [v.c1 for v in vals])],
            axis=-2,
        )

    def unpack(arr):
        c0 = out_ints(CTX_Q, arr[:, 0])
        c1 = out_ints(CTX_Q, arr[:, 1])
        return [Fq2(x, y) for x, y in zip(c0, c1)]

    A2, B2 = pack(a2), pack(b2)
    assert unpack(f2.mul(A2, B2)) == [x * y for x, y in zip(a2, b2)]
    assert unpack(f2.sqr(A2)) == [x.square() for x in a2]
    assert unpack(f2.add(A2, B2)) == [x + y for x, y in zip(a2, b2)]
    assert unpack(f2.sub(A2, B2)) == [x - y for x, y in zip(a2, b2)]
    assert unpack(f2.batch_inv(A2)) == [x.inverse() for x in a2]
    assert unpack(f2.pow_fixed(A2, 9)) == [x.pow(9) for x in a2]
