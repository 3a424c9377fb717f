"""Device curve kernels vs the exact Python group law.

Mirror of the reference's curve_tests / random_transformation_tests
(/root/reference/pairing/src/tests/curve.rs) as device-vs-bigint cross-checks,
including the masked exceptional cases (doubling, P + (-P), infinity).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from phase2_bn254_tpu.curve import group as G
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.field.fq2 import Fq2Ops, FqOps
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import Q, R_MOD, Fq2

random.seed(7)
CTX = fp.FpContext(Q, "fq")
FQ = FqOps(CTX)
FQ2 = Fq2Ops(CTX)


def fq_arr(vals):
    return jnp.asarray(np.stack([fp.int_to_limbs(CTX.to_mont_int(v)) for v in vals]))


def fq2_arr(vals):
    return jnp.stack(
        [fq_arr([v.c0 for v in vals]), fq_arr([v.c1 for v in vals])], axis=-2
    )


def pack_points(pts):
    group = pts[0].group
    if group == "g1":
        x = fq_arr([p.x if not p.inf else 0 for p in pts])
        y = fq_arr([p.y if not p.inf else 1 for p in pts])
    else:
        x = fq2_arr([p.x if not p.inf else Fq2(0, 0) for p in pts])
        y = fq2_arr([p.y if not p.inf else Fq2(1, 0) for p in pts])
    return G.AffineBatch(x, y, jnp.asarray([p.inf for p in pts]))


def unpack_points(out: G.AffineBatch, group: str):
    xs, ys, infs = np.asarray(out.x), np.asarray(out.y), np.asarray(out.inf)
    pts = []
    for i in range(xs.shape[0]):
        if infs[i]:
            pts.append(rc.point_zero(group))
        elif group == "g1":
            pts.append(
                rc.Point(
                    CTX.from_mont_int(fp.limbs_to_int(xs[i])),
                    CTX.from_mont_int(fp.limbs_to_int(ys[i])),
                    False,
                    "g1",
                )
            )
        else:
            pts.append(
                rc.Point(
                    Fq2(
                        CTX.from_mont_int(fp.limbs_to_int(xs[i, 0])),
                        CTX.from_mont_int(fp.limbs_to_int(xs[i, 1])),
                    ),
                    Fq2(
                        CTX.from_mont_int(fp.limbs_to_int(ys[i, 0])),
                        CTX.from_mont_int(fp.limbs_to_int(ys[i, 1])),
                    ),
                    False,
                    "g2",
                )
            )
    return pts


def rand_g1(n):
    return [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]


def rand_g2(n):
    return [rc.G2_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]


def test_jac_add_edge_cases_g1():
    a = rand_g1(4)
    # pairs: (P, Q), (P, P) -> double, (P, -P) -> infinity, (P, O)
    ps = [a[0], a[1], a[2], a[3]]
    qs = [a[1], a[1], a[2].neg(), rc.point_zero("g1")]
    P = G.affine_to_jac(FQ, pack_points(ps))
    Q_ = G.affine_to_jac(FQ, pack_points(qs))
    fn = jax.jit(lambda p, q: G.jac_normalize(FQ, G.jac_add(FQ, p, q)))
    got = unpack_points(fn(P, Q_), "g1")
    expect = [p.add(q) for p, q in zip(ps, qs)]
    assert got == expect


def test_batch_scalar_mul_g1():
    N = 8
    pts = rand_g1(N)
    scalars = [random.randrange(R_MOD) for _ in range(N)]
    scalars[0] = 1
    scalars[1] = 0
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    fn = jax.jit(lambda p, s: G.jac_normalize(FQ, G.batch_scalar_mul(FQ, p, s)))
    got = unpack_points(fn(pack_points(pts), sc), "g1")
    expect = [p.mul(s) for p, s in zip(pts, scalars)]
    assert got == expect


def test_batch_scalar_mul_g2():
    N = 4
    pts = rand_g2(N)
    scalars = [random.randrange(R_MOD) for _ in range(N)]
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    fn = jax.jit(lambda p, s: G.jac_normalize(FQ2, G.batch_scalar_mul(FQ2, p, s)))
    got = unpack_points(fn(pack_points(pts), sc), "g2")
    expect = [p.mul(s) for p, s in zip(pts, scalars)]
    assert got == expect
