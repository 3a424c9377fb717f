"""Pippenger MSM vs naive sum (multiexp.rs:479-518 analog)."""

import random

import jax.numpy as jnp
import numpy as np

from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import msm
from phase2_bn254_tpu.ops.backend import _field_ops
from phase2_bn254_tpu.curve import group as G
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(31)


def test_msm_pippenger_matches_naive():
    n = 64
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = scalars[3]  # duplicate digits stress the wave loop
    batch = codecs.points_to_batch(pts, "g1")
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    f = _field_ops("g1")
    import jax

    out = msm.msm_pippenger(f, batch, sc, 5)
    expanded = jax.tree.map(lambda a: a[None], out)
    got = codecs.batch_to_points(G.jac_normalize(f, expanded), "g1")[0]
    acc = rc.point_zero("g1")
    for p, s in zip(pts, scalars):
        acc = acc.add(p.mul(s))
    assert got == acc
