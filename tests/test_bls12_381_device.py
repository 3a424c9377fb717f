"""BLS12-381 device path vs exact host layer (CPU backend via conftest)."""

import random

import pytest

from phase2_bn254_tpu.bls12_381 import curve as host
from phase2_bn254_tpu.bls12_381 import device
from phase2_bn254_tpu.bls12_381.field import Q, R_MOD
from phase2_bn254_tpu.field import fp


def test_fq_mont_mul_device_matches_host():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rnd = random.Random(17)
    xs = [rnd.randrange(Q) for _ in range(16)]
    ys = [rnd.randrange(Q) for _ in range(16)]
    ctx = device.CTX_BLS_FQ
    X = jnp.asarray(np.stack([fp.int_to_limbs(ctx.to_mont_int(v), 24) for v in xs]))
    Y = jnp.asarray(np.stack([fp.int_to_limbs(ctx.to_mont_int(v), 24) for v in ys]))
    Z = jax.jit(lambda a, b: fp.mont_mul(ctx, a, b))(X, Y)
    for i in range(16):
        assert ctx.from_mont_int(fp.limbs_to_int(Z[i])) == (xs[i] * ys[i]) % Q


@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_point_batch_roundtrip(grp):
    rnd = random.Random(5)
    gen = host.G1_GEN if grp == "g1" else host.G2_GEN
    pts = [gen.mul(rnd.randrange(1, R_MOD)) for _ in range(4)] + [host.point_zero(grp)]
    back = device.batch_to_points(device.points_to_batch(pts, grp), grp)
    assert back == pts


@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_device_batch_scalar_mul(grp):
    rnd = random.Random(23)
    gen = host.G1_GEN if grp == "g1" else host.G2_GEN
    pts = [gen.mul(rnd.randrange(1, R_MOD)) for _ in range(4)]
    scalars = [rnd.randrange(R_MOD) for _ in range(3)] + [0]
    got = device.batch_mul(pts, scalars, grp)
    want = [p.mul(s) for p, s in zip(pts, scalars)]
    assert got == want
