"""Sharded kernels on the virtual 8-device CPU mesh vs single-device."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.parallel import sharded
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(21)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return sharded.make_mesh()


def test_sharded_pow_mul_matches_host(mesh):
    n = 32
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    batch = codecs.points_to_batch(pts, "g1")
    tau = random.randrange(1, R_MOD)
    out = sharded.sharded_pow_mul(mesh, "g1", batch, tau, start=5, coeff=None)
    got = codecs.batch_to_points(out, "g1")
    expect = [p.mul(pow(tau, 5 + i, R_MOD)) for i, p in enumerate(pts)]
    assert got == expect


def test_sharded_pow_mul_g2_matches_host(mesh):
    # G2 coverage of the sharded path (ADVICE r2): the XLA local kernel on the
    # CPU mesh; the Pallas signed-GLS shard path is covered by the gated
    # sharded-ceremony sweep and on hardware by scripts/dev/bench_pallas_gls_signed.py.
    n = 16
    pts = [rc.G2_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    batch = codecs.points_to_batch(pts, "g2")
    tau = random.randrange(1, R_MOD)
    coeff = random.randrange(1, R_MOD)
    out = sharded.sharded_pow_mul(mesh, "g2", batch, tau, start=3, coeff=coeff)
    got = codecs.batch_to_points(out, "g2")
    expect = [p.mul(coeff * pow(tau, 3 + i, R_MOD) % R_MOD) for i, p in enumerate(pts)]
    assert got == expect


def test_sharded_pow_mul_pallas_path_g1(mesh):
    # The production multi-chip TPU path (_pow_mul_local_pallas) through the
    # Pallas interpreter: pins the shard_map scalar glue (tau_start row
    # shapes, transposed tau-power ladder, GLV split) + kernel math that the
    # XLA-path tests above never touch.
    n = 32
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    batch = codecs.points_to_batch(pts, "g1")
    tau = random.randrange(1, R_MOD)
    out = sharded.sharded_pow_mul(mesh, "g1", batch, tau, start=2, coeff=None, use_pallas=True)
    got = codecs.batch_to_points(out, "g1")
    expect = [p.mul(pow(tau, 2 + i, R_MOD)) for i, p in enumerate(pts)]
    assert got == expect


def test_sharded_msm_matches_host(mesh):
    n = 16
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    batch = codecs.points_to_batch(pts, "g1")
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    out = sharded.sharded_msm(mesh, "g1", batch, sc)
    got = codecs.batch_to_points(out, "g1")[0]
    acc = rc.point_zero("g1")
    for p, s in zip(pts, scalars):
        acc = acc.add(p.mul(s))
    assert got == acc


def test_sharded_msm_pallas_path(mesh, monkeypatch):
    # The production multi-chip TPU MSM path (_msm_local_pallas: per-shard
    # Mosaic wave/suffix/combine pipeline, VERDICT r3 item 2) through the
    # Pallas interpreter on the CPU mesh; value vs host reference.
    monkeypatch.setenv("PHASE2_TPU_SHARDED_MSM", "pallas")
    n = 1 << 11  # 256/device => c=8 from pallas pick_window
    P = rc.G1_GEN.mul(random.randrange(1, R_MOD))
    pts = [P.mul(i + 1) for i in range(n)]
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    batch = codecs.points_to_batch(pts, "g1")
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    out = sharded.sharded_msm(mesh, "g1", batch, sc)
    got = codecs.batch_to_points(out, "g1")[0]
    total = sum((i + 1) * s for i, s in enumerate(scalars)) % R_MOD
    assert got == P.mul(total)
