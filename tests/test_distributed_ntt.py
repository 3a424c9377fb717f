"""Distributed four-step NTT on the 8-device mesh vs single-device NTT."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import ntt as sntt
from phase2_bn254_tpu.parallel import ntt as dntt
from phase2_bn254_tpu.parallel import sharded
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(88)


@pytest.fixture(scope="module")
def mesh():
    return sharded.make_mesh()


@pytest.mark.parametrize("inverse", [False, True])
def test_distributed_ntt_matches_single_device(mesh, inverse):
    exp = 8
    n = 1 << exp
    vals = [random.randrange(R_MOD) for _ in range(n)]
    arr = jnp.asarray(
        np.stack([fp.int_to_limbs(sntt.CTX_R.to_mont_int(v)) for v in vals])
    )
    expect = np.asarray(sntt.ntt(exp, arr, inverse))
    got = np.asarray(dntt.distributed_ntt(mesh, exp, arr, inverse))
    assert (got == expect).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_distributed_ntt_pallas_local(mesh, inverse, monkeypatch):
    # The production multi-chip TPU path: Mosaic lane-DFT local stages inside
    # shard_map (VERDICT r3 item 2), via the Pallas interpreter on the CPU
    # mesh; bit-identical to the XLA-local path / single-device NTT.
    monkeypatch.setenv("PHASE2_TPU_NTT_LOCAL", "pallas")
    exp = 8
    n = 1 << exp
    vals = [random.randrange(R_MOD) for _ in range(n)]
    arr = jnp.asarray(
        np.stack([fp.int_to_limbs(sntt.CTX_R.to_mont_int(v)) for v in vals])
    )
    expect = np.asarray(sntt.ntt(exp, arr, inverse))
    got = np.asarray(dntt.distributed_ntt(mesh, exp, arr, inverse))
    assert (got == expect).all()
