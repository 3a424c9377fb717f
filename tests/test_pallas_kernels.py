"""Pallas kernels in interpreter mode vs the exact/XLA reference paths.

The fused Mosaic kernels (batch-exp ladders, four-step NTT) are the TPU
production path; on CPU they run through the Pallas interpreter, which
executes the same kernel program - so these tests pin the kernel math
itself, not just the XLA fallback.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import ntt as ntt_mod
from phase2_bn254_tpu.ops.pallas_ntt import ntt_pallas
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(31)

CTX_R = ntt_mod.CTX_R


def _rand_fr_mont(n):
    vals = [random.randrange(R_MOD) for _ in range(n)]
    arr = np.stack([fp.int_to_limbs(CTX_R.to_mont_int(v)) for v in vals])
    return jnp.asarray(arr), vals


# interpret-mode kernels are slow on CPU; exp 3 (odd split: R=2, C=4 with the
# inter-twiddle) and exp 6 (even split) cover both kernel shapes, exp 1 the
# degenerate size-1 second pass
@pytest.mark.parametrize("exp,inverse", [(1, False), (3, False), (3, True), (6, False), (6, True)])
def test_pallas_ntt_matches_xla(exp, inverse):
    coeffs, _ = _rand_fr_mont(1 << exp)
    got = np.asarray(ntt_pallas(exp, coeffs, inverse))
    want = np.asarray(ntt_mod._ntt_xla(exp, coeffs, inverse))
    assert (got == want).all()


def test_pallas_ntt_roundtrip():
    exp = 4
    coeffs, _ = _rand_fr_mont(1 << exp)
    back = ntt_pallas(exp, ntt_pallas(exp, coeffs, False), True)
    assert (np.asarray(back) == np.asarray(coeffs)).all()


def test_pallas_batch_exp_matches_host():
    """G1 fused ladder kernel (interpret mode) vs exact host scalar mul."""
    from phase2_bn254_tpu.curve import group as G
    from phase2_bn254_tpu.ops import pallas_exp

    n = 8
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    batch = codecs.points_to_batch(pts, "g1")
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    jac = pallas_exp.batch_exp_transposed(batch.x, batch.y, sc, tile=8)
    aff = G.jac_normalize(codecs.FQ, jac)
    got = codecs.batch_to_points(aff, "g1")
    want = [p.mul(s) for p, s in zip(pts, scalars)]
    assert got == want
