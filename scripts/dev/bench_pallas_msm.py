"""Pallas (Mosaic) Pippenger MSM vs the XLA path, G1/G2.

Usage: python scripts/dev/bench_pallas_msm.py [LOG2N ...] [--g2] [--cpu] [--xla]

Comparison point: the reference's 2^22 MSM harness
(/root/reference/bellman/src/multiexp.rs:521-549). Correctness without O(N)
host point-muls: every lane holds the SAME base point P, so
MSM == (sum of scalars mod r) * P, checked with one host mul. (Same-point
batches are the worst case for the wave kernel's lax.cond double branch, so
timings are mildly pessimistic vs distinct-point production traffic.)
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import random
import time

sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [16]
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from phase2_bn254_tpu.curve import codecs, group as G
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import msm, pallas_msm
from phase2_bn254_tpu.ops.backend import _field_ops, _normalize_kernel
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(11)
group = "g2" if "--g2" in sys.argv else "g1"
f = _field_ops(group)
gen = rc.G1_GEN if group == "g1" else rc.G2_GEN

for lg in sizes:
    n = 1 << lg
    P = gen.mul(random.randrange(1, R_MOD))
    batch1 = codecs.points_to_batch([P], group)
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), batch1)
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    want = P.mul(sum(scalars) % R_MOD)

    def run_pallas():
        jac = pallas_msm.msm_pallas_or_none(group, batch, sc)
        assert jac is not None
        return _normalize_kernel(f, jax.tree.map(lambda a: a[None], jac))

    def run_xla():
        c = msm.pick_window(n)
        with fp.force_rolled():
            out = msm.msm_pippenger(f, batch, sc, c)
            return _normalize_kernel(f, jax.tree.map(lambda a: a[None], out))

    for name, fn in [("pallas", run_pallas)] + (
        [("xla", run_xla)] if "--xla" in sys.argv else []
    ):
        t0 = time.time()
        aff = fn()
        np.asarray(aff.x)  # host pull = true barrier through the axon tunnel
        t_cold = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            aff = fn()
            np.asarray(aff.x)
        dt = (time.time() - t0) / reps
        got = codecs.batch_to_points(aff, group)[0]
        ok = got == want
        print(
            f"{group} 2^{lg} {name}: {dt*1e3:9.1f} ms steady ({t_cold:6.1f} s cold)"
            f"  {n/dt/1e6:8.3f} Mpts/s  correct={ok}",
            flush=True,
        )
        assert ok, f"{name} MSM mismatch at 2^{lg}"
