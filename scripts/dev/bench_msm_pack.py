"""Pack-factor sweep for the Pallas Pippenger MSM wave gathers (VERDICT r4).

Measures g1 MSM at 2^18/2^20 for pack in {1, 2, 4, 8} on the live device,
with value checks against the sum-of-scalars shortcut.
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import pallas_msm
from phase2_bn254_tpu.ops.backend import _field_ops, _normalize_kernel
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD


def run(log2n, pack, reps=2):
    n = 1 << log2n
    random.seed(11)
    P = rc.G1_GEN.mul(random.randrange(1, R_MOD))
    batch1 = codecs.points_to_batch([P], "g1")
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), batch1)
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    f = _field_ops("g1")

    def once():
        jac = pallas_msm.msm_pallas_or_none("g1", batch, sc, pack=pack)
        assert jac is not None
        aff = _normalize_kernel(f, jax.tree.map(lambda a: a[None], jac))
        np.asarray(aff.x)
        return aff

    aff = once()
    times = []
    for _ in range(reps):
        t0 = time.time()
        aff = once()
        times.append(time.time() - t0)
    got = codecs.batch_to_points(aff, "g1")[0]
    assert got == P.mul(sum(scalars) % R_MOD), f"VALUE MISMATCH pack={pack}"
    dt = sorted(times)[len(times) // 2]
    print(f"2^{log2n} pack={pack}: {dt*1e3:.0f} ms = {n/dt:,.0f} pts/s  (times={[round(t,3) for t in times]})", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        # e.g. `bench_msm_pack.py 20 4 8` = 2^20 at pack 4 and 8
        log2n = int(sys.argv[1])
        for pack in [int(a) for a in sys.argv[2:]] or [4]:
            run(log2n, pack)
    else:
        for log2n in (18, 20):
            for pack in (1, 2, 4, 8):
                run(log2n, pack)
