"""Device Pippenger MSM bench at production occupancy.

Usage: python scripts/dev/bench_msm.py [LOG2N ...] [--cpu]

Comparison point: the reference's 2^22 MSM timing harness
(/root/reference/bellman/src/multiexp.rs:521-549, prints ns/point on all
CPU cores). Correctness at any size without O(N) host point-muls: every
lane holds the SAME base point P, so MSM == (sum of scalars mod r) * P,
checked with one host mul.
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
from phase2_bn254_tpu.ops import msm
from phase2_bn254_tpu.ops.backend import _field_ops
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(11)
f = _field_ops("g1")

for lg in sizes:
    n = 1 << lg
    c = msm.pick_window(n)
    P = rc.G1_GEN.mul(random.randrange(1, R_MOD))
    batch1 = codecs.points_to_batch([P], "g1")
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), batch1)
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))

    t0 = time.time()
    out = msm.msm_pippenger(f, batch, sc, c)
    aff = jax.jit(lambda j: G.jac_normalize(f, jax.tree.map(lambda a: a[None], j)))(out)
    xs = np.asarray(aff.x)  # host pull = true barrier
    t_cold = time.time() - t0

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = msm.msm_pippenger(f, batch, sc, c)
        aff = jax.jit(lambda j: G.jac_normalize(f, jax.tree.map(lambda a: a[None], j)))(out)
        np.asarray(aff.x)
    dt = (time.time() - t0) / reps

    gx = codecs.CTX.from_mont_int(fp.limbs_to_int(np.asarray(aff.x)[0]))
    gy = codecs.CTX.from_mont_int(fp.limbs_to_int(np.asarray(aff.y)[0]))
    want = P.mul(sum(scalars) % R_MOD)
    ok = (gx, gy) == (want.x, want.y)
    print(
        f"2^{lg} msm c={c}: cold {t_cold:.1f}s steady {dt*1e3:.0f}ms "
        f"-> {n/dt:.0f} points/s ({dt/n*1e9:.0f} ns/point)  correct={ok}"
    )
