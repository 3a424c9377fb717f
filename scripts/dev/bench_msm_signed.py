"""Signed-digit vs unsigned Pallas MSM config sweep (round 5).

Usage: python scripts/dev/bench_msm_signed.py [LOG2N ...] [--cpu] [--g2]

Sweeps the signed-digit path (c in {14, 15, 16}, pack in {4, 8}) against the
r4 default (unsigned c=13, pack=4) at each size, value-checked via the
shared-base trick (every lane holds the same P, so MSM == sum(scalars) * P).
Decides pick_window_signed / _pack_factor defaults.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import random
import time

sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [20]
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import pallas_msm
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

    configs = [
        ("unsigned c=13 pack=4", dict(c=13, pack=4, signed=False)),
        ("unsigned c=13 pack=8", dict(c=13, pack=8, signed=False)),
    ]
    # c=16 (B=2^15) needs a two-level suffix reduction: the single-kernel
    # suffix scan spills ~186M of VMEM registers at 32768 lanes (r5 sweep)
    for c in (14, 15):
        for pack in (4, 8):
            configs.append((f"signed c={c} pack={pack}", dict(c=c, pack=pack, signed=True)))

    for name, kw in configs:
        def run():
            jac = pallas_msm.msm_pallas_or_none(group, batch, sc, **kw)
            assert jac is not None
            aff = _normalize_kernel(f, jax.tree.map(lambda a: a[None], jac))
            np.asarray(aff.x)  # tunnel barrier
            return aff

        try:
            t0 = time.time()
            aff = run()
            t_first = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                aff = run()
                best = min(best, time.time() - t0)
            got = codecs.batch_to_points(aff, group)[0]
            ok = got == want
            print(
                f"2^{lg} {name}: first {t_first:.1f} s, best {best*1e3:.0f} ms "
                f"({n/best/1e3:.0f}k pts/s) value={'OK' if ok else 'MISMATCH'}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"2^{lg} {name}: FAILED {type(e).__name__}: {e}", flush=True)
