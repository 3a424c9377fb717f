"""BLS12-381 Pallas ladder validation + throughput on the real TPU.

Usage: python scripts/dev/bench_bls_pallas.py [n=4096]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import random
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    random.seed(12)

    from phase2_bn254_tpu.bls12_381 import curve as host
    from phase2_bn254_tpu.bls12_381 import device as dev
    from phase2_bn254_tpu.bls12_381.field import R_MOD

    for grp, check_n in (("g1", 8), ("g2", 4)):
        base = [
            (host.G1_GEN if grp == "g1" else host.G2_GEN).mul(random.randrange(1, R_MOD))
            for _ in range(min(n, 64))
        ]
        pts = base * (n // len(base))
        scalars = [random.randrange(R_MOD) for _ in range(n)]
        t0 = time.time()
        got = dev.pallas_batch_mul(pts, scalars, grp)
        print(f"{grp}: compile+first {time.time() - t0:.1f} s")
        for i in random.sample(range(n), check_n):
            assert got[i] == pts[i].mul(scalars[i]), f"{grp} mismatch at {i}"
        print(f"{grp}: correctness OK ({check_n} spot checks)")

        # kernel-only rate: pack once, time ladder + one-element host pull
        import jax.numpy as jnp

        from phase2_bn254_tpu.ops import pallas_exp

        batch = dev.points_to_batch(pts, grp)
        sc = dev.scalars_to_canon(scalars)
        digits = dev._windows_msb(sc)

        if grp == "g1":
            kern = lambda: pallas_exp.pallas_batch_exp(
                batch.x.T, batch.y.T, digits, 512, dev._BLS_FLD
            )[0]
        else:
            x0, x1 = batch.x[:, 0].T, batch.x[:, 1].T
            y0, y1 = batch.y[:, 0].T, batch.y[:, 1].T
            kern = lambda: pallas_exp.pallas_batch_exp_g2(
                x0, x1, y0, y1, digits, 128, dev._BLS_FLD
            )[0]
        np.asarray(kern()[:1])
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            np.asarray(kern()[:1])
        dt = (time.time() - t0) / reps
        print(f"{grp}: {n / dt:.0f} points/s (kernel)")


if __name__ == "__main__":
    main()
