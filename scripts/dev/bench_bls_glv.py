"""BLS12-381 GLV Pallas ladder hardware validation + throughput.

The last Mosaic kernel never run on real hardware (ROADMAP "BLS GLV still
blocked"): the cube-root-endomorphism double ladder for BLS G1, unsigned
(33 x 4-bit windows) and signed (26 x 5-bit). Validates bit-exactness vs
host `Point.mul` on a random batch and reports steady-state throughput.

Usage: python scripts/dev/bench_bls_glv.py [n=4096] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import random

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4096
    random.seed(21)

    from phase2_bn254_tpu.bls12_381 import curve as host
    from phase2_bn254_tpu.bls12_381 import device as dev
    from phase2_bn254_tpu.bls12_381.field import R_MOD

    base = [host.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(64)]
    pts = base * (n // 64)
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    # host oracle on a spot-check prefix (full host mul at n=4096 is minutes)
    check_n = 16
    want = [p.mul(s) for p, s in zip(pts[:check_n], scalars[:check_n])]

    for name, fn in (
        ("glv_signed (26x5)", dev.pallas_batch_mul_glv_signed),
        ("glv_unsigned (33x4)", dev.pallas_batch_mul_glv),
    ):
        t0 = time.time()
        out = fn(pts, scalars)
        t_first = time.time() - t0
        assert out[:check_n] == want, f"{name}: VALUE MISMATCH"
        t0 = time.time()
        out = fn(pts, scalars)
        dt = time.time() - t0
        print(
            f"BLS G1 {name}: n={n} first {t_first:.1f} s, steady {dt:.2f} s "
            f"({n/dt/1e3:.1f}k exp/s) value OK ({check_n} spot checks)",
            flush=True,
        )


if __name__ == "__main__":
    main()
