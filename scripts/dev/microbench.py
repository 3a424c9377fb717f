"""Per-op microbenchmark suite — analog of the reference's nightly #[bench]
field/curve microbenches (/root/reference/pairing/benches/bn256/{fr,fq,fq2,
fq12,ec}.rs, pairing_benches.rs:1-9), adapted to a batch machine: every op
is measured as a vectorized kernel over a large batch, reported in ns/op
(per element) plus effective Mops/s.

Usage:
    python scripts/dev/microbench.py [--device cpu|default] [--batch 65536]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="default", choices=["cpu", "default"])
    ap.add_argument("--batch", type=int, default=1 << 16)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    if a.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("PHASE2_TPU_NO_CACHE", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import random

    from phase2_bn254_tpu.field import fp
    from phase2_bn254_tpu.curve import group
    from phase2_bn254_tpu.ops.backend import CTX_Q, CTX_R, FQ2, _field_ops

    rnd = random.Random(1)
    n = a.batch

    def rand_fq(batch):
        return jnp.asarray(
            np.stack([fp.int_to_limbs(rnd.randrange(CTX_Q.p)) for _ in range(min(batch, 256))]
                     * (batch // min(batch, 256)))
        )

    x, y = rand_fq(n), rand_fq(n)
    f1 = _field_ops("g1")

    # curve point batches (jacobian) from cheap pseudo-points: reuse limbs as
    # coordinates is NOT a valid curve point, but the group-law kernel cost is
    # data-independent (masked straight-line code), so throughput is exact.
    P = group.JacobianBatch(x, y, fp.to_mont(CTX_Q, rand_fq(n)))
    Q = group.JacobianBatch(y, x, fp.to_mont(CTX_Q, rand_fq(n)))
    x2 = FQ2.pack(x, y)

    # --- roofline model -------------------------------------------------
    # Peak VPU integer lane throughput (lanes * sublanes * clock). v5e: one
    # TensorCore, 8x128 VPU at ~940 MHz => ~9.6e11 int32 lane-ops/s.
    # Override with PHASE2_TPU_PEAK_LANE_OPS for other parts.
    PEAK = float(os.environ.get("PHASE2_TPU_PEAK_LANE_OPS", 8 * 128 * 0.94e9))
    L = fp.NLIMBS

    # Analytic MINIMUM lane-op counts per element (multiplies only - the
    # irreducible work): CIOS needs 2L^2 16x16 products (L^2 for a*b, L^2
    # for m*p); add/sub need L lane-ops; a windowed 256-bit scalar mul with
    # GLV needs ~2150 mont_muls (see ops/pallas_exp.py docs).
    MIN_OPS = {
        "fq mont_mul": 2 * L * L,
        "fq mont_sqr": 2 * L * L,
        "fr mont_mul": 2 * L * L,
        "fq add": L,
        "fq sub": L,
        "fq2 mul": 3 * 2 * L * L,
        "fq2 sqr": 2 * 2 * L * L,
        "g1 jac_double": 7 * 2 * L * L,
        "g1 jac_add": 16 * 2 * L * L,
        "fq batch_inv": 3 * 2 * L * L,  # amortized Montgomery trick
    }

    def timed(name, fn, *args, per=1):
        g = jax.jit(fn)
        out = g(*args)
        jax.block_until_ready(out)  # compile
        best = float("inf")
        for _ in range(a.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(g(*args))
            best = min(best, time.perf_counter() - t0)
        ns = best / (n * per) * 1e9
        sol = ""
        if name in MIN_OPS:
            frac = MIN_OPS[name] / (ns * 1e-9 * PEAK)
            sol = f"  {100 * frac:5.1f}% of mul-roofline"
        print(f"{name:32s} {ns:10.1f} ns/op   {1e3/ns:8.2f} Mops/s  (batch {n}){sol}")

    print(f"platform: {jax.default_backend()}  devices: {len(jax.devices())}")
    timed("fq mont_mul", lambda u, v: fp.mont_mul(CTX_Q, u, v), x, y)
    timed("fq mont_sqr", lambda u: fp.mont_sqr(CTX_Q, u), x)
    timed("fq add", lambda u, v: fp.add(CTX_Q, u, v), x, y)
    timed("fq sub", lambda u, v: fp.sub(CTX_Q, u, v), x, y)
    timed("fr mont_mul", lambda u, v: fp.mont_mul(CTX_R, u, v), x, y)
    timed("fq batch_inv", lambda u: fp.batch_inv(CTX_Q, u), x)
    timed("fq2 mul", lambda u, v: FQ2.mul(u, FQ2.pack(v, u[..., 0, :])), x2, y)
    timed("fq2 sqr", lambda u: FQ2.sqr(u), x2)
    timed("g1 jac_double", lambda p: group.jac_double(f1, p), P)
    timed("g1 jac_add", lambda p, q: group.jac_add(f1, p, q), P, Q)

    # 255-bit windowed scalar mul, per point
    sc = jnp.asarray(np.stack([fp.int_to_limbs(rnd.randrange(CTX_R.p))
                               for _ in range(min(n, 256))] * (n // min(n, 256))))
    small = 1 << 12 if n >= 1 << 12 else n
    aff = group.AffineBatch(x[:small], y[:small], jnp.zeros((small,), dtype=bool))
    g = jax.jit(lambda p, s: group.batch_scalar_mul(f1, p, s))
    jax.block_until_ready(g(aff, sc[:small]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(aff, sc[:small]))
        best = min(best, time.perf_counter() - t0)
    us = best / small * 1e6
    frac = (2150 * 2 * L * L) / (us * 1e-6 * PEAK)
    print(f"{'g1 windowed scalar-mul':32s} {us*1000:10.1f} ns/op   "
          f"{1e6/us:8.0f} points/s  (batch {small})  {100*frac:5.1f}% of mul-roofline")

    # host pairing pieces (the reference benches miller_loop/final_exp too)
    from phase2_bn254_tpu.refimpl import curve as rc, pairing as rp

    t0 = time.perf_counter()
    m = rp.miller_loop_ate(rc.G1_GEN, rc.G2_GEN)
    t_miller = time.perf_counter() - t0
    t0 = time.perf_counter()
    rp.final_exponentiation(m)
    t_fe = time.perf_counter() - t0
    print(f"{'bn254 miller loop (host)':32s} {t_miller*1e3:10.1f} ms")
    print(f"{'bn254 final exp (host)':32s} {t_fe*1e3:10.1f} ms")


if __name__ == "__main__":
    main()
