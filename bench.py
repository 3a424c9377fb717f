#!/usr/bin/env python
"""Benchmark: G1 batch exponentiation throughput (the phase-1 contribute hot loop).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline derivation: the reference computes a full 2^26 powers-of-tau
contribution in ~3 hours on a laptop (/root/reference/powersoftau/README.md:11).
That is 3*2^26 G1 + 2^27 G1 + 2^26 G2 ~= 4.03e8 G1-equivalent 256-bit scalar
muls (G2 ~ 3x G1 cost) in 10800 s => ~5.0e4 G1 scalar muls/s. `vs_baseline`
is our measured G1 points/s over that rate.
"""

import json
import sys
import time

BASELINE_G1_MULS_PER_S = 5.0e4


def _device_watchdog(timeout_s: float = 300.0) -> bool:
    """True if the device answers a trivial computation within timeout.

    The remote axon TPU tunnel can wedge (every op then hangs forever);
    without this guard a wedged tunnel would hang the whole bench run."""
    import threading

    ok = []

    def probe():
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.ones((8, 8)) * 2)
        ok.append(True)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if not _device_watchdog():
        print(
            json.dumps(
                {
                    "metric": "bn254_g1_batch_exp_points_per_s",
                    "value": 0,
                    "unit": "points/s/chip",
                    "vs_baseline": 0,
                    "error": "device unreachable (axon tunnel wedged; probe timed out)",
                }
            )
        )
        return

    from phase2_bn254_tpu.field import fp
    from phase2_bn254_tpu.ops.backend import (
        CTX_R,
        _pow_mul_kernel,
        _field_ops,
    )
    from phase2_bn254_tpu.curve import codecs
    from phase2_bn254_tpu.refimpl import curve as rc
    from phase2_bn254_tpu.refimpl.field import R_MOD

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    log2n = n.bit_length() - 1
    assert 1 << log2n == n

    # batch of distinct points (tau powers of the generator at a tiny scale
    # would be circular; use s*G for random-ish s computed on host)
    import random

    random.seed(9)
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(min(n, 64))]
    batch = codecs.points_to_batch(pts * (n // len(pts)), "g1")

    tau = random.randrange(1, R_MOD)
    tau_start = jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(1)))
    tau_pows = jnp.asarray(
        np.stack(
            [fp.int_to_limbs(CTX_R.to_mont_int(pow(tau, 1 << j, R_MOD))) for j in range(log2n)]
        )
    )
    one = jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(1)))

    from phase2_bn254_tpu.ops.backend import _pow_mul_pallas, _use_pallas

    f = _field_ops("g1")
    kern = _pow_mul_pallas if _use_pallas("g1", n) else _pow_mul_kernel
    # compile (np.asarray forces a full device->host sync; block_until_ready
    # alone does not reliably block through the axon tunnel)
    out = kern(f, log2n, batch, tau_start, tau_pows, one)
    np.asarray(out.x)
    # measure
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = kern(f, log2n, batch, tau_start, tau_pows, one)
        np.asarray(out.x)
    dt = (time.time() - t0) / reps
    pts_per_s = n / dt

    print(
        json.dumps(
            {
                "metric": "bn254_g1_batch_exp_points_per_s",
                "value": round(pts_per_s, 1),
                "unit": "points/s/chip",
                "vs_baseline": round(pts_per_s / BASELINE_G1_MULS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
