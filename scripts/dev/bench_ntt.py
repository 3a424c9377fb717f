"""Device Fr NTT wall-clock at 2^exp — the bellman EvaluationDomain harness
analog (/root/reference/bellman/src/domain.rs:528-552 times a 2^27 iFFT on
all CPU cores; no published number).

Usage: python scripts/dev/bench_ntt.py [exp=20] [reps=3]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import random

import numpy as np


def main():
    exp = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from phase2_bn254_tpu.field import fp
    from phase2_bn254_tpu.ops import ntt

    rnd = random.Random(1)
    n = 1 << exp
    # repeat a small random block: input values don't affect NTT cost
    block = 1 << 10
    vals = np.stack(
        [fp.int_to_limbs(ntt.CTX_R.to_mont_int(rnd.randrange(ntt.CTX_R.p))) for _ in range(block)]
    )
    coeffs = jnp.asarray(np.tile(vals, (n // block, 1)))

    fwd = jax.jit(lambda c: ntt.ntt(exp, c, inverse=False))
    inv = jax.jit(lambda c: ntt.ntt(exp, c, inverse=True))

    def sync(out):
        # a host pull of one element is the only reliable completion barrier
        # through the remote-TPU tunnel (block_until_ready can ack early)
        np.asarray(out[:1])

    t0 = time.time()
    sync(fwd(coeffs))
    print(f"compile+first fwd: {time.time()-t0:.2f} s")
    t0 = time.time()
    sync(inv(coeffs))
    print(f"compile+first inv: {time.time()-t0:.2f} s")

    for name, f in (("ntt", fwd), ("intt", inv)):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            sync(f(coeffs))
            best = min(best, time.time() - t0)
        print(
            f"{name} 2^{exp}: {best*1e3:.1f} ms steady "
            f"({n/best/1e6:.1f} Mpoint/s) on {jax.default_backend()}"
        )


if __name__ == "__main__":
    main()
