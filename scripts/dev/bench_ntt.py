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
    # exp >= 25: donate the input buffer (the four-step intermediates plus a
    # live input don't fit 16 GB HBM at 2^26); coeffs are recreated per rep
    donate = exp >= 25
    fwd = jax.jit(lambda c: ntt.ntt(exp, c, inverse=False), donate_argnums=0 if donate else ())
    inv = jax.jit(lambda c: ntt.ntt(exp, c, inverse=True), donate_argnums=0 if donate else ())

    def make_coeffs():
        return jnp.asarray(np.tile(vals, (n // block, 1)))

    coeffs = None if donate else make_coeffs()

    def sync(out):
        # a host pull of one element is the only reliable completion barrier
        # through the remote-TPU tunnel (block_until_ready can ack early)
        np.asarray(out[:1])

    def arg():
        return make_coeffs() if donate else coeffs

    t0 = time.time()
    sync(fwd(arg()))
    print(f"compile+first fwd: {time.time()-t0:.2f} s", flush=True)
    t0 = time.time()
    sync(inv(arg()))
    print(f"compile+first inv: {time.time()-t0:.2f} s", flush=True)

    for name, f in (("ntt", fwd), ("intt", inv)):
        best = float("inf")
        for _ in range(reps):
            a = arg()
            jax.block_until_ready(a)  # finish the (donated) input transfer
            np.asarray(a[:1])  # tunnel barrier
            t0 = time.time()
            sync(f(a))
            best = min(best, time.time() - t0)
        print(
            f"{name} 2^{exp}: {best*1e3:.1f} ms steady "
            f"({n/best/1e6:.1f} Mpoint/s) on {jax.default_backend()}",
            flush=True,
        )

    if "--check" in sys.argv:
        # value validation at sizes where a host NTT is hopeless: DFT of the
        # geometric sequence a_j = g^j has the closed form
        # out[k] = (g^N - 1) * (g*w^k - 1)^-1 mod r (since (w^k)^N = 1)
        R = ntt.CTX_R
        g = rnd.randrange(2, R.p)

        @jax.jit
        def geom():
            out = jnp.asarray(fp.int_to_limbs(R.to_mont_int(1)))[None]
            for j in range(exp):
                step = jnp.asarray(fp.int_to_limbs(R.to_mont_int(pow(g, 1 << j, R.p))))
                out = jnp.concatenate([out, fp.mont_mul(R, out, step[None])], axis=0)
            return out

        seq = geom()
        got = fwd(seq)
        d = ntt.Domain(exp)
        num = (pow(g, n, R.p) - 1) % R.p
        ok = True
        for k in [0, 1, n // 2, n - 1] + [rnd.randrange(n) for _ in range(4)]:
            wk = pow(d.omega, k, R.p)
            want = num * pow((g * wk - 1) % R.p, R.p - 2, R.p) % R.p
            got_k = R.from_mont_int(fp.limbs_to_int(np.asarray(got[k])))
            if got_k != want:
                print(f"MISMATCH at k={k}: got {got_k} want {want}")
                ok = False
        print("closed-form check:", "OK" if ok else "FAILED")
        assert ok


if __name__ == "__main__":
    main()
