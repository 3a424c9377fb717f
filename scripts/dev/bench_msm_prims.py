"""Primitive cost model for the MSM placement redesign (round 4).

The axon tunnel has a ~24 ms per-dispatch latency floor, so every op is
looped `nwin` times INSIDE one jit (with data dependence) and the loop cost
reported per iteration. This mirrors how the ops run inside _msm_main's
window scan.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, nwin, reps=3):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(
        f"{name:38s} {med*1e3:9.1f} ms total, {med*1e3/nwin:7.2f} ms/win"
        f"   (times={[round(t*1e3,1) for t in times]})",
        flush=True,
    )
    return med


def main(log2n=20, nwin=20, width=26):
    n = 1 << log2n
    key = jax.random.PRNGKey(0)
    digits_b = jax.random.randint(key, (nwin, n), 0, 4096, dtype=jnp.int32)
    idx = jax.random.permutation(key, n).astype(jnp.int32)
    payload = jax.random.randint(key, (n, width), 0, 2**31 - 1, dtype=jnp.int32)
    payload_pk = payload.reshape(n // 4, 4 * width)

    print(f"== N = 2^{log2n}, width={width} u32, nwin={nwin} loops in-jit ==", flush=True)

    @jax.jit
    def argsort_batched():
        return jnp.argsort(digits_b, axis=1, stable=False)

    @jax.jit
    def rank_batched():  # argsort of argsort = within-array rank
        return jnp.argsort(jnp.argsort(digits_b, axis=1, stable=False), axis=1, stable=False)

    def loop(body):
        def f():
            def step(carry, k):
                ix, acc = carry
                out = body(ix)
                return (jnp.roll(ix, 1) + 1, acc + out[..., :1].sum()), None

            (ix, acc), _ = jax.lax.scan(step, (idx, jnp.int32(0)), jnp.arange(nwin))
            return acc

        return jax.jit(f)

    timeit("argsort batched (nwin,N)", argsort_batched, nwin)
    timeit("double argsort batched (rank)", rank_batched, nwin)
    timeit("wide 26xu32 gather N rows", loop(lambda ix: payload[ix % n]), nwin)
    timeit("wide 26xu32 scatter N rows", loop(lambda ix: jnp.zeros_like(payload).at[ix % n].set(payload)), nwin)
    timeit("packed 104xu32 gather N/4 rows", loop(lambda ix: payload_pk[ix[: n // 4] % (n // 4)]), nwin)
    timeit("narrow int32 gather N", loop(lambda ix: (idx[ix % n])[:, None]), nwin)
    timeit("narrow int32 scatter N", loop(lambda ix: (jnp.zeros(n, jnp.int32).at[ix % n].set(ix))[:, None]), nwin)
    timeit("narrow scatter-add N -> 4096", loop(lambda ix: (jnp.zeros(4096, jnp.int32).at[ix % 4096].add(1))[:, None]), nwin)
    timeit("cumsum int32 N", loop(lambda ix: jnp.cumsum(ix)[:, None]), nwin)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
