"""Measure the MSM's XLA preprocessing phases on device (round 4).

Phases at 2^20 (ROADMAP r4 attribution: ~1.0 s argsort + ~0.93 s gathers +
~0.15 s Mosaic): this times (a) the current scan-of-argsorts _prep_windows,
(b) a batched variadic-sort variant, (c) the per-window payload gathers in
isolation (in one jit, scanned over windows like _msm_main does).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phase2_bn254_tpu.ops import pallas_msm


def timeit(name, fn, reps=3):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name:44s} {med*1e3:9.1f} ms   (times={[round(t*1e3,1) for t in times]})", flush=True)
    return med


@functools.partial(jax.jit, static_argnums=(2,))
def prep_batched(scalars_canon, inf_mask, c: int):
    """Batched variant: ONE variadic sort for all windows."""
    from phase2_bn254_tpu.ops import msm as msm_mod

    n_windows = -(-pallas_msm.SCALAR_BITS // c)
    n = scalars_canon.shape[0]
    all_digits = jnp.stack(
        [
            jnp.where(inf_mask, 0, msm_mod._window_digits(scalars_canon, c, w)).astype(jnp.int32)
            for w in range(n_windows)
        ]
    )
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (n_windows, n))
    sorted_d, orders = jax.lax.sort((all_digits, iota), dimension=1, num_keys=1)
    b = 1 << c
    bucket_ids = jnp.arange(b, dtype=jnp.int32)
    starts = jax.vmap(lambda sd: jnp.searchsorted(sd, bucket_ids, side="left"))(sorted_d)
    ends = jax.vmap(lambda sd: jnp.searchsorted(sd, bucket_ids, side="right"))(sorted_d)
    counts = (ends - starts).astype(jnp.int32)
    gs = jnp.asarray(pallas_msm._window_groups(c))[:, None]
    occ = -(-jnp.where(bucket_ids[None, :] == 0, 0, counts) // gs)
    return orders.astype(jnp.int32), starts.astype(jnp.int32), counts, jnp.max(occ)


def main(log2n=20):
    n = 1 << log2n
    c = pallas_msm.pick_window(n)
    nwin = -(-pallas_msm.SCALAR_BITS // c)
    key = jax.random.PRNGKey(0)
    scalars = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
    scalars = scalars.at[:, 15].set(scalars[:, 15] & 0x3FFF)  # < 2^254
    inf = jnp.zeros((n,), bool)
    payload = jax.random.randint(key, (n, 26), 0, 2**31 - 1, dtype=jnp.int32)
    pack = 4

    print(f"== N=2^{log2n} c={c} nwin={nwin} pack={pack} ==", flush=True)

    # NOTE: _prep_windows itself became the batched variadic sort in r4; the
    # two rows below differ only in the occupancy-summary tail (ADVICE r4).
    t_cur = timeit("prep current (batched)", lambda: pallas_msm._prep_windows(scalars, inf, c))
    t_bat = timeit("prep batched (one variadic sort)", lambda: prep_batched(scalars, inf, c))

    orders, starts, counts, _ = jax.tree.map(lambda a: a, prep_batched(scalars, inf, c))

    @jax.jit
    def gathers_only(payload, orders):
        rows_pk = n // pack

        def per_window(acc, order):
            ps = payload[order]
            ppk = ps.reshape(rows_pk, pack * 26)
            wave = ppk[::1]  # identity slice; real path gathers ~N/pack rows
            return acc + ps[0, 0] + wave[0, 0], None

        acc, _ = jax.lax.scan(per_window, jnp.int32(0), orders)
        return acc

    @jax.jit
    def gathers_full(payload, orders):
        rows_pk = n // pack
        qc = jnp.arange(rows_pk, dtype=jnp.int32)[::-1]

        def per_window(acc, order):
            ps = payload[order]                     # N-row wide gather
            ppk = ps.reshape(rows_pk, pack * 26)
            wave = ppk[qc]                          # N/pack-row packed gather
            return acc + wave[0, 0], None

        acc, _ = jax.lax.scan(per_window, jnp.int32(0), orders)
        return acc

    @jax.jit
    def scatter_wide(payload, orders):
        def per_window(acc, order):
            out = jnp.zeros_like(payload).at[order].set(payload)
            return acc + out[0, 0], None

        acc, _ = jax.lax.scan(per_window, jnp.int32(0), orders)
        return acc

    timeit("sort-gather only (nwin x N rows)", lambda: gathers_only(payload, orders))
    timeit("sort-gather + wave gather (nwin x)", lambda: gathers_full(payload, orders))
    timeit("wide scatter (nwin x N rows)", lambda: scatter_wide(payload, orders))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
