"""Measure: payload-carrying variadic sort vs argsort + wide-row gather.

The MSM's cost ceiling is the per-window permutation: today ONE batched
argsort over all windows (cheap) + a per-window N-row payload gather
(~22 M rows/s on v5e - the dominant cost). XLA's TPU sort is tiled/merge-
based and moves operand data at memory-like bandwidth, so a variadic sort
that carries the 32 payload columns alongside the key MIGHT beat the
per-row-overhead-bound gather. This script times both primitives in
isolation at 2^LOG2N (default 20).

Usage: python scripts/dev/bench_msm_sortcarry.py [LOG2N] [--cpu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

lg = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

n = 1 << lg
NCOLS = 32  # G1 packed row: x||y = 2 * 16 limbs


def pull(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(name, fn, *args):
    out = fn(*args)
    pull(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        pull(out)
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best


key = jax.random.PRNGKey(0)
keys = jax.random.randint(key, (n,), 0, 1 << 16, dtype=jnp.int32)
payload = jax.random.randint(key, (n, NCOLS), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
iota = jnp.arange(n, dtype=jnp.int32)


@jax.jit
def argsort_only(keys):
    _, order = jax.lax.sort((keys, iota), dimension=0, num_keys=1, is_stable=False)
    return order


@jax.jit
def gather_rows(payload, order):
    return payload[order]


@jax.jit
def sort_carry(keys, payload):
    cols = tuple(payload[:, j] for j in range(NCOLS))
    out = jax.lax.sort((keys,) + cols, dimension=0, num_keys=1, is_stable=False)
    return jnp.stack(out[1:], axis=1)


@jax.jit
def sort_carry_nostack(keys, payload):
    cols = tuple(payload[:, j] for j in range(NCOLS))
    out = jax.lax.sort((keys,) + cols, dimension=0, num_keys=1, is_stable=False)
    return out[1]  # avoid timing the re-stack


print(f"== N=2^{lg}, payload {NCOLS} u32 cols ==", flush=True)
order = argsort_only(keys)
t_arg = timeit("argsort (key+iota)", argsort_only, keys)
t_gat = timeit("payload gather (N rows)", gather_rows, payload, order)
t_sc = timeit("variadic sort carrying payload (+stack)", sort_carry, keys, payload)
t_scn = timeit("variadic sort carrying payload (no stack)", sort_carry_nostack, keys, payload)
print(
    f"current path = argsort + gather = {1e3*(t_arg+t_gat):.1f} ms; "
    f"sort-carry = {1e3*t_sc:.1f} ms",
    flush=True,
)
