"""Pippenger multi-scalar multiplication, vectorized for TPU.

TPU-native reformulation of bellman's bucketed multiexp
(/root/reference/bellman/src/multiexp.rs:53-157): bucket scatter-accumulate
is data-dependent, so instead of per-thread buckets we

1. argsort point indices by their c-bit window digit (XLA sort),
2. accumulate buckets in "waves": wave k adds, for every bucket in parallel
   (2^c lanes wide), that bucket's k-th point - a lax.while_loop that runs
   max-occupancy times with masked unified adds,
3. reduce buckets with a Hillis-Steele inclusive *suffix* scan (log2 rounds)
   - Pippenger's summation-by-parts: sum_b b*B_b = sum_b SuffixSum_b,
4. combine windows MSB-first with c doublings per window.

The MSM value is algorithm-independent, so this is drop-in for merge_pairs /
power_pairs checks and the prover's seven query multiexps.

Cost ~ (256/c) * (N + c*2^c + pad) unified adds vs 3800 field muls/point for
the naive ladder - an order of magnitude for large N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import group as G
from ..field import fp


def _window_digits(scalars_canon: jnp.ndarray, c: int, w: int) -> jnp.ndarray:
    """Extract the w-th c-bit window from uint32[N,16] canonical digits."""
    lo_bit = c * w
    out = jnp.zeros(scalars_canon.shape[:-1], dtype=jnp.uint32)
    # window may straddle limb boundaries; gather the (up to) 3 limbs involved
    for k in range(fp.NLIMBS):
        limb_lo = 16 * k
        limb_hi = limb_lo + 16
        if limb_hi <= lo_bit or limb_lo >= lo_bit + c:
            continue
        shift = lo_bit - limb_lo
        limb = scalars_canon[..., k]
        if shift >= 0:
            part = limb >> shift
            out = out | (part << 0)
        else:
            out = out | (limb << (-shift))
    return out & ((1 << c) - 1)


def _gather_points(batch: G.AffineBatch, idx: jnp.ndarray) -> G.AffineBatch:
    return jax.tree.map(lambda a: a[idx], batch)


@functools.partial(jax.jit, static_argnums=(0, 3))
def msm_pippenger(f, batch: G.AffineBatch, scalars_canon: jnp.ndarray, c: int) -> G.JacobianBatch:
    """MSM over one device. batch: N affine points (infinities allowed and
    skipped - their digit is forced to 0); scalars: uint32[N,16] canonical.
    Returns a single Jacobian point (batch shape ()).

    The per-window pipeline runs under lax.scan (one traced copy)."""
    n = batch.inf.shape[0]
    n_windows = -(-256 // c)
    n_buckets = 1 << c

    bucket_ids = jax.lax.broadcasted_iota(jnp.uint32, (n_buckets, 1), 0)[:, 0]
    # digits for every window, MSB window first: (n_windows, N)
    all_digits = jnp.stack(
        [
            jnp.where(batch.inf, 0, _window_digits(scalars_canon, c, w))
            for w in range(n_windows - 1, -1, -1)
        ]
    )

    def per_window(result, digits):
        for _ in range(c):
            result = G.jac_double(f, result)

        order = jnp.argsort(digits)
        sorted_digits = digits[order]
        sorted_pts = _gather_points(batch, order)

        starts = jnp.searchsorted(sorted_digits, bucket_ids, side="left")
        ends = jnp.searchsorted(sorted_digits, bucket_ids, side="right")
        counts = ends - starts
        max_occ = jnp.max(jnp.where(bucket_ids == 0, 0, counts))

        buckets = G.jac_zero(f, (n_buckets,))

        def wave_body(state):
            k, buckets = state
            pos = jnp.minimum(starts + k, n - 1).astype(jnp.int32)
            valid = (k < counts) & (bucket_ids != 0)
            pts = _gather_points(sorted_pts, pos)
            # invalidate out-of-run lanes by marking them as infinity
            pts = G.AffineBatch(pts.x, pts.y, pts.inf | ~valid)
            jac = G.affine_to_jac(f, pts)
            return k + 1, G.jac_add(f, buckets, jac)

        _, buckets = jax.lax.while_loop(
            lambda s: s[0] < max_occ, wave_body, (jnp.zeros((), starts.dtype), buckets)
        )

        # suffix-sum reduction: sum_b b * B_b = sum_{k>=1} SuffixSum_k
        idxs = jax.lax.broadcasted_iota(jnp.int32, (n_buckets, 1), 0)[:, 0]
        suffix = buckets
        shift = 1
        while shift < n_buckets:
            shifted = jax.tree.map(lambda a: jnp.roll(a, -shift, axis=0), suffix)
            ok = idxs < (n_buckets - shift)
            shifted = G.JacobianBatch(
                shifted.x, shifted.y, f.select(ok, shifted.z, f.zeros((n_buckets,)))
            )
            suffix = G.jac_add(f, suffix, shifted)
            shift *= 2
        # bucket 0's suffix entry would double count SuffixSum_1 (B_0 never
        # accumulates), so mask it out of the tree-sum
        suffix = G.JacobianBatch(
            suffix.x, suffix.y, f.select(idxs != 0, suffix.z, f.zeros((n_buckets,)))
        )
        acc = suffix
        m = n_buckets
        while m > 1:
            m //= 2
            acc = G.jac_add(
                f,
                jax.tree.map(lambda a: a[:m], acc),
                jax.tree.map(lambda a: a[m : 2 * m], acc),
            )
        window_sum = jax.tree.map(lambda a: a[0], acc)
        return G.jac_add(f, result, window_sum), None

    result, _ = jax.lax.scan(per_window, G.jac_zero(f, ()), all_digits)
    return result


def pick_window(n: int) -> int:
    """Window size heuristic (cf. multiexp.rs:341-345 c = ln(n))."""
    if n < 32:
        return 3
    import math

    return max(4, min(13, int(math.log(n))))
