"""Pallas TPU Pippenger multi-scalar multiplication (G1 + G2).

The TPU-native reformulation of bellman's bucketed multiexp
(/root/reference/bellman/src/multiexp.rs:53-157), with the bucket adds running
through the fused Mosaic group law (transposed limb planes, lazy [0,2p)
reduction) instead of the generic XLA path that `ops/msm.py` uses:

1.  XLA preprocessing, per c-bit window: extract digits, argsort points by
    digit, `searchsorted` the bucket boundaries, then ONE gather builds a
    dense (W, B) "wave grid": wave k holds, for every bucket b in parallel,
    that bucket's k-th point (lanes with k >= occupancy are masked invalid).
2.  Wave-accumulate kernel: grid (bucket tiles, W); the bucket accumulators
    live in VMEM across the wave dimension and every step performs one masked
    MIXED add (madd-2007-bl, 6M+4S vs the 11M+5S unified add) of the wave
    slice into the accumulators, 2^c lanes wide.
3.  Suffix kernel: Pippenger's summation-by-parts sum_b b*S_b = sum_{b>=1}
    U_b with U the inclusive suffix sums - log2(B) shifted jac_adds (lanes
    shifted out are zero-filled, and Z=0 is the group identity, so no masks),
    then a log2(B) tree fold to lane 0.
4.  Window combination (c doublings + add per window, MSB first) runs on the
    1-lane transposed XLA path inside the same jit - a few hundred field muls
    total.

W (the wave count = max bucket occupancy) is data-dependent: the dispatcher
computes it on device, pulls one scalar to the host, and compiles the kernel
for W rounded up to a multiple of 32 (compile-cache friendly). Adversarially
skewed digit distributions (max occupancy >> N/B) fall back to the XLA
`msm_pippenger` path - see `msm_pallas_or_none`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curve import group as G
from ..field import fp
from .pallas_exp import (
    _ONE_MONT,
    _P_LIMBS,
    _PPRIME,
    T2Ops,
    TOps,
    U32,
    jac_add,
    jac_double,
)

NLIMBS = fp.NLIMBS


# ---------------------------------------------------------------------------
# group-law piece: mixed add (madd-2007-bl, ec.rs:456-536 semantics)
# ---------------------------------------------------------------------------


def jac_madd(ops, P, qx, qy, q_valid, one):
    """P (Jacobian) += (qx, qy) affine where q_valid; masked, exact.

    Exceptional cases mirror curve/group.py's unified add: P at infinity
    takes Q directly, equal points route through the (lax.cond-guarded)
    doubling, opposite points cancel to infinity, invalid lanes keep P.
    `one` is the Montgomery 1 block (tuple for Fq2)."""
    px, py, pz = P
    p_inf = ops.is_zero(pz)
    z1z1 = ops.mul(pz, pz)
    u2 = ops.mul(qx, z1z1)
    s2 = ops.mul(ops.mul(qy, pz), z1z1)
    eq_x = ops.eq(px, u2)
    eq_y = ops.eq(py, s2)
    h = ops.sub(u2, px)
    hh = ops.mul(h, h)
    i = ops.dbl(ops.dbl(hh))
    j = ops.mul(h, i)
    r = ops.dbl(ops.sub(s2, py))
    v = ops.mul(px, i)
    x3 = ops.sub(ops.sub(ops.mul(r, r), j), ops.dbl(v))
    yj = ops.mul(py, j)
    y3 = ops.sub(ops.mul(ops.sub(v, x3), r), ops.dbl(yj))
    zh = ops.add(pz, h)
    z3 = ops.sub(ops.sub(ops.mul(zh, zh), z1z1), hh)

    is_dbl = eq_x & eq_y & ~p_inf & q_valid
    is_cancel = eq_x & ~eq_y & ~p_inf & q_valid
    # same-point adds are measure-zero in bucket traffic: branch around the
    # embedded doubling instead of paying it every wave
    dx, dy, dz = jax.lax.cond(
        jnp.max(is_dbl.astype(jnp.int32)) > 0,
        lambda: jac_double(ops, P),
        lambda: (ops.zero_like(px), ops.zero_like(py), ops.zero_like(pz)),
    )
    x = ops.sel(is_dbl, dx, x3)
    y = ops.sel(is_dbl, dy, y3)
    z = ops.sel(is_dbl, dz, z3)
    z = ops.sel(is_cancel, ops.zero_like(z), z)
    # P at infinity: take Q (z = 1)
    x = ops.sel(p_inf, qx, x)
    y = ops.sel(p_inf, qy, y)
    z = ops.sel(p_inf, one, z)
    # invalid lane: keep P
    x = ops.sel(~q_valid, px, x)
    y = ops.sel(~q_valid, py, y)
    z = ops.sel(~q_valid, pz, z)
    return x, y, z


# ---------------------------------------------------------------------------
# kernel 1: wave accumulation into bucket accumulators
# ---------------------------------------------------------------------------


def _wave_kernel(
    pprime, comps, pack, kt, signed, p_ref, one_ref, valid_ref, wave_ref, *out_refs
):
    """Grid (bucket tiles, W); out refs hold the bucket accumulators and are
    revisited across the wave dimension (index map drops it). wave_ref packs
    `pack` consecutive sorted points, each x||y (component-major) on the
    sublane axis: ONE row gather feeds `pack` madds (TPU gathers are
    per-row-overhead-bound at ~21-25 M rows/s, so packing divides the
    dominant gather cost by `pack` - VERDICT r3 item 3).

    kt ("kernel transpose"): wave_ref/valid_ref arrive in the gather's
    natural (W, B, row) layout and are transposed to (row, B) in VMEM,
    saving the per-window XLA transpose's HBM round-trip (~2x the payload
    traffic per window). Requires the packed row width to be lane-aligned
    (multiple of 128 columns).

    signed: validity entries are tri-state (0 = invalid, 1 = add, 2 =
    subtract); subtracted lanes negate qy (one borrow chain) before the
    madd - the signed-digit Pippenger halves the bucket count per window
    so 254-bit scalars fit 16 one-limb windows instead of 20."""
    k = pl.program_id(1)
    base = TOps(p_ref[:], pprime, lazy=True)
    one_b = one_ref[:]
    zero_b = jnp.zeros_like(one_b)
    nl = p_ref.shape[0]
    ops = base if comps == 1 else T2Ops(base)
    one = one_b if comps == 1 else (one_b, zero_b)

    @pl.when(k == 0)
    def _init():
        for c_ in range(comps):
            out_refs[0 * comps + c_][:] = zero_b  # x
            out_refs[1 * comps + c_][:] = one_b if c_ == 0 else zero_b  # y
            out_refs[2 * comps + c_][:] = zero_b  # z

    if comps == 1:
        acc = (out_refs[0][:], out_refs[1][:], out_refs[2][:])
    else:
        acc = (
            (out_refs[0][:], out_refs[1][:]),
            (out_refs[2][:], out_refs[3][:]),
            (out_refs[4][:], out_refs[5][:]),
        )

    if kt:
        wave_t = jnp.transpose(wave_ref[0])  # (btile, row) -> (row, btile)
        valid_t = jnp.transpose(valid_ref[0])  # (btile, pack) -> (pack, btile)
    else:
        wave_t, valid_t = wave_ref[0], valid_ref[0]
    for j in range(pack):
        off = j * 2 * comps * nl
        if comps == 1:
            qx = wave_t[off : off + nl]
            qy = wave_t[off + nl : off + 2 * nl]
        else:
            qx = (wave_t[off : off + nl], wave_t[off + nl : off + 2 * nl])
            qy = (
                wave_t[off + 2 * nl : off + 3 * nl],
                wave_t[off + 3 * nl : off + 4 * nl],
            )
        valid = valid_t[j : j + 1] != 0  # (1, Btile) mask
        if signed:
            neg = valid_t[j : j + 1] == 2
            if comps == 1:
                qy = ops.sel(neg, ops.sub(zero_b, qy), qy)
            else:
                qy = (
                    ops.f.sel(neg, ops.f.sub(zero_b, qy[0]), qy[0]),
                    ops.f.sel(neg, ops.f.sub(zero_b, qy[1]), qy[1]),
                )
        acc = jac_madd(ops, acc, qx, qy, valid, one)

    x, y, z = acc
    if comps == 1:
        out_refs[0][:], out_refs[1][:], out_refs[2][:] = x, y, z
    else:
        out_refs[0][:], out_refs[1][:] = x
        out_refs[2][:], out_refs[3][:] = y
        out_refs[4][:], out_refs[5][:] = z


def _wave_accumulate(
    comps, pack, wave_packed, valid, btile: int, kt: bool = False, signed: bool = False
):
    """wave_packed: uint32[W, pack*2*comps*NL, B] (pack consecutive sorted
    points, each x||y component-major, stacked on sublanes); valid:
    int32[W, pack, B] (tri-state 0/1/2 when signed). Returns 3*comps bucket
    planes uint32[NL, B].

    kt: arrays arrive untransposed - wave_packed uint32[W, B, pack*2*comps*NL]
    and valid int32[W, B, pack], exactly as the XLA row gather produces them;
    the kernel transposes each VMEM tile instead (no HBM transpose pass)."""
    if kt:
        w_cap, b, packed_nl = wave_packed.shape
    else:
        w_cap, packed_nl, b = wave_packed.shape
    nl = packed_nl // (pack * 2 * comps)
    btile = min(btile, b)
    assert b % btile == 0
    grid = (b // btile, w_cap)
    spec_const = pl.BlockSpec((nl, btile), lambda j, k: (0, 0), memory_space=pltpu.VMEM)
    if kt:
        spec_wave = pl.BlockSpec(
            (1, btile, packed_nl), lambda j, k: (k, j, 0), memory_space=pltpu.VMEM
        )
        spec_valid = pl.BlockSpec(
            (1, btile, pack), lambda j, k: (k, j, 0), memory_space=pltpu.VMEM
        )
    else:
        spec_wave = pl.BlockSpec(
            (1, packed_nl, btile), lambda j, k: (k, 0, j), memory_space=pltpu.VMEM
        )
        spec_valid = pl.BlockSpec(
            (1, pack, btile), lambda j, k: (k, 0, j), memory_space=pltpu.VMEM
        )
    spec_out = pl.BlockSpec((nl, btile), lambda j, k: (0, j), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nl, b), U32)] * (3 * comps)
    p_col = jnp.broadcast_to(jnp.asarray(_P_LIMBS, U32)[:, None], (nl, btile))
    one_col = jnp.broadcast_to(jnp.asarray(_ONE_MONT, U32)[:, None], (nl, btile))
    return pl.pallas_call(
        functools.partial(_wave_kernel, _PPRIME, comps, pack, kt, signed),
        grid=grid,
        in_specs=[spec_const, spec_const, spec_valid, spec_wave],
        out_specs=[spec_out] * (3 * comps),
        out_shape=out_shape,
        # signed-mode B=2^14+ bucket planes with pack=8 rows exceed the 16M
        # default scoped window (r5 sweep: OOM at 16.36M); v5e VMEM is 128M
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, valid, wave_packed)


# ---------------------------------------------------------------------------
# kernel 2: suffix-scan reduction  sum_b b*S_b  ->  lane 0
# ---------------------------------------------------------------------------


def _suffix_kernel(pprime, comps, p_ref, one_ref, wmask_ref, *refs):
    """Suffix scan + fold as ONE fori_loop with a dynamic lane shift per step
    (a single jac_add instance: 2*log2(B) unrolled adds made XLA:CPU's
    interpret-mode compile quadratic-slow)."""
    in_refs, out_refs = refs[: 3 * comps], refs[3 * comps :]
    base = TOps(p_ref[:], pprime, lazy=True)
    nl, b = in_refs[0].shape
    log2b = b.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def shiftp(P, s):
        # lanes shifted in from the right get Z=0 (the group identity), so
        # only the z planes need masking - x/y wrap garbage is inert
        def sh(plane):
            # left-rotate by s == right-rotate by b - s (keep shift >= 0)
            return pltpu.roll(plane, b - s, axis=1)

        def shz(plane):
            return jnp.where(lane < b - s, sh(plane), jnp.zeros_like(plane))

        if comps == 1:
            return (sh(P[0]), sh(P[1]), shz(P[2]))
        return (
            (sh(P[0][0]), sh(P[0][1])),
            (sh(P[1][0]), sh(P[1][1])),
            (shz(P[2][0]), shz(P[2][1])),
        )

    def zmask(P, mask):
        if comps == 1:
            return (P[0], P[1], jnp.where(mask, P[2], jnp.zeros_like(P[2])))
        z0, z1 = P[2]
        return (
            P[0],
            P[1],
            (jnp.where(mask, z0, jnp.zeros_like(z0)), jnp.where(mask, z1, jnp.zeros_like(z1))),
        )

    if comps == 1:
        ops = base
        P = (in_refs[0][:], in_refs[1][:], in_refs[2][:])
    else:
        ops = T2Ops(base)
        P = (
            (in_refs[0][:], in_refs[1][:]),
            (in_refs[2][:], in_refs[3][:]),
            (in_refs[4][:], in_refs[5][:]),
        )

    # phase 1 (steps 0..log2b-1, s = 1,2,..,b/2): inclusive suffix sums
    # U_lane = sum_{l >= lane} S_l. With lane weight w = lane // G (the
    # digit), summation by parts gives sum_lane w*S_lane = sum of U over the
    # weight-step lanes (wmask: lane % G == 0 and lane != 0) - applied as a
    # z-mask between the phases.
    # phase 2 (steps log2b..2*log2b-1, s = b/2,..,2,1): fold into lane 0.
    def step(t, P):
        j = jnp.where(t < log2b, t, 2 * log2b - 1 - t)
        s = (1 << j).astype(jnp.int32)
        at_boundary = t == log2b
        P = zmask(P, ~at_boundary | (wmask_ref[:] != 0))
        return jac_add(ops, P, shiftp(P, s))

    P = jax.lax.fori_loop(0, 2 * log2b, step, P)
    if comps == 1:
        coords = [base.canon_out(c_) for c_ in P]
    else:
        coords = []
        for coord in P:
            c0, c1 = ops.canon_out(coord)
            coords.extend([c0, c1])
    for idx, plane in enumerate(coords):
        out_refs[idx][:] = plane[:, :128]


def _suffix_reduce(comps, wmask, bucket_planes):
    """3*comps bucket planes uint32[NL, B] -> 3*comps planes uint32[NL, 128]
    with the window sum in lane 0 (canonical limbs). wmask: int32[1, B]
    marking the weight-step lanes of the summation by parts."""
    nl, b = bucket_planes[0].shape
    assert b >= 128
    spec_in = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nl, 128), U32)] * (3 * comps)
    p_col = jnp.asarray(_P_LIMBS, U32)[:, None] * jnp.ones((1, b), U32)
    one_col = jnp.asarray(_ONE_MONT, U32)[:, None] * jnp.ones((1, b), U32)
    return pl.pallas_call(
        functools.partial(_suffix_kernel, _PPRIME, comps),
        in_specs=[spec_in] * (3 + 3 * comps),
        out_specs=[spec_in] * (3 * comps),
        out_shape=out_shape,
        # B=8192 planes put the jac_add live set over the default 16M scoped
        # window; v5e VMEM is 128M
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(p_col, one_col, wmask, *bucket_planes)


# ---------------------------------------------------------------------------
# XLA preprocessing + dispatch
# ---------------------------------------------------------------------------


SCALAR_BITS = 254  # canonical scalars < r < 2^254


def _window_groups(c: int) -> np.ndarray:
    """Per-window lane-group factors G_w = B / 2^(digit bits of window w).

    Body windows use all c bits (G=1). The top window only spans the
    remaining SCALAR_BITS - c*w bits, so its few possible digits would pile
    N/2^topbits points into each bucket; instead each digit gets G lanes
    and ranks are dealt round-robin across them (combined by the suffix
    kernel's weight mask), keeping occupancy ~N/B for EVERY window."""
    n_windows = -(-SCALAR_BITS // c)
    gs = []
    for w in range(n_windows):
        nbits = min(c, SCALAR_BITS - c * w)
        gs.append(1 << (c - nbits))
    return np.array(gs, dtype=np.int32)


def _window_groups_signed(c: int) -> np.ndarray:
    """Signed-mode lane-group factors over B = 2^(c-1) buckets of weight
    (digit = lane//G + 1). Body windows: G=1 (every lane its own bucket).
    The top window's digits are non-negative and <= 2^topbits (carry
    included), so its buckets get G = 2^(c-1-topbits) lanes each - without
    this the c=14 top window (2 digit bits) piles N/4 points per bucket and
    every size falls off the fast path (r5 v5e sweep)."""
    n_windows = -(-SCALAR_BITS // c)
    gs = [1] * (n_windows - 1)
    topbits = SCALAR_BITS - c * (n_windows - 1)
    gs.append(1 << max(c - 1 - topbits, 0))
    return np.array(gs, dtype=np.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def _prep_windows(scalars_canon, inf_mask, c: int):
    """Digits + per-window sort + bucket boundaries. Returns (orders, starts,
    counts, dstars, occs): (nwin, N), (nwin, B), (nwin, B), (nwin,), int32[2].

    All windows sort in ONE batched variadic sort (unstable: bucket
    membership is all that matters, bucket sums are value-independent of add
    order, and the affine normalize at the end makes output bytes unique).
    A lax.scan of per-window argsorts measured ~35x slower than the batched
    sort on v5e (~50 ms vs 1.4 ms per window at 2^20) - the r3 "argsort is
    half the MSM" cost was really the scan structure, not the sort.

    dstars[w] = the heaviest nonzero bucket of window w; occs = [max bucket
    occupancy including the heaviest bucket, ditto excluding it (both
    already divided by the per-window group factors), raw point count of the
    heaviest bucket across all windows]. The dispatcher uses occ[1] to keep
    the dense wave grid small under single-hot-bucket skew (repeated scalar
    values - the multiexp.rs:95-102 scalar==one special case generalized to
    any constant): the hot bucket is summed separately by a dense pass
    (bounded by occ[2] - ADVICE r4) and folded in with weight dstar at
    window-combine time."""
    from . import msm as msm_mod

    n_windows = -(-SCALAR_BITS // c)
    n = scalars_canon.shape[0]
    all_digits = jnp.stack(
        [
            jnp.where(inf_mask, 0, msm_mod._window_digits(scalars_canon, c, w)).astype(
                jnp.int32
            )
            for w in range(n_windows)
        ]
    )
    b = 1 << c
    bucket_ids = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (n_windows, n))
    sorted_d, orders = jax.lax.sort(
        (all_digits, iota), dimension=1, num_keys=1, is_stable=False
    )
    starts = jax.vmap(lambda sd: jnp.searchsorted(sd, bucket_ids, side="left"))(sorted_d)
    ends = jax.vmap(lambda sd: jnp.searchsorted(sd, bucket_ids, side="right"))(sorted_d)
    counts = (ends - starts).astype(jnp.int32)
    gs = jnp.asarray(_window_groups(c))[:, None]
    counts_nz = jnp.where(bucket_ids[None, :] == 0, 0, counts)
    dstars = jnp.argmax(counts_nz, axis=1).astype(jnp.int32)
    occ_all = jnp.max(-(-counts_nz // gs))
    counts2 = jnp.where(bucket_ids[None, :] == dstars[:, None], 0, counts_nz)
    occ2 = jnp.max(-(-counts2 // gs))
    occ_hot = jnp.max(counts_nz)  # raw count of the heaviest bucket anywhere
    occs = jnp.stack([occ_all, occ2, occ_hot]).astype(jnp.int32)
    return orders, starts.astype(jnp.int32), counts, dstars, occs


@functools.partial(jax.jit, static_argnums=(2,))
def _prep_windows_signed(scalars_canon, inf_mask, c: int):
    """Signed-digit window prep: digits e_w in [-2^(c-1), 2^(c-1)-1] via the
    standard carry recode (e = d + carry; e >= 2^(c-1) -> e -= 2^c, carry 1),
    bucketed on |e| - 1 so B = 2^(c-1) lanes ALL carry weight (lane + 1) and
    sign folds into the wave madd. At c = 16 each window is exactly one
    16-bit scalar limb and 254-bit scalars need 16 windows instead of the
    unsigned path's 20 at c = 13 - the permutation gathers (the MSM's cost
    ceiling) shrink proportionally.

    Sort key = 2*(|e|-1) + (e > 0), so each bucket's run is negatives-first
    and the split position recovers per-point signs with table lookups only
    (no extra N-row gather). Zero digits and infinity points key to the 2B
    sentinel (sorted past every bucket).

    Returns (orders, starts, splits, counts, dstars, occs): splits[w, b] =
    absolute sorted position where bucket b's positives begin; occs =
    [max occupancy, ditto excluding each window's heaviest bucket, raw max
    hot-bucket count] (weight groups don't exist here - every lane is its
    own bucket)."""
    from . import msm as msm_mod

    n_windows = -(-SCALAR_BITS // c)
    n = scalars_canon.shape[0]
    half = 1 << (c - 1)
    full = 1 << c
    digits = [msm_mod._window_digits(scalars_canon, c, w).astype(jnp.int32) for w in range(n_windows)]
    carry = jnp.zeros(scalars_canon.shape[:-1], jnp.int32)
    signed_digits = []
    for w in range(n_windows):
        e = digits[w] + carry
        wrap = e >= half
        e = jnp.where(wrap, e - full, e)
        carry = wrap.astype(jnp.int32)
        signed_digits.append(e)
    # scalars < 2^254 guarantee the top window absorbs the carry (e < 2^(c-1))
    all_e = jnp.stack(signed_digits)
    all_e = jnp.where(inf_mask[None, :], 0, all_e)
    b = half
    keys = jnp.where(
        all_e == 0,
        2 * b,
        2 * (jnp.abs(all_e) - 1) + (all_e > 0).astype(jnp.int32),
    )
    bucket_ids = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (n_windows, n))
    sorted_k, orders = jax.lax.sort((keys, iota), dimension=1, num_keys=1, is_stable=False)
    starts = jax.vmap(lambda sk: jnp.searchsorted(sk, 2 * bucket_ids, side="left"))(sorted_k)
    splits = jax.vmap(lambda sk: jnp.searchsorted(sk, 2 * bucket_ids + 1, side="left"))(sorted_k)
    ends = jax.vmap(lambda sk: jnp.searchsorted(sk, 2 * bucket_ids + 1, side="right"))(sorted_k)
    counts = (ends - starts).astype(jnp.int32)
    gs = jnp.asarray(_window_groups_signed(c))[:, None]
    dstars = jnp.argmax(counts, axis=1).astype(jnp.int32)
    occ_all = jnp.max(-(-counts // gs))
    counts2 = jnp.where(bucket_ids[None, :] == dstars[:, None], 0, counts)
    occ2 = jnp.max(-(-counts2 // gs))
    occ_hot = jnp.max(counts)  # raw count (the dense pass sweeps sorted rows)
    occs = jnp.stack([occ_all, occ2, occ_hot]).astype(jnp.int32)
    return orders, starts.astype(jnp.int32), splits.astype(jnp.int32), counts, dstars, occs


def _packed_rows(batch: G.AffineBatch, comps: int):
    """uint32[N, 2*comps*NL]: x||y limb rows (component-major within each
    coord) so the per-window permutation is ONE row gather."""
    if comps == 1:
        return jnp.concatenate([batch.x, batch.y], axis=1)
    return jnp.concatenate(
        [batch.x[:, 0], batch.x[:, 1], batch.y[:, 0], batch.y[:, 1]], axis=1
    )


# ---------------------------------------------------------------------------
# kernel 3: window combination  result = sum_w 2^(c*w) * T_w
# ---------------------------------------------------------------------------


def _combine_kernel(pprime, comps, c, exclude, p_ref, one_ref, sums_ref, *rest):
    """sums_ref: (nwin, 3*comps*NL, 128) canonical window sums, MSB first.
    c doublings + one add per window, fori-rolled, 128 lanes wide (lane 0
    carries the value; doing this on the 1-lane XLA path cost ~90 ms/window
    in tiny op dispatches).

    With `exclude` (single-hot-bucket skew split): rest leads with
    sums2_ref (nwin, 3*comps*NL, 128) = each window's hot-bucket plain sum
    and bits_ref (nwin, c, 128) = that bucket's digit bits (MSB order
    matching sums_ref); every window also folds in digit * sums2 via a c-step
    double-and-add - the deferred weight of the separately-summed bucket."""
    if exclude:
        sums2_ref, bits_ref, out_refs = rest[0], rest[1], rest[2:]
    else:
        sums2_ref = bits_ref = None
        out_refs = rest
    base = TOps(p_ref[:], pprime, lazy=True)
    nl = p_ref.shape[0]
    nwin = sums_ref.shape[0]
    ops = base if comps == 1 else T2Ops(base)
    one_b = one_ref[:]
    zero_b = jnp.zeros_like(one_b)
    if comps == 1:
        P0 = (zero_b, one_b, zero_b)
    else:
        P0 = ((zero_b, zero_b), (one_b, zero_b), (zero_b, zero_b))

    def unpack(blk):
        if comps == 1:
            return (blk[0:nl], blk[nl : 2 * nl], blk[2 * nl : 3 * nl])
        return (
            (blk[0:nl], blk[nl : 2 * nl]),
            (blk[2 * nl : 3 * nl], blk[3 * nl : 4 * nl]),
            (blk[4 * nl : 5 * nl], blk[5 * nl : 6 * nl]),
        )

    def psel(m, A, B):
        if comps == 1:
            return tuple(ops.sel(m, a, b) for a, b in zip(A, B))
        return tuple(
            (ops.sel(m, a[0], b[0]), ops.sel(m, a[1], b[1])) for a, b in zip(A, B)
        )

    def body(w, P):
        for _ in range(c):
            P = jac_double(ops, P)
        P = jac_add(ops, P, unpack(sums_ref[w]))
        if exclude:
            S2 = unpack(sums2_ref[w])
            bits = bits_ref[w]  # (c, 128) int32, row i = bit i of the digit
            if comps == 1:
                acc0 = (zero_b, one_b, zero_b)
            else:
                acc0 = ((zero_b, zero_b), (one_b, zero_b), (zero_b, zero_b))
            acc = acc0
            for i in range(c - 1, -1, -1):  # MSB first
                acc = jac_double(ops, acc)
                m = bits[i : i + 1, :] != 0
                acc = psel(m, jac_add(ops, acc, S2), acc)
            P = jac_add(ops, P, acc)
        return P

    P = jax.lax.fori_loop(0, nwin, body, P0)
    if comps == 1:
        coords = [base.canon_out(c_) for c_ in P]
    else:
        coords = []
        for coord in P:
            c0, c1 = ops.canon_out(coord)
            coords.extend([c0, c1])
    for idx, plane in enumerate(coords):
        out_refs[idx][:] = plane


def _combine_windows(comps, c, sums_msb, sums2_msb=None, bits_msb=None):
    """(nwin, 3*comps*NL, 128) -> 3*comps planes (NL, 128), lane 0 = MSM.

    sums2_msb/bits_msb (hot-bucket plain sums + digit bit planes) trigger the
    weighted fold in the kernel - see _combine_kernel."""
    nwin, _, width = sums_msb.shape
    nl = sums_msb.shape[1] // (3 * comps)
    exclude = sums2_msb is not None
    spec_in = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nl, width), U32)] * (3 * comps)
    p_col = jnp.asarray(_P_LIMBS, U32)[:, None] * jnp.ones((1, width), U32)
    one_col = jnp.asarray(_ONE_MONT, U32)[:, None] * jnp.ones((1, width), U32)
    args = (p_col, one_col, sums_msb) + ((sums2_msb, bits_msb) if exclude else ())
    return pl.pallas_call(
        functools.partial(_combine_kernel, _PPRIME, comps, c, exclude),
        in_specs=[spec_in] * len(args),
        out_specs=[spec_in] * (3 * comps),
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(*args)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _msm_main(
    comps,
    c: int,
    w_cap: int,
    btile: int,
    pack: int,
    exclude: bool,
    kt: bool,
    w3: int,
    signed: bool,
    packed,
    orders,
    starts,
    splits,
    counts,
    dstars,
):
    """The full MSM given preprocessing: scan over windows (gather-sort the
    payload, wave-accumulate buckets, suffix-reduce), then one combine
    kernel over the per-window sums.

    `pack` consecutive sorted points travel in each wave-gather row: the
    permutation gathers are the MSM's cost ceiling (per-ROW-overhead-bound),
    so rows shrink by pack while the kernel does pack madds per row. Lane
    assignment is by CONTIGUOUS sorted sub-range: lane (digit d, group gr)
    covers sorted positions [s_d + gr*ceil(cnt_d/G), ...), so packed rows of
    adjacent sorted points serve every window including the grouped top one
    (validity masks absorb the <=pack-1 row-boundary straddle per lane).

    `exclude` (static): single-hot-bucket skew mode. Each window's heaviest
    bucket dstars[w] is dropped from the wave grid (w_cap is then sized by
    the SECOND-heaviest bucket) and summed by a dense pass over the already-
    sorted payload (its points are one contiguous sorted run - no extra
    gather); the combine kernel folds in digit * sum. This keeps repeated
    scalar values (witness bits, scalar==one crowds - multiexp.rs:95-102) on
    the fast path instead of the rolled XLA fallback. `w3` (static) bounds
    the dense pass to the (w3, B) blocks that can overlap the hot run -
    sized by the dispatcher from the max hot-bucket count (ADVICE r4) - via
    a dynamic slice of the block-padded sorted payload.

    `signed` (static): signed-digit mode - B = 2^(c-1) buckets of weight
    (lane + 1), tri-state validity carrying per-point signs (recovered from
    the negatives-first split positions, no extra gather), all-lane suffix
    weight mask, and hot-bucket weight dstar + 1 (see _prep_windows_signed)."""
    n = packed.shape[0]
    b = 1 << (c - 1) if signed else 1 << c
    w2 = w_cap  # waves of `pack` points each (sized by the dispatcher)
    rows_pk = n // pack

    wave_ids = jax.lax.broadcasted_iota(jnp.int32, (w2, b), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def per_window(_, xs):
        order, starts_w, splits_w, counts_w, dstar, g = xs
        counts_eff = (
            jnp.where(lane_row[0, : counts_w.shape[0]] == dstar, 0, counts_w)
            if exclude
            else counts_w
        )
        # digit/group are constant down the wave axis: keep their table
        # lookups (1, B). The payload permutation runs as TWO wide-row
        # gathers (sort, then packed wave slots) - wide rows amortize the
        # TPU per-row gather overhead; chasing order[pos] through the narrow
        # (N,) index array costs ~4x the wide gathers combined.
        digit_row = lane_row // g  # (1, B)
        group_row = lane_row % g
        s_d = starts_w[digit_row]
        cnt = counts_eff[digit_row]
        sub = -(-cnt // g)  # ceil: contiguous sub-range length per lane
        lo = s_d + group_row * sub
        hi = s_d + jnp.minimum((group_row + 1) * sub, cnt)
        q = (lo + pack * wave_ids) // pack  # (w2, B) packed-row ids
        qc = jnp.minimum(q, rows_pk - 1)
        pos0 = pack * q
        if signed:
            sp = splits_w[digit_row]  # positives begin here (negatives first)
            valids = [
                (
                    ((pos0 + j >= lo) & (pos0 + j < hi)).astype(jnp.int32)
                    * (2 - (pos0 + j >= sp).astype(jnp.int32))
                )
                for j in range(pack)
            ]
        else:
            valids = [
                ((pos0 + j >= lo) & (pos0 + j < hi) & (digit_row != 0)).astype(jnp.int32)
                for j in range(pack)
            ]
        packed_sorted = packed[order]  # (N, 2*comps*NL) wide gather
        packed_pk = packed_sorted.reshape(rows_pk, pack * packed.shape[1])
        if kt:
            # feed the gather's natural (w2, B, row) layout straight to the
            # kernel (it transposes tiles in VMEM) - no XLA transpose pass
            valid = jnp.stack(valids, axis=-1)  # (w2, B, pack)
            wave_packed = packed_pk[qc]
        else:
            valid = jnp.stack(valids, axis=1)  # (w2, pack, B)
            wave_packed = jnp.transpose(packed_pk[qc], (0, 2, 1))
        buckets = _wave_accumulate(comps, pack, wave_packed, valid, btile, kt, signed)
        if signed:
            # lane weight = lane//g + 1: marking every g-th lane INCLUDING
            # lane 0 makes the suffix-sum count exactly that (for body
            # windows g=1: all lanes marked, weight lane+1)
            wmask = (lane_row % g == 0).astype(jnp.int32)
        else:
            wmask = ((lane_row % g == 0) & (lane_row != 0)).astype(jnp.int32)
        sums = _suffix_reduce(comps, wmask, buckets)  # 3*comps of (NL, 128)
        out = jnp.concatenate(sums, axis=0)
        if not exclude:
            return None, out
        # hot-bucket dense pass: its points are the contiguous sorted run
        # [lo_s, hi_s); sweep only the w3 (B-row) blocks that can overlap it
        # (dynamic slice of the block-padded sorted payload) with a range
        # mask - a slice + reshape, not another gather (ADVICE r4: the old
        # full-payload sweep made the dense pass dominate at large N/B)
        lo_s = starts_w[dstar]
        hi_s = lo_s + counts_w[dstar]
        blocks = -(-rows_pk // b)
        rows_pad = blocks * b
        pk_pad = (
            packed_pk
            if rows_pad == rows_pk
            else jnp.concatenate(
                [packed_pk, jnp.zeros((rows_pad - rows_pk, packed_pk.shape[1]), U32)]
            )
        )
        start_blk = jnp.clip(lo_s // (pack * b), 0, blocks - w3)
        window_rows = jax.lax.dynamic_slice(
            pk_pad, (start_blk * b, jnp.int32(0)), (w3 * b, packed_pk.shape[1])
        )
        k3 = jax.lax.broadcasted_iota(jnp.int32, (w3, b), 0)
        l3 = jax.lax.broadcasted_iota(jnp.int32, (w3, b), 1)
        pos3 = pack * ((start_blk + k3) * b + l3)
        if signed:
            sp_s = splits_w[dstar]
            valids2 = [
                (
                    ((pos3 + j >= lo_s) & (pos3 + j < hi_s)).astype(jnp.int32)
                    * (2 - (pos3 + j >= sp_s).astype(jnp.int32))
                )
                for j in range(pack)
            ]
        else:
            valids2 = [
                ((pos3 + j >= lo_s) & (pos3 + j < hi_s)).astype(jnp.int32)
                for j in range(pack)
            ]
        if kt:
            wave2 = window_rows.reshape(w3, b, packed_pk.shape[1])
            valid2 = jnp.stack(valids2, axis=-1)
        else:
            wave2 = jnp.transpose(window_rows.reshape(w3, b, packed_pk.shape[1]), (0, 2, 1))
            valid2 = jnp.stack(valids2, axis=1)
        buckets2 = _wave_accumulate(comps, pack, wave2, valid2, btile, kt, signed)
        wmask0 = (lane_row == 0).astype(jnp.int32)
        sums2 = _suffix_reduce(comps, wmask0, buckets2)
        return None, (out, jnp.concatenate(sums2, axis=0))

    # windows MSB-first
    gs = jnp.asarray(_window_groups_signed(c) if signed else _window_groups(c))
    xs = (orders[::-1], starts[::-1], splits[::-1], counts[::-1], dstars[::-1], gs[::-1])
    _, scanned = jax.lax.scan(per_window, None, xs)
    if exclude:
        sums_msb, sums2_msb = scanned
        weights = dstars + 1 if signed else dstars  # hot-bucket fold weight
        bits = ((weights[::-1, None] >> jnp.arange(c)[None, :]) & 1).astype(jnp.int32)
        bits_msb = jnp.broadcast_to(bits[:, :, None], bits.shape + (128,))
        planes = _combine_windows(comps, c, sums_msb, sums2_msb, bits_msb)
    else:
        planes = _combine_windows(comps, c, scanned)
    if comps == 1:
        return planes[0][:, :1], planes[1][:, :1], planes[2][:, :1]
    return (
        (planes[0][:, :1], planes[1][:, :1]),
        (planes[2][:, :1], planes[3][:, :1]),
        (planes[4][:, :1], planes[5][:, :1]),
    )


def pick_window(n: int) -> int:
    """Window size for the unsigned Pallas path: minimizes nwin*(N + slack*B)
    + fixed suffix cost, empirically c ~ log2(N) - 7, clamped to [8, 13]."""
    return max(8, min(13, n.bit_length() - 8))


def pick_window_signed(n: int) -> int:
    """Window size for the signed-digit path (B = 2^(c-1) buckets): the
    per-window gather cost ~N(1+1/pack) rows dominates the per-window suffix
    cost ~B*2log2(B) lane steps, so larger c (fewer windows) wins once N
    covers the bucket planes; c = 16 makes each window one 16-bit limb
    (v5e sweep 2026-08-20: c=16 beats 14/15 at 2^18..2^20)."""
    return max(8, min(16, n.bit_length() - 4))


def _signed_mode() -> bool:
    """Signed-digit Pippenger is OPT-IN (PHASE2_TPU_MSM_SIGNED=1).

    Measured negative result (v5e 2^20, 2026-08-20): signed c=14 pack=4
    reaches 509k pts/s vs unsigned c=13's 531k - the ~5% window reduction
    (19 vs 20) is outweighed by the tri-state valid handling, per-madd
    negate select, and split-table lookups; c=15 (B=2^14) loses its window
    savings to the suffix kernel's 2x lane work (430k), and c=16 (B=2^15)
    cannot compile the single-kernel suffix scan (186M VMEM register
    spill). A two-level suffix reduction (7*B in-segment steps + cross-
    segment weighted fold instead of 2*log2(B)*B) would cut the suffix
    cost ~4x and likely flip c=15/16 positive - designed, not built
    (ROADMAP round 5)."""
    import os

    return os.environ.get("PHASE2_TPU_MSM_SIGNED", "").strip().lower() in (
        "1",
        "true",
        "on",
    )


def _result_to_jac(comps, result) -> G.JacobianBatch:
    """1-lane transposed planes -> row-major JacobianBatch with batch ()."""
    if comps == 1:
        x, y, z = (r[:, 0] for r in result)
        return G.JacobianBatch(x, y, z)
    (x0, x1), (y0, y1), (z0, z1) = result

    def pack(c0, c1):
        return jnp.stack([c0[:, 0], c1[:, 0]], axis=0)

    return G.JacobianBatch(pack(x0, x1), pack(y0, y1), pack(z0, z1))


def _pack_factor(n: int) -> int:
    """Points per wave-gather row. The wave gather is the MSM's bottleneck
    (per-row overhead ~21-25 M rows/s on v5e); packing 4 points per row cuts
    its row count 4x for one extra reshape. Env override for sweeps."""
    import os

    v = os.environ.get("PHASE2_TPU_MSM_PACK")
    if v:
        return max(1, int(v))
    return 4 if n >= (1 << 14) else 1


def _kt_mode(comps: int, pack: int) -> bool:
    """Kernel-transpose mode: skip the per-window XLA (w2, B, row)->(w2,
    row, B) HBM transpose and let the wave kernel transpose VMEM tiles.
    Needs lane-aligned packed rows (row width multiple of 128 columns).
    PHASE2_TPU_MSM_KT=0 restores the XLA transpose path."""
    import os

    if os.environ.get("PHASE2_TPU_MSM_KT", "").strip().lower() in ("0", "false", "off"):
        return False
    return (pack * 2 * comps * NLIMBS) % 128 == 0


def _wave_cap(max_occ: int, pack: int, b: int = 0) -> int:
    """Static wave count: ceil(max_occ/pack) + 1 (the +1 absorbs packed-row
    start misalignment), rounded up for compile-cache-friendly shapes.

    At b >= 2^14 bucket lanes each extra wave costs a full B-row gather
    (~1.5 ms at B=2^15), so big-B grids round to 4 instead of 8 - the
    coarse rounding wasted up to 78% of the wave gather there."""
    w2 = -(-max_occ // pack) + 1
    if b >= (1 << 14) and w2 <= 64:
        return -(-w2 // 4) * 4
    return -(-w2 // 8) * 8 if w2 <= 64 else -(-w2 // 32) * 32


def msm_pallas_or_none(
    group: str,
    batch: G.AffineBatch,
    scalars_canon,
    c: int | None = None,
    btile: int = 2048,
    pack: int | None = None,
    signed: bool | None = None,
):
    """Device Pippenger through the Mosaic kernels; returns a JacobianBatch
    with batch shape (), or None when the digit distribution is too skewed
    for the dense wave grid (caller falls back to ops/msm.py).

    Default mode is the signed-digit formulation (`signed`): B = 2^(c-1)
    buckets per window, signs folded into the wave madd, 16 one-limb windows
    at c = 16 instead of 20 at c = 13 - ~20% fewer rows through the
    permutation gathers that bound the MSM.

    Single-hot-bucket skew (repeated scalar values: witness bits, constant
    scalars - the multiexp.rs:95-102 special cases) stays on the fast path:
    the heaviest bucket per window is split out and summed densely, and the
    wave cap is sized by the remaining occupancy. Only distributions with
    SEVERAL oversized buckets per window (genuinely adversarial) fall back.

    scalars_canon: uint32[N, 16] canonical (NOT Montgomery)."""
    n = batch.inf.shape[0]
    if signed is None:
        signed = _signed_mode()
    if signed and c is not None and (1 << (c - 1)) < 128:
        signed = False  # suffix kernel needs >=128 bucket lanes
    if c is None:
        c = pick_window_signed(n) if signed else pick_window(n)
    b = 1 << (c - 1) if signed else 1 << c
    if signed:
        orders, starts, splits, counts, dstars, occs = _prep_windows_signed(
            scalars_canon, batch.inf, c
        )
    else:
        orders, starts, counts, dstars, occs = _prep_windows(scalars_canon, batch.inf, c)
        splits = starts  # no sign split: every point adds positively
    occ_all, occ2, occ_hot = (int(v) for v in np.asarray(occs))  # one host sync per MSM
    mean = max(1, n // b)
    gate = 4 * mean + 64
    if pack is None:
        pack = _pack_factor(n)
    while pack > 1 and n % pack:
        pack //= 2
    if occ_all == 0:
        return None  # all-zero scalars: caller's XLA path handles trivially
    w3 = 0
    if occ_all <= gate:
        exclude = False
        w_cap = _wave_cap(occ_all, pack, b)
    elif occ2 <= gate:
        exclude = True
        w_cap = _wave_cap(max(occ2, 1), pack, b)
        # dense-pass block count: bound the sweep to the blocks the hot run
        # can overlap (ADVICE r4); rounded for compile-cache-friendly shapes
        blocks = -(-(n // pack) // b)
        w3 = (occ_hot // pack) // b + 3
        if w3 > 8:
            w3 = -(-w3 // 8) * 8
        w3 = min(w3, blocks)
    else:
        # multiple oversized buckets per window (genuinely adversarial
        # distributions): XLA fallback
        return None
    comps = 1 if group == "g1" else 2
    packed = _packed_rows(batch, comps)
    result = _msm_main(
        comps, c, w_cap, btile, pack, exclude, _kt_mode(comps, pack), w3, signed,
        packed, orders, starts, splits, counts, dstars,
    )
    return _result_to_jac(comps, result)
