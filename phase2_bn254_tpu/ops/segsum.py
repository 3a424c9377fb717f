"""Segmented point multiply-and-sum: the device form of the phase-2 QAP
evaluation.

The reference evaluates every QAP variable by a host loop of per-term scalar
muls (/root/reference/phase2/src/parameters.rs:225-305). Each query is a
sparse-matrix x point-vector product: out[s] = sum over terms t in segment s
of coeff_t * P_t. On TPU this becomes

1. one fused batch scalar-mul over ALL terms (the same Pallas GLV / G2
   ladder kernels as the phase-1 contribute hot loop), then
2. a segmented Hillis-Steele inclusive scan with the masked Jacobian add
   (log2 N full-width rounds; segment boundaries enter as per-term segment
   START indices so lane i combines with lane i-d only when i-d is inside
   its own segment), then
3. a gather of each segment's last lane.

Exactness: identical group law and field kernels as the rest of the stack,
so results are bit-identical with the host loop (required - cs_hash pins the
serialized parameters).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import codecs
from ..curve import group as G
from ..field import fp
from ..refimpl import curve as rc
from ..refimpl.field import R_MOD


def _next_pow2(n: int, minimum: int = 32) -> int:
    p = minimum
    while p < n:
        p <<= 1
    return p


@functools.partial(jax.jit, static_argnums=(0,))
def _seg_scan_last(f, jac: G.JacobianBatch, seg_start: jnp.ndarray, out_idx: jnp.ndarray) -> G.AffineBatch:
    """Segmented inclusive scan (Jacobian add) + gather of segment ends.

    seg_start[i] = index of the first lane of i's segment; out_idx[s] = last
    lane of segment s."""
    n = jac.z.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    acc = jac
    d = 1
    while d < n:
        shifted = jax.tree.map(lambda a: jnp.roll(a, d, axis=0), acc)
        ok = (idx - d) >= seg_start
        # out-of-segment partners contribute the identity (z = 0)
        shifted = G.JacobianBatch(
            shifted.x, shifted.y, f.select(ok, shifted.z, f.zeros((n,)))
        )
        acc = G.jac_add(f, acc, shifted)
        d *= 2
    ends = jax.tree.map(lambda a: a[out_idx], acc)
    return G.jac_normalize(f, ends)


def segmented_msm(points: list, scalars: list[int], seg_ids: list[int], n_segments: int, group: str):
    """out[s] = sum of scalars[t] * points[t] over terms with seg_ids[t] == s.

    points: host rc.Points (term base points); seg_ids must be sorted
    ascending. Segments with no terms return the identity. Returns a list of
    n_segments host points."""
    from .backend import _field_ops, _use_pallas

    assert len(points) == len(scalars) == len(seg_ids)
    n = len(points)
    if n == 0:
        return [rc.point_zero(group)] * n_segments
    f = _field_ops(group)
    target = _next_pow2(n)

    # pad with generator * 0 (identity contribution) attached to the last segment
    gen = rc.G1_GEN if group == "g1" else rc.G2_GEN
    pts = points + [gen] * (target - n)
    sc = np.zeros((target, fp.NLIMBS), dtype=np.uint32)
    for i, s in enumerate(scalars):
        sc[i] = fp.int_to_limbs(s % R_MOD)

    seg = np.asarray(seg_ids, dtype=np.int32)
    assert n < 2 or (np.diff(seg) >= 0).all(), "seg_ids must be sorted"
    firsts = np.searchsorted(seg, np.arange(n_segments), side="left")
    ends = np.searchsorted(seg, np.arange(n_segments), side="right") - 1
    starts = np.full(target, n, dtype=np.int32)  # padding lanes = own segment
    starts[:n] = firsts[seg]
    # empty segments gather lane 0 and are overwritten with the identity below
    out_idx = np.where(ends >= firsts, ends, 0).astype(np.int32)

    batch = codecs.points_to_batch(pts, group)
    sc_j = jnp.asarray(sc)
    if _use_pallas(group, target):
        from . import glv_device, pallas_exp

        scalars_t = jnp.asarray(sc.T.copy())
        if f.components == 1:
            if os.environ.get("PHASE2_TPU_NO_SIGNED5"):
                d1, d2, negs = glv_device.decompose_device_t(scalars_t)
                ox, oy, oz = pallas_exp.pallas_batch_exp_glv(
                    batch.x.T, batch.y.T, d1, d2, negs
                )
            else:
                d1, d2 = glv_device.decompose_signed_device_t(scalars_t)
                ox, oy, oz = pallas_exp.pallas_batch_exp_glv_signed(
                    batch.x.T, batch.y.T, d1, d2
                )
            jac = G.JacobianBatch(ox.T, oy.T, oz.T)
        else:
            digits_msb = pallas_exp.scalar_windows_t_msb(scalars_t)
            x0, x1 = batch.x[:, 0].T, batch.x[:, 1].T
            y0, y1 = batch.y[:, 0].T, batch.y[:, 1].T
            ox0, ox1, oy0, oy1, oz0, oz1 = pallas_exp.pallas_batch_exp_g2(
                x0, x1, y0, y1, digits_msb
            )

            def pack(c0, c1):
                return jnp.stack([c0.T, c1.T], axis=-2)

            jac = G.JacobianBatch(pack(ox0, ox1), pack(oy0, oy1), pack(oz0, oz1))
    else:
        with fp.force_rolled():
            jac = _ladder_kernel(f, batch, sc_j)

    with fp.force_rolled():
        aff = _seg_scan_last(f, jac, jnp.asarray(starts), jnp.asarray(out_idx))
    out = codecs.batch_to_points(aff, group)
    # empty segments: identity
    for s in range(n_segments):
        if ends[s] < firsts[s]:
            out[s] = rc.point_zero(group)
    return out


@functools.partial(jax.jit, static_argnums=(0,))
def _ladder_kernel(f, batch: G.AffineBatch, scalars: jnp.ndarray) -> G.JacobianBatch:
    return G.batch_scalar_mul(f, batch, scalars)
