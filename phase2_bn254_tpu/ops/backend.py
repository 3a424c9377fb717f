"""JAX/TPU backend for the ceremony accumulator bulk math.

This is the production compute path: batches of points are decoded to limb
arrays, multiplied by tau-power scalars with the vectorized windowed ladder,
normalized with one batched inverse, and re-encoded - everything inside a
handful of jitted programs. Batches are padded to fixed power-of-two shapes
so each program compiles once.

Replaces: taupowers scan + per-point wNAF batch_exp
(/root/reference/powersoftau/src/batched_accumulator.rs:1130-1216) and the
random-coefficient merge_pairs MSM
(/root/reference/powersoftau/src/utils.rs:112-135).
"""

from __future__ import annotations

import functools
import os
import secrets
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import codecs
from ..curve import group as G
from ..field import fp
from ..field.fq2 import Fq2Ops, FqOps
from ..refimpl.field import Q, R_MOD

CTX_Q = codecs.CTX
CTX_R = fp.FpContext(R_MOD, "fr")
FQ = codecs.FQ
FQ2 = codecs.FQ2


def _next_pow2(n: int, minimum: int = 32) -> int:
    p = minimum
    while p < n:
        p <<= 1
    return p


@dataclass
class PointSet:
    """Padded device point batch; only the first `n` entries are live."""

    batch: G.AffineBatch
    n: int
    group: str


def _field_ops(group: str):
    return FQ if group == "g1" else FQ2


def _pad_batch(batch: G.AffineBatch, group: str, target: int) -> G.AffineBatch:
    n = batch.inf.shape[0]
    if n == target:
        return batch
    pad = target - n
    gen = codecs.points_to_batch(
        [_generator(group)] * pad, group
    )
    return G.AffineBatch(
        jnp.concatenate([batch.x, gen.x], axis=0),
        jnp.concatenate([batch.y, gen.y], axis=0),
        jnp.concatenate([batch.inf, gen.inf], axis=0),
    )


@functools.lru_cache(maxsize=None)
def _generator(group: str):
    from ..refimpl import curve as rc

    return rc.G1_GEN if group == "g1" else rc.G2_GEN


# ---------------------------------------------------------------------------
# jitted programs
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def _pow_mul_kernel(f, log2n: int, batch: G.AffineBatch, tau_start, tau_pows, coeff):
    """batch[i] * (coeff * tau^(start+i)) over a 2^log2n padded batch.

    tau_start: Fr Montgomery limbs of tau^start; tau_pows[j] = tau^(2^j);
    coeff: Fr Montgomery limbs (one for no coefficient).
    """
    powers = tau_start[None]  # (1, 16)
    for j in range(log2n):
        powers = jnp.concatenate(
            [powers, fp.mont_mul(CTX_R, powers, tau_pows[j][None])], axis=0
        )
    powers = fp.mont_mul(CTX_R, powers, coeff[None])
    scalars = fp.from_mont(CTX_R, powers)
    acc = G.batch_scalar_mul(f, batch, scalars)
    return G.jac_normalize(f, acc)


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_kernel(f, batch: G.AffineBatch, scalars):
    """Sum_i scalars[i] * batch[i] over a power-of-two batch (tree reduce).

    Naive ladder MSM kept for tiny inputs; ops.msm.msm_pippenger handles
    real sizes.
    """
    acc = G.batch_scalar_mul(f, batch, scalars)
    n = batch.inf.shape[0]
    while n > 1:
        n //= 2
        acc = G.jac_add(
            f,
            jax.tree.map(lambda a: a[:n], acc),
            jax.tree.map(lambda a: a[n:], acc),
        )
    return G.jac_normalize(f, acc)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _pow_mul_pallas(f, log2n: int, batch: G.AffineBatch, tau_start, tau_pows, coeff):
    """pow_mul via the fused Pallas batch-exp kernel (G1/G2, TPU only).

    All scalar glue (tau-power log-doubling, Montgomery exit, GLV split,
    window extraction) runs in the transposed (16, N) limb layout - the
    row-major [N, 16] fp path wastes 7/8 of every vector and used to cost
    more than the ladder kernel itself."""
    from . import glv_device, gls_device, pallas_exp

    scalars_t = pallas_exp.tau_powers_t(tau_start, tau_pows, coeff, log2n)
    if f.components == 1:
        if os.environ.get("PHASE2_TPU_NO_GLV"):
            digits_msb = pallas_exp.scalar_windows_t_msb(scalars_t)
            ox, oy, oz = pallas_exp.pallas_batch_exp(batch.x.T, batch.y.T, digits_msb)
        elif os.environ.get("PHASE2_TPU_NO_SIGNED5"):
            # unsigned base-16 double ladder kept as a fallback/debug path
            d1, d2, negs = glv_device.decompose_device_t(scalars_t)
            ox, oy, oz = pallas_exp.pallas_batch_exp_glv(
                batch.x.T, batch.y.T, d1, d2, negs
            )
        else:
            # signed base-32 double ladder (~10% fewer mont_muls): default
            # since the 2026-08-18 v5e run (compile clean, correctness spot
            # checks pass, 174.9k pts/s vs 166k unsigned in bench.py)
            d1, d2 = glv_device.decompose_signed_device_t(scalars_t)
            ox, oy, oz = pallas_exp.pallas_batch_exp_glv_signed(
                batch.x.T, batch.y.T, d1, d2
            )
        jac = G.JacobianBatch(ox.T, oy.T, oz.T)
    else:
        x0, x1 = batch.x[:, 0].T, batch.x[:, 1].T
        y0, y1 = batch.y[:, 0].T, batch.y[:, 1].T
        if os.environ.get("PHASE2_TPU_NO_GLS"):
            # plain 64x4-bit windowed ladder kept as a fallback/debug path
            digits_msb = pallas_exp.scalar_windows_t_msb(scalars_t)
            ox0, ox1, oy0, oy1, oz0, oz1 = pallas_exp.pallas_batch_exp_g2(
                x0, x1, y0, y1, digits_msb
            )
        elif os.environ.get("PHASE2_TPU_NO_SIGNED5"):
            # unsigned GLS quad ladder (17x4-bit windows)
            digits, negs = gls_device.decompose_device_t(scalars_t)
            ox0, ox1, oy0, oy1, oz0, oz1 = pallas_exp.pallas_batch_exp_gls(
                x0, x1, y0, y1, digits, negs
            )
        else:
            # signed GLS quad ladder (psi endomorphism, 14x5-bit signed
            # windows): default since the 2026-08-18 v5e run (compile
            # clean, correctness spot checks pass, 66.5k pts/s vs 47k for
            # the plain ladder)
            digits = gls_device.decompose_signed_device_t(scalars_t)
            ox0, ox1, oy0, oy1, oz0, oz1 = pallas_exp.pallas_batch_exp_gls_signed(
                x0, x1, y0, y1, digits
            )

        def pack(c0, c1):
            return jnp.stack([c0.T, c1.T], axis=-2)

        jac = G.JacobianBatch(pack(ox0, ox1), pack(oy0, oy1), pack(oz0, oz1))
    return G.jac_normalize(f, jac)


def _use_pallas(group: str, n: int) -> bool:
    import os

    if os.environ.get("PHASE2_TPU_NO_PALLAS"):
        return False
    # the axon platform reports its own name; anything non-CPU is a TPU here.
    # Padded batches are always >= 32 and a power of two, so the pallas path
    # covers every TPU pow_mul (the XLA ladder's traced program is too large
    # for the remote toolchain when unrolled).
    return n >= 32 and jax.default_backend() != "cpu"


class JaxBackend:
    """Ceremony bulk-math backend over JAX (TPU or CPU)."""

    name = "jax"

    # -- protocol ----------------------------------------------------------
    def decode(self, raw: bytes, group: str, count: int, compressed: bool, check: bool):
        batch = codecs.decode_batch(raw, group, count, compressed, check)
        return PointSet(batch, count, group)

    def encode(self, ps: PointSet, compressed: bool) -> bytes:
        live = jax.tree.map(lambda a: a[: ps.n], ps.batch)
        return codecs.encode_batch(live, ps.group, compressed)

    def pow_mul(self, ps: PointSet, tau: int, start: int, coeff: int | None) -> PointSet:
        target = _next_pow2(ps.n)
        log2n = target.bit_length() - 1
        padded = _pad_batch(ps.batch, ps.group, target)
        tau_start = jnp.asarray(
            fp.int_to_limbs(CTX_R.to_mont_int(pow(tau, start, R_MOD)))
        )
        tau_pows = jnp.asarray(
            np.stack(
                [
                    fp.int_to_limbs(CTX_R.to_mont_int(pow(tau, 1 << j, R_MOD)))
                    for j in range(max(log2n, 1))
                ]
            )
        )
        coeff_arr = jnp.asarray(
            fp.int_to_limbs(CTX_R.to_mont_int(coeff if coeff is not None else 1))
        )
        kern = _pow_mul_pallas if _use_pallas(ps.group, target) else _pow_mul_kernel
        aff = kern(_field_ops(ps.group), log2n, padded, tau_start, tau_pows, coeff_arr)
        # NOTE: no device sync here - the "contribution produced infinity,
        # re-run" protection (batched_accumulator.rs:1176-1179) fires in
        # encode(), which already rejects infinities; keeping pow_mul async
        # lets the transform loop pipeline chunks.
        return PointSet(aff, ps.n, ps.group)

    def msm(self, ps: PointSet, scalars: list[int]):
        """Multi-scalar multiplication -> single affine host Point.

        Pippenger for real sizes; tiny inputs use the naive ladder (the
        Pippenger fixed overhead of 2^c buckets isn't worth it below ~64)."""
        return self.msm_wait(self.msm_async(ps, scalars))

    def msm_async(self, ps: PointSet, scalars: list[int]):
        """Dispatch an MSM without pulling the result: returns a handle for
        msm_wait. The device affine output stays async, so a caller with
        several independent MSMs (the prover's 7+1 query multiexps,
        /root/reference/bellman/src/groth16/prover.rs:276-334 future joins)
        queues all kernels back-to-back instead of paying one host
        round-trip per query (VERDICT r3 item 7)."""
        assert len(scalars) == ps.n
        target = _next_pow2(ps.n)
        padded = _pad_batch(ps.batch, ps.group, target)
        sc = fp.ints_to_limbs_batch([s % R_MOD for s in scalars])
        if target > ps.n:
            sc = np.vstack(
                [sc, np.zeros((target - ps.n, fp.NLIMBS), dtype=np.uint32)]
            )
        f = _field_ops(ps.group)
        if target >= 64:
            jac = None
            if target >= 2048 and _use_pallas(ps.group, target):
                # fused Mosaic bucket pipeline (lazy reduction, mixed adds);
                # returns None on adversarially skewed digit distributions
                from . import pallas_msm

                jac = pallas_msm.msm_pallas_or_none(ps.group, padded, jnp.asarray(sc))
            if jac is None:
                from . import msm as msm_mod

                # padding points carry scalar 0 => skipped by the bucket
                # logic. Rolled limb loops: the Pippenger program is too
                # large for the remote TPU compiler when unrolled.
                with fp.force_rolled():
                    jac = msm_mod.msm_pippenger(
                        f, padded, jnp.asarray(sc), msm_mod.pick_window(target)
                    )
            out = _normalize_kernel(f, jax.tree.map(lambda a: a[None], jac))
        else:
            out = _msm_kernel(f, padded, jnp.asarray(sc))
        return (out, ps.group)

    def msm_wait(self, handle):
        out, group = handle
        return codecs.batch_to_points(out, group)[0]

    def power_pairs(self, ps: PointSet):
        """(merge_pairs of v[:-1] vs v[1:]) with shared random coefficients."""
        m = ps.n - 1
        coeffs = [secrets.randbelow(R_MOD) for _ in range(m)]
        head = PointSet(jax.tree.map(lambda a: a[:m], ps.batch), m, ps.group)
        tail = PointSet(jax.tree.map(lambda a: a[1 : ps.n], ps.batch), m, ps.group)
        return self.msm(head, coeffs), self.msm(tail, coeffs)

    def first_point(self, ps: PointSet):
        return codecs.batch_to_points(jax.tree.map(lambda a: a[:1], ps.batch), ps.group)[0]

    def last_point(self, ps: PointSet):
        return codecs.batch_to_points(
            jax.tree.map(lambda a: a[ps.n - 1 : ps.n], ps.batch), ps.group
        )[0]

    def from_points(self, points, group: str):
        return PointSet(codecs.points_to_batch(points, group), len(points), group)

    def from_batch(self, batch: G.AffineBatch, group: str):
        """Wrap an existing device AffineBatch (streamed host->device rows)."""
        return PointSet(batch, batch.inf.shape[0], group)

    # -- prepare_phase2 support -------------------------------------------
    def slice(self, ps: PointSet, start: int, stop: int) -> PointSet:
        assert 0 <= start <= stop <= ps.n
        return PointSet(
            jax.tree.map(lambda a: a[start:stop], ps.batch), stop - start, ps.group
        )

    def concat(self, parts: list[PointSet]) -> PointSet:
        group = parts[0].group
        batches = [jax.tree.map(lambda a: a[: p.n], p.batch) for p in parts]
        batch = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *batches)
        return PointSet(batch, sum(p.n for p in parts), group)

    def group_intt(self, ps: PointSet) -> PointSet:
        """Lagrange conversion: inverse group NTT + batch normalization
        (prepare_phase2.rs:102-131). May produce points at infinity."""
        from . import ntt

        exp = ps.n.bit_length() - 1
        assert 1 << exp == ps.n
        f = _field_ops(ps.group)
        jac = G.affine_to_jac(f, ps.batch)
        with fp.force_rolled():
            out = ntt.group_ntt_staged(f, exp, jac, inverse=True)
        return PointSet(_normalize_kernel(f, out), ps.n, ps.group)

    def sub_batches(self, a: PointSet, b: PointSet) -> PointSet:
        """a[i] - b[i], normalized (the H-query bases tau^(i+m) - tau^i,
        prepare_phase2.rs:137-148)."""
        assert a.n == b.n and a.group == b.group
        f = _field_ops(a.group)
        out = _sub_kernel(f, a.batch, b.batch)
        return PointSet(out, a.n, a.group)

    def encode_radix(self, ps: PointSet, compressed: bool = False) -> bytes:
        """Uncompressed encode permitting points at infinity (radix files)."""
        live = jax.tree.map(lambda a: a[: ps.n], ps.batch)
        return codecs.encode_batch(live, ps.group, compressed, allow_infinity=True)


@functools.partial(jax.jit, static_argnums=(0,))
def _normalize_kernel(f, jac: G.JacobianBatch) -> G.AffineBatch:
    return G.jac_normalize(f, jac)


@functools.partial(jax.jit, static_argnums=(0,))
def _sub_kernel(f, a: G.AffineBatch, b: G.AffineBatch) -> G.AffineBatch:
    ja = G.affine_to_jac(f, a)
    jb = G.affine_to_jac(f, b)
    return G.jac_normalize(f, G.jac_add(f, ja, G.jac_neg(f, jb)))
