"""Out-of-core group-element iNTT: the four-step decomposition with host-RAM
residency and device-sized row blocks.

prepare_phase2 needs inverse NTTs over POINT vectors at every degree up to
2^28 (/root/reference/powersoftau/src/bin/prepare_phase2.rs:62-110, where a
butterfly twiddle is a full scalar mul). A 2^24 G1 domain is ~2 GB of
coordinates and a 2^26 G2 domain ~17 GB - beyond a single chip's HBM - so
the domain lives in host RAM and the device sees one row of the four-step
matrix at a time:

    N = R*C, a[j1 + R*j2]:
      pass 1 (per j1-row):  B[j1][k2] = iDFT_C(a[j1 + R*:])[k2] * w^(j1*k2)
      pass 2 (per k2-row):  out[k2 + C*k1] = iDFT_R(B[:][k2])[k1]

    with w = omega_N^-1; the two stages' 1/C and 1/R factors compose to the
    global 1/N, matching ops.ntt.group_ntt_staged bit-for-bit (the DFT value
    is unique; normalized affine output is canonical).

Row DFTs reuse group_ntt_staged on device; inter-step twiddles are full
point-scalar ladders (inherent to group NTTs) with per-row geometric scalar
rows built on device by log-doubling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import codecs
from ..curve import group as G
from ..field import fp
from ..ops import ntt as sntt
from ..ops.backend import _field_ops, _normalize_kernel
from ..refimpl.field import R_MOD


@dataclass
class HostPoints:
    """Affine points resident in host RAM (numpy limb arrays)."""

    x: np.ndarray  # (n, 16) u32 for g1 / (n, 2, 16) for g2
    y: np.ndarray
    inf: np.ndarray  # (n,) bool
    group: str

    @property
    def n(self) -> int:
        return self.inf.shape[0]

    def row(self, idx) -> G.AffineBatch:
        return G.AffineBatch(
            jnp.asarray(self.x[idx]), jnp.asarray(self.y[idx]), jnp.asarray(self.inf[idx])
        )


def pointset_to_host(ps) -> HostPoints:
    b = ps.batch
    return HostPoints(
        np.asarray(b.x)[: ps.n].copy(),
        np.asarray(b.y)[: ps.n].copy(),
        np.asarray(b.inf)[: ps.n].copy(),
        ps.group,
    )


def _empty_like(src: HostPoints, n: int) -> HostPoints:
    return HostPoints(
        np.zeros((n, *src.x.shape[1:]), np.uint32),
        np.zeros((n, *src.y.shape[1:]), np.uint32),
        np.zeros(n, bool),
        src.group,
    )


def _geom_scalars_canonical(base_int: int, length: int) -> jnp.ndarray:
    """[1, b, b^2, ..., b^(length-1)] canonical uint32[length,16], built on
    device by log-doubling in Montgomery form."""
    ctx = sntt.CTX_R
    out = jnp.asarray(fp.int_to_limbs(ctx.r))[None]  # Montgomery 1
    cur = jnp.asarray(fp.int_to_limbs(ctx.to_mont_int(base_int)))[None]
    while out.shape[0] < length:
        out = jnp.concatenate([out, fp.mont_mul(ctx, out, cur)], axis=0)
        cur = fp.mont_mul(ctx, cur, cur)
    return fp.from_mont(ctx, out[:length])


def group_intt_streamed(src: HostPoints, exp: int) -> HostPoints:
    """Inverse group NTT of src (length 2^exp) -> natural-order result, host
    resident. Device memory use is O(max(R, C)) - one matrix row at a time."""
    n = 1 << exp
    assert src.n == n
    if n == 1:
        return src
    f = _field_ops(src.group)
    exp_r = exp // 2
    exp_c = exp - exp_r
    R, C = 1 << exp_r, 1 << exp_c
    w_inv = pow(sntt.Domain(exp).omega, R_MOD - 2, R_MOD)

    inter = _empty_like(src, n)  # B[j1*C + k2]
    with fp.force_rolled():
        for j1 in range(R):
            aff = src.row(np.arange(j1, n, R))
            jac = _affine_to_jac_kernel(f, aff)
            jac = sntt.group_ntt_staged(f, exp_c, jac, inverse=True)
            if j1 > 0:
                sc = _geom_scalars_canonical(pow(w_inv, j1, R_MOD), C)
                jac = sntt._jac_scalar_mul(f, jac, sc)
            out = _normalize_kernel(f, jac)
            sl = slice(j1 * C, (j1 + 1) * C)
            inter.x[sl] = np.asarray(out.x)
            inter.y[sl] = np.asarray(out.y)
            inter.inf[sl] = np.asarray(out.inf)

        result = _empty_like(src, n)
        for k2 in range(C):
            aff = inter.row(np.arange(k2, n, C))
            jac = _affine_to_jac_kernel(f, aff)
            jac = sntt.group_ntt_staged(f, exp_r, jac, inverse=True)
            out = _normalize_kernel(f, jac)
            idx = np.arange(k2, n, C)
            result.x[idx] = np.asarray(out.x)
            result.y[idx] = np.asarray(out.y)
            result.inf[idx] = np.asarray(out.inf)
    return result


@jax.jit
def _affine_to_jac_g1(batch):
    return G.affine_to_jac(_field_ops("g1"), batch)


@jax.jit
def _affine_to_jac_g2(batch):
    return G.affine_to_jac(_field_ops("g2"), batch)


def _affine_to_jac_kernel(f, batch):
    return _affine_to_jac_g1(batch) if f.components == 1 else _affine_to_jac_g2(batch)


def encode_host(points: HostPoints, compressed: bool = False, allow_infinity: bool = True) -> bytes:
    """Encode host-resident points chunk-wise (radix-file codec)."""
    out = []
    chunk = 1 << 16
    for s in range(0, points.n, chunk):
        aff = points.row(np.arange(s, min(s + chunk, points.n)))
        out.append(
            codecs.encode_batch(aff, points.group, compressed, allow_infinity=allow_infinity)
        )
    return b"".join(out)
