"""Point codecs bridging file bytes <-> device limb batches.

Byte format is pinned by the exact spec in refimpl.curve (big-endian
canonical coordinates with flag bits in the top byte,
/root/reference/pairing/src/bn256/ec.rs:763-946,1135-1330):

* G1 uncompressed 64B: x||y, bit6(byte0) = infinity
* G1 compressed  32B: x, bit7 = y lexicographically largest, bit6 = infinity
* G2 uncompressed 128B: x.c1||x.c0||y.c1||y.c0
* G2 compressed  64B: x.c1||x.c0 with the same flags

Host numpy does the byte swizzle; decompression square roots and
canonical-order comparisons run vectorized on device. Accumulator decoding
rejects points at infinity (batched_accumulator.rs:985-991).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..field import fp
from ..field.fq2 import Fq2Ops, FqOps
from ..refimpl.field import Q
from . import group as G

CTX = fp.FpContext(Q, "fq")
FQ = FqOps(CTX)
FQ2 = Fq2Ops(CTX)

_Q_BE = Q.to_bytes(32, "big")
_Q_BYTES = np.frombuffer(_Q_BE, dtype=np.uint8).astype(np.int16)

# curve coefficients in Montgomery form (device constants)
_B_G1 = jnp.asarray(fp.int_to_limbs(CTX.to_mont_int(3)))
from ..refimpl.field import B_G2 as _B_G2_VAL  # 3/(9+u)

_B_G2 = jnp.stack(
    [
        jnp.asarray(fp.int_to_limbs(CTX.to_mont_int(_B_G2_VAL.c0))),
        jnp.asarray(fp.int_to_limbs(CTX.to_mont_int(_B_G2_VAL.c1))),
    ]
)


# ---------------------------------------------------------------------------
# host byte swizzles
# ---------------------------------------------------------------------------

def be_bytes_to_digits(arr: np.ndarray) -> np.ndarray:
    """uint8 (n, 32) big-endian -> uint32 (n, 16) LE 16-bit digits."""
    n = arr.shape[0]
    pairs = arr.reshape(n, 16, 2).astype(np.uint32)
    be16 = (pairs[..., 0] << 8) | pairs[..., 1]
    return be16[:, ::-1].copy()


def digits_to_be_bytes(d: np.ndarray) -> np.ndarray:
    """uint32 (n, 16) LE digits -> uint8 (n, 32) big-endian bytes."""
    n = d.shape[0]
    be16 = d[:, ::-1]
    out = np.empty((n, 16, 2), dtype=np.uint8)
    out[..., 0] = (be16 >> 8) & 0xFF
    out[..., 1] = be16 & 0xFF
    return out.reshape(n, 32)


def _check_lt_q(arr: np.ndarray, what: str) -> None:
    """Reject coordinates >= q (ff `from_repr` error semantics)."""
    d = arr.astype(np.int16) - _Q_BYTES[None, :]
    nz = d != 0
    first = np.argmax(nz, axis=1)
    has = nz.any(axis=1)
    val = d[np.arange(arr.shape[0]), first]
    ok = has & (val < 0)
    if not ok.all():
        raise ValueError(f"{what}: coordinate not below field modulus")


# ---------------------------------------------------------------------------
# device kernels (jitted; shapes keyed by batch size)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2,))
def _g1_from_canonical(x_dig, y_dig, check: bool):
    x = fp.to_mont(CTX, x_dig)
    y = fp.to_mont(CTX, y_dig)
    if check:
        rhs = fp.add(CTX, fp.mont_mul(CTX, fp.mont_mul(CTX, x, x), x), _B_G1)
        on_curve = fp.eq(fp.mont_mul(CTX, y, y), rhs)
    else:
        on_curve = jnp.ones(x.shape[:-1], dtype=bool)
    inf = jnp.zeros(x.shape[:-1], dtype=bool)
    return G.AffineBatch(x, y, inf), on_curve


@jax.jit
def _g1_decompress(x_dig, greatest):
    """x digits + greatest flag -> point; valid iff x^3+b is a QR."""
    x = fp.to_mont(CTX, x_dig)
    rhs = fp.add(CTX, fp.mont_mul(CTX, fp.mont_mul(CTX, x, x), x), _B_G1)
    y = fp.pow_fixed(CTX, rhs, (Q + 1) // 4)
    valid = fp.eq(fp.mont_mul(CTX, y, y), rhs)
    neg_y = fp.neg(CTX, y)
    y_can = fp.from_mont(CTX, y)
    ny_can = fp.from_mont(CTX, neg_y)
    y_is_greatest = fp.gt(y_can, ny_can)
    y_sel = fp.select(y_is_greatest == greatest, y, neg_y)
    inf = jnp.zeros(x.shape[:-1], dtype=bool)
    return G.AffineBatch(x, y_sel, inf), valid


@jax.jit
def _g1_to_canonical(x, y):
    """Returns ONE packed array (N, 33) = [x digits | y digits | greatest]
    so the host needs a single device->host pull (the tunnel charges per
    transfer)."""
    y_can = fp.from_mont(CTX, y)
    ny_can = fp.from_mont(CTX, fp.neg(CTX, y))
    x_can = fp.from_mont(CTX, x)
    greatest = fp.gt(y_can, ny_can)
    return jnp.concatenate(
        [x_can, y_can, greatest[:, None].astype(jnp.uint32)], axis=1
    )


def _fq2_gt(a_can, b_can):
    """Fq2 canonical ordering: c1 first then c0 (fq2.rs:21-30)."""
    c1_gt = fp.gt(a_can[..., 1, :], b_can[..., 1, :])
    c1_eq = fp.eq(a_can[..., 1, :], b_can[..., 1, :])
    c0_gt = fp.gt(a_can[..., 0, :], b_can[..., 0, :])
    return c1_gt | (c1_eq & c0_gt)


def _fq2_from_mont(a):
    return jnp.stack(
        [fp.from_mont(CTX, a[..., 0, :]), fp.from_mont(CTX, a[..., 1, :])], axis=-2
    )


@functools.partial(jax.jit, static_argnums=(2,))
def _g2_from_canonical(x_dig, y_dig, check: bool):
    x = jnp.stack([fp.to_mont(CTX, x_dig[..., 0, :]), fp.to_mont(CTX, x_dig[..., 1, :])], axis=-2)
    y = jnp.stack([fp.to_mont(CTX, y_dig[..., 0, :]), fp.to_mont(CTX, y_dig[..., 1, :])], axis=-2)
    if check:
        rhs = FQ2.add(FQ2.mul(FQ2.sqr(x), x), _B_G2)
        on_curve = FQ2.eq(FQ2.sqr(y), rhs)
    else:
        on_curve = jnp.ones(x.shape[:-2], dtype=bool)
    inf = jnp.zeros(x.shape[:-2], dtype=bool)
    return G.AffineBatch(x, y, inf), on_curve


@jax.jit
def _g2_decompress(x_dig, greatest):
    """Fq2 square root per the reference's Algorithm 9 (eprint 2012/685)
    implementation (fq2.rs:211-258), vectorized with masks."""
    x = jnp.stack([fp.to_mont(CTX, x_dig[..., 0, :]), fp.to_mont(CTX, x_dig[..., 1, :])], axis=-2)
    v = FQ2.add(FQ2.mul(FQ2.sqr(x), x), _B_G2)  # rhs = x^3 + b

    a1 = FQ2.pow_fixed(v, (Q - 3) // 4)
    alpha = FQ2.mul(FQ2.sqr(a1), v)
    a0 = FQ2.mul(FQ2.conjugate(alpha), alpha)

    batch = x.shape[:-2]
    neg1 = FQ2.pack(CTX.const(Q - 1, batch), CTX.zeros(batch))
    u_elem = FQ2.pack(CTX.zeros(batch), CTX.ones_mont(batch))

    is_nonresidue = FQ2.eq(a0, neg1)
    alpha_is_neg1 = FQ2.eq(alpha, neg1)

    a1v = FQ2.mul(a1, v)
    y_branch1 = FQ2.mul(a1v, u_elem)
    b = FQ2.pow_fixed(FQ2.add(alpha, FQ2.ones(batch)), (Q - 1) // 2)
    y_branch2 = FQ2.mul(a1v, b)
    y = FQ2.select(alpha_is_neg1, y_branch1, y_branch2)

    valid = FQ2.eq(FQ2.sqr(y), v) & ~is_nonresidue
    neg_y = FQ2.neg(y)
    y_can = _fq2_from_mont(y)
    ny_can = _fq2_from_mont(neg_y)
    y_is_greatest = _fq2_gt(y_can, ny_can)
    y_sel = FQ2.select(y_is_greatest == greatest, y, neg_y)
    inf = jnp.zeros(batch, dtype=bool)
    return G.AffineBatch(x, y_sel, inf), valid


@jax.jit
def _g2_to_canonical(x, y):
    """Packed (N, 65) = [x.c0 | x.c1 | y.c0 | y.c1 | greatest]."""
    y_can = _fq2_from_mont(y)
    ny_can = _fq2_from_mont(FQ2.neg(y))
    x_can = _fq2_from_mont(x)
    greatest = _fq2_gt(y_can, ny_can)
    return jnp.concatenate(
        [
            x_can[:, 0],
            x_can[:, 1],
            y_can[:, 0],
            y_can[:, 1],
            greatest[:, None].astype(jnp.uint32),
        ],
        axis=1,
    )


# ---------------------------------------------------------------------------
# public codec API
# ---------------------------------------------------------------------------

def _decode_digits_host(raw: bytes, count: int, ncoords: int, compressed: bool):
    """Element bytes -> (digits (count, ncoords, 16) uint32 in file coordinate
    order, greatest bool mask), validating flags and coordinate range.  Uses
    the native C++ codec when available, numpy otherwise."""
    res = native.decode_digits(
        raw, count, ncoords, 16, _Q_BE, reject_greatest=not compressed
    )
    if res is not None:
        digits, greatest, _ = res
        return digits, greatest
    esize = ncoords * 32
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(count, esize).copy()
    flags = arr[:, 0]
    if np.any(flags & 0x40):
        raise ValueError("point at infinity in accumulator stream")
    greatest = (flags & 0x80) != 0
    if not compressed and np.any(greatest):
        raise ValueError("compression flag set on uncompressed point")
    arr[:, 0] &= 0x3F
    digits = np.empty((count, ncoords, 16), dtype=np.uint32)
    for c in range(ncoords):
        coord = arr[:, 32 * c : 32 * (c + 1)]
        _check_lt_q(coord, f"coordinate {c}")
        digits[:, c] = be_bytes_to_digits(coord)
    return digits, greatest


def decode_batch(raw: bytes, group: str, count: int, compressed: bool, check: bool) -> G.AffineBatch:
    """Bytes -> device AffineBatch (Montgomery form). Raises on infinity,
    out-of-field coordinates, off-curve (check=True), or bad QR decompression.
    """
    ncoords = (1 if group == "g1" else 2) * (1 if compressed else 2)
    digits, greatest = _decode_digits_host(raw, count, ncoords, compressed)

    if group == "g1":
        if compressed:
            batch, valid = _g1_decompress(
                jnp.asarray(digits[:, 0]), jnp.asarray(greatest)
            )
        else:
            batch, valid = _g1_from_canonical(
                jnp.asarray(digits[:, 0]), jnp.asarray(digits[:, 1]), check
            )
    else:
        # file coordinate order is c1 || c0; the device stacks want [c0, c1]
        if compressed:
            xd = jnp.asarray(digits[:, [1, 0]])
            batch, valid = _g2_decompress(xd, jnp.asarray(greatest))
        else:
            xd = jnp.asarray(digits[:, [1, 0]])
            yd = jnp.asarray(digits[:, [3, 2]])
            batch, valid = _g2_from_canonical(xd, yd, check)

    if compressed or check:
        # decompression / on-curve validity requires a device sync; the
        # unchecked-uncompressed path (the contribute hot loop) skips the
        # round trip entirely (host-side range checks already ran)
        if not bool(jnp.all(valid)):
            raise ValueError(f"invalid {group} point in stream (off-curve or non-QR)")
    return batch


def encode_batch(
    batch: G.AffineBatch, group: str, compressed: bool, allow_infinity: bool = False
) -> bytes:
    """Device AffineBatch -> bytes. The accumulator never serializes points
    at infinity; radix files may (allow_infinity=True) with the 0x40 flag."""
    infs = np.asarray(batch.inf)
    has_inf = bool(infs.any())
    if has_inf and not allow_infinity:
        raise ValueError("point at infinity cannot be serialized into the accumulator")

    if group == "g1":
        packed = np.asarray(_g1_to_canonical(batch.x, batch.y))  # one pull
        # packed columns: x@0, y@16, greatest@32; file order = x (|| y)
        cols = [0] if compressed else [0, 16]
    else:
        packed = np.asarray(_g2_to_canonical(batch.x, batch.y))  # one pull
        # packed columns: x.c0@0, x.c1@16, y.c0@32, y.c1@48, greatest@64;
        # file order = x.c1 || x.c0 (|| y.c1 || y.c0)
        cols = [16, 0] if compressed else [16, 0, 48, 32]
    gcol = packed.shape[1] - 1 if compressed else -1

    out = native.encode_digits(
        packed, cols, 16, greatest_col=gcol, inf_mask=infs if has_inf else None
    )
    if out is None:  # numpy fallback
        greatest = packed[:, -1] != 0
        out = np.concatenate([digits_to_be_bytes(packed[:, c : c + 16]) for c in cols], axis=1)
        if compressed:
            out[:, 0] |= np.where(greatest, 0x80, 0).astype(np.uint8)
        if has_inf:
            out[infs] = 0
            out[infs, 0] = 0x40
    return out.tobytes()


# -- host Point <-> batch bridges (few-element boundary use only) -----------

def batch_to_points(batch: G.AffineBatch, group: str):
    from ..refimpl import curve as rc
    from ..refimpl.field import Fq2

    xs, ys, infs = np.asarray(batch.x), np.asarray(batch.y), np.asarray(batch.inf)
    pts = []
    for i in range(infs.shape[0]):
        if infs[i]:
            pts.append(rc.point_zero(group))
        elif group == "g1":
            pts.append(
                rc.Point(
                    CTX.from_mont_int(fp.limbs_to_int(xs[i])),
                    CTX.from_mont_int(fp.limbs_to_int(ys[i])),
                    False,
                    "g1",
                )
            )
        else:
            pts.append(
                rc.Point(
                    Fq2(
                        CTX.from_mont_int(fp.limbs_to_int(xs[i, 0])),
                        CTX.from_mont_int(fp.limbs_to_int(xs[i, 1])),
                    ),
                    Fq2(
                        CTX.from_mont_int(fp.limbs_to_int(ys[i, 0])),
                        CTX.from_mont_int(fp.limbs_to_int(ys[i, 1])),
                    ),
                    False,
                    "g2",
                )
            )
    return pts


def points_to_batch(points, group: str) -> G.AffineBatch:
    from ..refimpl.field import Fq2

    def fq_arr(vals):
        return jnp.asarray(
            np.stack([fp.int_to_limbs(CTX.to_mont_int(v)) for v in vals])
        )

    if group == "g1":
        x = fq_arr([p.x if not p.inf else 0 for p in points])
        y = fq_arr([p.y if not p.inf else 1 for p in points])
    else:
        xs = [p.x if not p.inf else Fq2(0, 0) for p in points]
        ys = [p.y if not p.inf else Fq2(1, 0) for p in points]
        x = jnp.stack([fq_arr([v.c0 for v in xs]), fq_arr([v.c1 for v in xs])], axis=-2)
        y = jnp.stack([fq_arr([v.c0 for v in ys]), fq_arr([v.c1 for v in ys])], axis=-2)
    return G.AffineBatch(x, y, jnp.asarray([p.inf for p in points]))
