"""BLS12-381 device codecs: zcash-format bytes <-> device AffineBatch,
with on-device square-root decompression.

Mirrors the BN254 device codecs (curve/codecs.py) over the 24-limb BLS
contexts; byte semantics follow the reference's zcash conventions
(/root/reference/pairing/src/bls12_381/ec.rs: 48-byte BE Fq, flag bits in
the three MSBs of byte 0 - bit7 compressed, bit6 infinity, bit5 y
lexicographically largest; G2 x serialized c1 first). Validated against the
exact host codecs (which are pinned to the upstream .dat vectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..curve import group as G
from ..field import fp
from .device import CTX_BLS_FQ as CTX, FQ2_OPS as FQ2
from .field import Q

FQ_BYTES = 48
NL = 24

_B_G1 = jnp.asarray(fp.int_to_limbs(CTX.to_mont_int(4), NL))
_B_G2 = jnp.stack(
    [
        jnp.asarray(fp.int_to_limbs(CTX.to_mont_int(4), NL)),
        jnp.asarray(fp.int_to_limbs(CTX.to_mont_int(4), NL)),
    ]
)
_Q_BYTES = np.frombuffer(int(Q).to_bytes(FQ_BYTES, "big"), dtype=np.uint8)


def be_bytes_to_digits(b: np.ndarray) -> np.ndarray:
    """uint8 (n, 48) BE bytes -> uint32 (n, 24) LE 16-bit digits."""
    out = native.be_bytes_to_digits(b, NL)
    if out is not None:
        return out
    n = b.shape[0]
    pairs = b.reshape(n, NL, 2).astype(np.uint32)
    be = (pairs[..., 0] << 8) | pairs[..., 1]
    return be[:, ::-1].copy()


def digits_to_be_bytes(d: np.ndarray) -> np.ndarray:
    out = native.digits_to_be_bytes(d, NL)
    if out is not None:
        return out
    n = d.shape[0]
    be = d[:, ::-1]
    out = np.empty((n, NL, 2), dtype=np.uint8)
    out[..., 0] = (be >> 8) & 0xFF
    out[..., 1] = be & 0xFF
    return out.reshape(n, FQ_BYTES)


def _check_lt_q(arr: np.ndarray, what: str) -> None:
    d = arr.astype(np.int16) - _Q_BYTES[None, :]
    nz = d != 0
    first = np.argmax(nz, axis=1)
    has = nz.any(axis=1)
    val = d[np.arange(arr.shape[0]), first]
    ok = has & (val < 0)
    if not ok.all():
        raise ValueError(f"{what}: coordinate not below field modulus")


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


def _fq2_gt(a_can, b_can):
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
    x = jnp.stack(
        [fp.to_mont(CTX, x_dig[..., 0, :]), fp.to_mont(CTX, x_dig[..., 1, :])], axis=-2
    )
    y = jnp.stack(
        [fp.to_mont(CTX, y_dig[..., 0, :]), fp.to_mont(CTX, y_dig[..., 1, :])], axis=-2
    )
    if check:
        rhs = FQ2.add(FQ2.mul(FQ2.sqr(x), x), _B_G2[None])
        on_curve = FQ2.eq(FQ2.sqr(y), rhs)
    else:
        on_curve = jnp.ones(x.shape[:-2], dtype=bool)
    inf = jnp.zeros(x.shape[:-2], dtype=bool)
    return G.AffineBatch(x, y, inf), on_curve


@jax.jit
def _g2_decompress(x_dig, greatest):
    """Fq2 sqrt for q = 3 mod 4 (same algorithm as the BN254 device codec;
    the reference's bls12_381/fq2.rs sqrt)."""
    x = jnp.stack(
        [fp.to_mont(CTX, x_dig[..., 0, :]), fp.to_mont(CTX, x_dig[..., 1, :])], axis=-2
    )
    v = FQ2.add(FQ2.mul(FQ2.sqr(x), x), _B_G2[None])

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


def decode_batch(raw: bytes, group: str, count: int, compressed: bool, check: bool = True) -> G.AffineBatch:
    """zcash bytes -> device AffineBatch. Rejects infinities, out-of-field
    coordinates, bad flags, and (check=True) off-curve points."""
    esize = (FQ_BYTES if compressed else 2 * FQ_BYTES) * (1 if group == "g1" else 2)
    assert len(raw) == esize * count
    b = np.frombuffer(raw, dtype=np.uint8).reshape(count, esize).copy()

    comp_bit = (b[:, 0] & 0x80) != 0
    inf_bit = (b[:, 0] & 0x40) != 0
    sort_bit = (b[:, 0] & 0x20) != 0
    if compressed and not comp_bit.all():
        raise ValueError("compressed bit not set")
    if not compressed and comp_bit.any():
        raise ValueError("compressed bit set on uncompressed encoding")
    if inf_bit.any():
        raise ValueError("point at infinity in accumulator data")
    if not compressed and sort_bit.any():
        raise ValueError("sort bit set on uncompressed encoding")
    b[:, 0] &= 0x1F

    def fq_cols(mat):
        _check_lt_q(mat, "bls coordinate")
        return be_bytes_to_digits(mat)

    if group == "g1":
        if compressed:
            xd = fq_cols(b)
            batch, valid = _g1_decompress(jnp.asarray(xd), jnp.asarray(sort_bit))
        else:
            xd = fq_cols(b[:, :FQ_BYTES])
            yd = fq_cols(b[:, FQ_BYTES:])
            batch, valid = _g1_from_canonical(jnp.asarray(xd), jnp.asarray(yd), check)
    else:
        # x = c1 || c0 (zcash order)
        if compressed:
            xc1 = fq_cols(b[:, :FQ_BYTES])
            xc0 = fq_cols(b[:, FQ_BYTES:])
            xd = np.stack([xc0, xc1], axis=1)
            batch, valid = _g2_decompress(jnp.asarray(xd), jnp.asarray(sort_bit))
        else:
            xc1 = fq_cols(b[:, 0:FQ_BYTES])
            xc0 = fq_cols(b[:, FQ_BYTES : 2 * FQ_BYTES])
            yc1 = fq_cols(b[:, 2 * FQ_BYTES : 3 * FQ_BYTES])
            yc0 = fq_cols(b[:, 3 * FQ_BYTES :])
            xd = np.stack([xc0, xc1], axis=1)
            yd = np.stack([yc0, yc1], axis=1)
            batch, valid = _g2_from_canonical(jnp.asarray(xd), jnp.asarray(yd), check)
    if (compressed or check) and not bool(np.asarray(valid).all()):
        raise ValueError("invalid point encoding (off curve or non-residue)")
    return batch


@jax.jit
def _g1_to_canonical(x, y):
    y_can = fp.from_mont(CTX, y)
    ny_can = fp.from_mont(CTX, fp.neg(CTX, y))
    x_can = fp.from_mont(CTX, x)
    greatest = fp.gt(y_can, ny_can)
    return jnp.concatenate([x_can, y_can, greatest[:, None].astype(jnp.uint32)], axis=1)


@jax.jit
def _g2_to_canonical(x, y):
    y_can = _fq2_from_mont(y)
    ny_can = _fq2_from_mont(FQ2.neg(y))
    x_can = _fq2_from_mont(x)
    greatest = _fq2_gt(y_can, ny_can)
    return jnp.concatenate(
        [x_can[:, 0], x_can[:, 1], y_can[:, 0], y_can[:, 1], greatest[:, None].astype(jnp.uint32)],
        axis=1,
    )


def encode_batch(batch: G.AffineBatch, group: str, compressed: bool) -> bytes:
    """Device AffineBatch -> zcash bytes (no infinities)."""
    if bool(np.asarray(batch.inf).any()):
        raise ValueError("point at infinity cannot be serialized")
    if group == "g1":
        packed = np.asarray(_g1_to_canonical(batch.x, batch.y))
        xd, yd, greatest = packed[:, :NL], packed[:, NL : 2 * NL], packed[:, 2 * NL] != 0
        xb = digits_to_be_bytes(xd)
        if compressed:
            out = xb
            out[:, 0] |= np.where(greatest, 0x20, 0).astype(np.uint8)
            out[:, 0] |= 0x80
        else:
            out = np.concatenate([xb, digits_to_be_bytes(yd)], axis=1)
        return out.tobytes()
    packed = np.asarray(_g2_to_canonical(batch.x, batch.y))
    xc0, xc1 = packed[:, :NL], packed[:, NL : 2 * NL]
    yc0, yc1 = packed[:, 2 * NL : 3 * NL], packed[:, 3 * NL : 4 * NL]
    greatest = packed[:, 4 * NL] != 0
    xb = np.concatenate([digits_to_be_bytes(xc1), digits_to_be_bytes(xc0)], axis=1)
    if compressed:
        out = xb
        out[:, 0] |= np.where(greatest, 0x20, 0).astype(np.uint8)
        out[:, 0] |= 0x80
    else:
        yb = np.concatenate([digits_to_be_bytes(yc1), digits_to_be_bytes(yc0)], axis=1)
        out = np.concatenate([xb, yb], axis=1)
    return out.tobytes()
