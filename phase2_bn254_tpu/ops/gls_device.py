"""Device-side GLS 4-D scalar decomposition for BN254 G2 (Barrett lattice).

Mirrors ops/glv_device.py for the 4-dimensional Galbraith-Lopez-Scott split
(refimpl/gls.py): k = k0 + k1*L + k2*L^2 + k3*L^3 (mod r), L = q mod r,
|ki| <~ 2^66 (LLL basis components are <= 64 bits, Babai rounding adds at
most half a basis vector per coordinate, the Barrett approximation at most
one more).

Babai round-off against the reduced basis B:

    c_j ~ round(k * adjB[0][j] / det B)      (j = 0..3)
    (k0..k3) = (k,0,0,0) - sum_j c_j * B[j]

computed entirely mod 2^80 in 16-bit digit rows (the true |ki| < 2^67 is
recovered from the two's-complement form). All arrays are transposed (D, N):
digits on sublanes, batch on lanes - see glv_device.decompose_device_t.

The reference has no G2 endomorphism path (per-point wNAF only,
/root/reference/pairing/src/wnaf.rs:49-71); results are identical points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..refimpl import gls as rgls
from .glv_device import (
    DIG,
    _apply_signed_t,
    _carry_t,
    _digits,
    _mul_digits_t,
    _ndigits,
    _twos_complement_abs_t,
)

# two's-complement width for k0..k3: 5 digits = 80 bits >> 2^67
KDIG = 5
# Barrett shift: T = 400 bits (k < 2^254, quotients < 2^191; error << 1/2)
TDIG = 25

GLS_WINDOWS = 17  # ceil(67+pad / 4) bits of |ki|

_DET = rgls._DET
_SD = 1 if _DET > 0 else -1


def _barrett(mag: int) -> int:
    num = mag << (DIG * TDIG)
    q, rem = divmod(num, abs(_DET))
    if 2 * rem >= abs(_DET):
        q += 1
    return q


# c_j = round(k * adj[j] / det): reciprocal magnitude + effective sign
_M = [_barrett(abs(a)) for a in rgls._ADJ_COL0]
_S = [(1 if a > 0 else -1) * _SD for a in rgls._ADJ_COL0]
_M_D = [_digits(m, _ndigits(m)) for m in _M]

# basis rows as digit arrays + signs
_B_D = [[_digits(abs(v), max(1, _ndigits(v))) for v in row] for row in rgls._BASIS]
_B_S = [[1 if v >= 0 else -1 for v in row] for row in rgls._BASIS]


def _components_t(k: jnp.ndarray):
    """Barrett Babai round-off -> four (|ki| digit rows, neg mask) pairs."""
    T_bits = DIG * TDIG
    # Barrett quotients mod 2^80 (low digits are exact regardless of the
    # truncated high digits - carries only propagate upward)
    cs = [
        _mul_digits_t(k, _M_D[j], KDIG + TDIG, round_bit=T_bits - 1)[TDIG:]
        for j in range(4)
    ]

    k_low = k[:KDIG] if k.shape[0] >= KDIG else _carry_t(k, KDIG)
    zero = jnp.zeros_like(k_low)
    out = []
    for t in range(4):
        acc = k_low if t == 0 else zero
        for j in range(4):
            bjt = rgls._BASIS[j][t]
            if bjt == 0:
                continue
            term = _mul_digits_t(cs[j], _B_D[j][t], KDIG)
            # subtract s_j * sign(B[j][t]) * term
            acc = _apply_signed_t(acc, term, _S[j] * _B_S[j][t])
        out.append(_twos_complement_abs_t(acc))
    return out


@jax.jit
def decompose_device_t(scalars_t: jnp.ndarray):
    """uint32[16, N] canonical transposed scalars -> (digits int32[4, 17, N]
    MSB-first 4-bit windows of |ki|, negs int32[4, N])."""
    comps = _components_t(scalars_t)
    mags = [m for m, _ in comps]
    negs = [n.astype(jnp.int32) for _, n in comps]

    def windows(mag):
        outs = []
        for w in range(GLS_WINDOWS):
            d, s = divmod(4 * w, DIG)
            outs.append(((mag[d : d + 1] >> s) & 0xF).astype(jnp.int32))
        return jnp.concatenate(outs[::-1], axis=0)

    digits = jnp.stack([windows(m) for m in mags], axis=0)  # (4, 17, N)
    return digits, jnp.concatenate(negs, axis=0)  # (4, N)


# signed base-32 digit count: device |ki| < 2^67 (Babai + Barrett slack);
# W digits in [-16, 15] represent any magnitude up to 15*(32^W - 1)/31
GLS_WINDOWS5 = 14
assert 15 * ((1 << (5 * GLS_WINDOWS5)) - 1) // 31 >= 1 << 67


@jax.jit
def decompose_signed_device_t(scalars_t: jnp.ndarray):
    """uint32[16, N] canonical transposed scalars -> digits int32[4, 14, N]
    signed base-32 MSB-first, component signs folded in (for the signed GLS
    quad ladder)."""
    from .glv_device import _signed_windows5_t

    comps = _components_t(scalars_t)
    return jnp.stack(
        [_signed_windows5_t(m, n, GLS_WINDOWS5) for m, n in comps], axis=0
    )


def gls_digit_arrays(scalars: list[int]):
    """Host-side decomposition (oracle/test path): canonical scalars ->
    (digits int32[4, 17, N], negs int32[4, N]) matching decompose_device_t
    up to Barrett rounding (both feed the same ladder; values agree)."""
    n = len(scalars)
    nbytes = (GLS_WINDOWS * 4 + 7) // 8  # 9 bytes
    raws = [bytearray(n * nbytes) for _ in range(4)]
    negs = np.zeros((4, n), dtype=np.int32)
    for i, s in enumerate(scalars):
        for t, kt in enumerate(rgls.decompose(s)):
            if kt < 0:
                negs[t, i] = 1
                kt = -kt
            raws[t][i * nbytes : (i + 1) * nbytes] = kt.to_bytes(nbytes, "little")

    def nibbles(raw):
        b = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(n, nbytes)
        lo = (b & 0xF).astype(np.int32)
        hi = (b >> 4).astype(np.int32)
        digs = np.empty((n, nbytes * 2), dtype=np.int32)
        digs[:, 0::2] = lo
        digs[:, 1::2] = hi
        return digs[:, :GLS_WINDOWS][:, ::-1].T.copy()

    return np.stack([nibbles(r) for r in raws], axis=0), negs


def gls_signed_digit_arrays(scalars: list[int]):
    """Host-side signed recode oracle: int32[4, GLS_WINDOWS5, N] signed
    base-32 digits MSB-first, component signs folded in."""
    n = len(scalars)
    out = np.zeros((4, GLS_WINDOWS5, n), dtype=np.int32)
    for i, s in enumerate(scalars):
        for t, kt in enumerate(rgls.decompose(s)):
            sign = -1 if kt < 0 else 1
            k = abs(kt)
            carry = 0
            digs = []
            for _ in range(GLS_WINDOWS5):
                v = (k & 0x1F) + carry
                k >>= 5
                carry = 1 if v >= 16 else 0
                digs.append(v - (carry << 5))
            assert k == 0 and carry == 0, "GLS_WINDOWS5 too small"
            out[t, :, i] = [sign * d for d in digs[::-1]]
    return out
