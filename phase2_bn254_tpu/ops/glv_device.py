"""Device-side GLV scalar decomposition (Barrett-rounded lattice reduction).

Host decomposition (refimpl/glv.py) costs microseconds of Python per scalar -
it dominates the fused-kernel runtime. This module computes

    c1 ~ round(k*b2/det), c2 ~ round(-k*b1/det)
    k1 = k - c1*a1 - c2*a2,   k2 = -c1*b1 - c2*b2

entirely on-device with 16-bit-digit integer arithmetic. The Barrett
reciprocals may round c1/c2 off by one vs the exact quotient; the identity
k1 + k2*LAMBDA = k (mod r) holds for ANY c1/c2, and an off-by-one only grows
|ki| by one basis component (still < 2^131), so correctness is unaffected.

Outputs: 4-bit windows of |k1|, |k2| (MSB-first) + sign masks, feeding
pallas_exp.pallas_batch_exp_glv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp
from ..refimpl import glv as rglv
from ..refimpl.field import R_MOD

DIG = 16  # bits per digit
MASK = 0xFFFF

# truncated two's-complement width for k1/k2 (digits): 192 bits >> 2^131
KDIG = 12
# Barrett shift (digits): T = 400 bits
TDIG = 25

_A1, _B1 = rglv._A1, rglv._B1
_A2, _B2 = rglv._A2, rglv._B2
_DET = rglv._DET
_SD = 1 if _DET > 0 else -1


def _digits(v: int, n: int) -> np.ndarray:
    assert v >= 0
    return np.array([(v >> (DIG * i)) & MASK for i in range(n)], dtype=np.uint32)


def _ndigits(v: int) -> int:
    return max(1, (abs(v).bit_length() + DIG - 1) // DIG)


# Barrett reciprocals: Mi = round(|bi'| * 2^(16*TDIG) / modulus)
def _barrett(mag: int, modulus: int = R_MOD) -> int:
    num = mag << (DIG * TDIG)
    q, rem = divmod(num, modulus)
    if 2 * rem >= modulus:
        q += 1
    return q


_M1 = _barrett(abs(_B2))  # for c1 = round(k*b2/det)
_M2 = _barrett(abs(_B1))  # for c2 = round(-k*b1/det)
_S1 = (1 if _B2 > 0 else -1) * _SD
_S2 = -(1 if _B1 > 0 else -1) * _SD

_M1_D = _digits(_M1, _ndigits(_M1))
_M2_D = _digits(_M2, _ndigits(_M2))

_A1_D = _digits(abs(_A1), _ndigits(_A1))
_A2_D = _digits(abs(_A2), _ndigits(_A2))
_B1_D = _digits(abs(_B1), _ndigits(_B1))
_B2_D = _digits(abs(_B2), _ndigits(_B2))
_SA1 = 1 if _A1 > 0 else -1
_SA2 = 1 if _A2 > 0 else -1
_SB1 = 1 if _B1 > 0 else -1
_SB2 = 1 if _B2 > 0 else -1


def _carry(t: jnp.ndarray, out_digits: int) -> jnp.ndarray:
    """Normalize uint32 accumulator digits to 16-bit digits (truncate/extend
    to out_digits)."""
    n = t.shape[-1]
    digits = []
    c = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    for j in range(min(n, out_digits)):
        v = t[..., j] + c
        digits.append(v & MASK)
        c = v >> DIG
    for _ in range(n, out_digits):
        digits.append(c & MASK)
        c = c >> DIG
    return jnp.stack(digits, axis=-1)


def _mul_digits(k: jnp.ndarray, const_d: np.ndarray, out_digits: int, round_bit: int | None = None) -> jnp.ndarray:
    """k (..., nk digits) * constant -> (..., out_digits) digits (truncated).

    Accumulates per constant digit with deferred carries; values stay far
    below 2^32 (nk + nc <= ~34 terms of < 2^17 each). Optionally adds
    2^round_bit before the final carry pass (Barrett rounding)."""
    nk = k.shape[-1]
    nc = const_d.shape[0]
    width = min(nk + nc + 1, out_digits + 1)
    t = jnp.zeros((*k.shape[:-1], width), dtype=jnp.uint32)
    for j in range(nc):
        cj = int(const_d[j])
        if cj == 0:
            continue
        prod = k * jnp.uint32(cj)  # (..., nk) exact < 2^32
        lo = prod & MASK
        hi = prod >> DIG
        lo_end = min(j + nk, width)
        if lo_end > j:
            t = t.at[..., j:lo_end].add(lo[..., : lo_end - j])
        hi_start = j + 1
        hi_end = min(j + 1 + nk, width)
        if hi_end > hi_start:
            t = t.at[..., hi_start:hi_end].add(hi[..., : hi_end - hi_start])
    if round_bit is not None:
        d, b = divmod(round_bit, DIG)
        if d < width:
            t = t.at[..., d].add(jnp.uint32(1 << b))
    return _carry(t, out_digits)


def _sub_digits(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod 2^(16*D), canonical digits."""
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.int32)
    digits = []
    for j in range(a.shape[-1]):
        d = ai[..., j] - bi[..., j] - borrow
        borrow = (d < 0).astype(jnp.int32)
        digits.append((d + (borrow << DIG)).astype(jnp.uint32))
    return jnp.stack(digits, axis=-1)


def _add_digits(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod 2^(16*D)."""
    carry = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    digits = []
    for j in range(a.shape[-1]):
        v = a[..., j] + b[..., j] + carry
        digits.append(v & MASK)
        carry = v >> DIG
    return jnp.stack(digits, axis=-1)


def _twos_complement_abs(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two's-complement (..., KDIG) -> (|v| digits, negative mask)."""
    neg = (v[..., -1] >> (DIG - 1)) != 0
    inv = (~v) & MASK
    one = jnp.zeros_like(v).at[..., 0].set(1)
    negated = _add_digits(inv, one)
    mag = jnp.where(neg[..., None], negated, v)
    return mag, neg


def _apply_signed(acc: jnp.ndarray, term: jnp.ndarray, sign: int) -> jnp.ndarray:
    return _sub_digits(acc, term) if sign > 0 else _add_digits(acc, term)


@jax.jit
def decompose_device(scalars_canon: jnp.ndarray):
    """uint32[N,16] canonical scalars -> (d1_msb int32[33,N], d2_msb,
    negs int32[2,N]) for the GLV pallas ladder.

    Row-major digit layout (digits on the LAST axis): kept for the toy-size
    paths; the production pipeline uses decompose_device_t below (digits on
    sublanes, batch on lanes - full lane utilization on TPU)."""
    k = scalars_canon
    T_bits = DIG * TDIG
    c1 = _mul_digits(k, _M1_D, KDIG + TDIG, round_bit=T_bits - 1)[..., TDIG:]
    c2 = _mul_digits(k, _M2_D, KDIG + TDIG, round_bit=T_bits - 1)[..., TDIG:]
    # c1/c2 magnitudes (KDIG digits); signed via static _S1/_S2

    # k1 = k - s1*c1*a1 - s2*c2*a2  (two's complement, KDIG digits)
    k_low = k[..., :KDIG] if k.shape[-1] >= KDIG else _carry(k, KDIG)
    t1 = _mul_digits(c1, _A1_D, KDIG)
    t2 = _mul_digits(c2, _A2_D, KDIG)
    k1 = _apply_signed(k_low, t1, _S1 * _SA1)
    k1 = _apply_signed(k1, t2, _S2 * _SA2)
    # k2 = -s1*c1*b1 - s2*c2*b2
    u1 = _mul_digits(c1, _B1_D, KDIG)
    u2 = _mul_digits(c2, _B2_D, KDIG)
    zero = jnp.zeros_like(k_low)
    k2 = _apply_signed(zero, u1, _S1 * _SB1)
    k2 = _apply_signed(k2, u2, _S2 * _SB2)

    k1_mag, k1_neg = _twos_complement_abs(k1)
    k2_mag, k2_neg = _twos_complement_abs(k2)

    def windows(mag):
        # (N, KDIG) 16-bit digits -> 33 nibbles MSB-first, transposed
        outs = []
        for w in range(33):
            d, s = divmod(4 * w, DIG)
            outs.append(((mag[..., d] >> s) & 0xF).astype(jnp.int32))
        return jnp.stack(outs[::-1], axis=0)

    negs = jnp.stack(
        [k1_neg.astype(jnp.int32), k2_neg.astype(jnp.int32)], axis=0
    )
    return windows(k1_mag), windows(k2_mag), negs


# ---------------------------------------------------------------------------
# transposed-layout implementation (digits on axis 0, batch on lanes)
# ---------------------------------------------------------------------------
#
# Same Barrett math as decompose_device, but every array is (D, N): digit
# rows live on sublanes and the batch fills the 128-wide lane dimension, so
# every op runs at full VPU occupancy and carry chains are (1, N) row ops
# (the row-major layout above leaves 7/8 of each vector idle and lowers
# accumulation through scatter-adds).


def _shift_rows(x: jnp.ndarray, off: int, width: int) -> jnp.ndarray:
    """Place x's rows at offset `off` inside a (width, N) zero block."""
    n = min(x.shape[0], width - off)
    pads = []
    if off:
        pads.append(jnp.zeros((off, x.shape[1]), jnp.uint32))
    pads.append(x[:n])
    tail = width - off - n
    if tail:
        pads.append(jnp.zeros((tail, x.shape[1]), jnp.uint32))
    return jnp.concatenate(pads, axis=0) if len(pads) > 1 else pads[0]


def _carry_t(t: jnp.ndarray, out_digits: int) -> jnp.ndarray:
    """Normalize u32 accumulator rows to 16-bit digit rows (truncate/extend)."""
    rows = []
    c = jnp.zeros((1, t.shape[1]), jnp.uint32)
    n = t.shape[0]
    for j in range(min(n, out_digits)):
        v = t[j : j + 1] + c
        rows.append(v & MASK)
        c = v >> DIG
    for _ in range(n, out_digits):
        rows.append(c & MASK)
        c = c >> DIG
    return jnp.concatenate(rows, axis=0)


def _mul_digits_t(k: jnp.ndarray, const_d: np.ndarray, out_digits: int, round_bit: int | None = None) -> jnp.ndarray:
    """k (nk, N) digit rows x small constant -> (out_digits, N), truncated.

    Deferred carries: each accumulator row collects <= 2*nc terms of < 2^16,
    far below 2^32."""
    nk, n = k.shape
    nc = const_d.shape[0]
    width = min(nk + nc + 1, out_digits + 1)
    t = jnp.zeros((width, n), jnp.uint32)
    for j in range(nc):
        cj = int(const_d[j])
        if cj == 0:
            continue
        prod = k * jnp.uint32(cj)
        t = t + _shift_rows(prod & MASK, j, width)
        if j + 1 < width:
            t = t + _shift_rows(prod >> DIG, j + 1, width)
    if round_bit is not None:
        d, b = divmod(round_bit, DIG)
        if d < width:
            bump = jnp.full((1, n), 1 << b, jnp.uint32)
            t = t + _shift_rows(bump, d, width)
    return _carry_t(t, out_digits)


def _sub_digits_t(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)
    borrow = jnp.zeros((1, a.shape[1]), jnp.int32)
    rows = []
    for j in range(a.shape[0]):
        d = ai[j : j + 1] - bi[j : j + 1] - borrow
        borrow = (d < 0).astype(jnp.int32)
        rows.append((d + (borrow << DIG)).astype(jnp.uint32))
    return jnp.concatenate(rows, axis=0)


def _add_digits_t(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    carry = jnp.zeros((1, a.shape[1]), jnp.uint32)
    rows = []
    for j in range(a.shape[0]):
        v = a[j : j + 1] + b[j : j + 1] + carry
        rows.append(v & MASK)
        carry = v >> DIG
    return jnp.concatenate(rows, axis=0)


def _twos_complement_abs_t(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    neg = (v[-1:] >> (DIG - 1)) != 0  # (1, N)
    inv = (~v) & MASK
    one = jnp.concatenate(
        [jnp.ones((1, v.shape[1]), jnp.uint32), jnp.zeros((v.shape[0] - 1, v.shape[1]), jnp.uint32)],
        axis=0,
    )
    negated = _add_digits_t(inv, one)
    mag = jnp.where(neg, negated, v)
    return mag, neg


def _apply_signed_t(acc: jnp.ndarray, term: jnp.ndarray, sign: int) -> jnp.ndarray:
    return _sub_digits_t(acc, term) if sign > 0 else _add_digits_t(acc, term)


class GlvPlan:
    """Per-curve Barrett decomposition constants for the transposed device
    path; built once from (r, short basis). Hashable/static for jit."""

    def __init__(self, r_mod: int, a1: int, b1: int, a2: int, b2: int,
                 windows: int = 33):
        det = a1 * b2 - a2 * b1
        assert abs(det) == r_mod
        sd = 1 if det > 0 else -1
        self.key = (r_mod, a1, b1, a2, b2, windows)
        self.windows = windows
        # signed base-32 digit count: |k_i| <= (|a1|+|a2|)/2 exactly rounded,
        # plus <= 1 unit of Barrett rounding slack per c_i (so + |a1|+|a2|);
        # W signed digits in [-16, 15] represent any non-negative v up to
        # 15*(32^W - 1)/31
        bound = 3 * max(abs(a1) + abs(a2), abs(b1) + abs(b2)) // 2 + 2
        w = 1
        while 15 * ((1 << (5 * w)) - 1) // 31 < bound:
            w += 1
        self.windows5 = w
        m1 = _barrett(abs(b2), r_mod)
        m2 = _barrett(abs(b1), r_mod)
        self.m1_d = _digits(m1, _ndigits(m1))
        self.m2_d = _digits(m2, _ndigits(m2))
        self.s1 = (1 if b2 > 0 else -1) * sd
        self.s2 = -(1 if b1 > 0 else -1) * sd
        self.a1_d = _digits(abs(a1), _ndigits(a1))
        self.a2_d = _digits(abs(a2), _ndigits(a2))
        self.b1_d = _digits(abs(b1), _ndigits(b1))
        self.b2_d = _digits(abs(b2), _ndigits(b2))
        self.sa1 = 1 if a1 > 0 else -1
        self.sa2 = 1 if a2 > 0 else -1
        self.sb1 = 1 if b1 > 0 else -1
        self.sb2 = 1 if b2 > 0 else -1

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return isinstance(other, GlvPlan) and other.key == self.key


BN_PLAN = GlvPlan(R_MOD, _A1, _B1, _A2, _B2)


@functools.partial(jax.jit, static_argnums=(1,))
def decompose_plan_t(scalars_t: jnp.ndarray, plan: GlvPlan = BN_PLAN):
    """uint32[nlimbs, N] canonical transposed scalars -> (d1_msb
    int32[W,N], d2_msb int32[W,N], negs int32[2,N]) - the production
    layout; `plan` selects the curve (BN254 default, BLS12-381 via
    bls12_381.device)."""
    k = scalars_t
    T_bits = DIG * TDIG
    c1 = _mul_digits_t(k, plan.m1_d, KDIG + TDIG, round_bit=T_bits - 1)[TDIG:]
    c2 = _mul_digits_t(k, plan.m2_d, KDIG + TDIG, round_bit=T_bits - 1)[TDIG:]

    k_low = k[:KDIG] if k.shape[0] >= KDIG else _carry_t(k, KDIG)
    t1 = _mul_digits_t(c1, plan.a1_d, KDIG)
    t2 = _mul_digits_t(c2, plan.a2_d, KDIG)
    k1 = _apply_signed_t(k_low, t1, plan.s1 * plan.sa1)
    k1 = _apply_signed_t(k1, t2, plan.s2 * plan.sa2)
    u1 = _mul_digits_t(c1, plan.b1_d, KDIG)
    u2 = _mul_digits_t(c2, plan.b2_d, KDIG)
    zero = jnp.zeros_like(k_low)
    k2 = _apply_signed_t(zero, u1, plan.s1 * plan.sb1)
    k2 = _apply_signed_t(k2, u2, plan.s2 * plan.sb2)

    k1_mag, k1_neg = _twos_complement_abs_t(k1)
    k2_mag, k2_neg = _twos_complement_abs_t(k2)

    def windows(mag):
        outs = []
        for w in range(plan.windows):
            d, s = divmod(4 * w, DIG)
            outs.append(((mag[d : d + 1] >> s) & 0xF).astype(jnp.int32))
        return jnp.concatenate(outs[::-1], axis=0)

    negs = jnp.concatenate(
        [k1_neg.astype(jnp.int32), k2_neg.astype(jnp.int32)], axis=0
    )
    return windows(k1_mag), windows(k2_mag), negs


def decompose_device_t(scalars_t: jnp.ndarray):
    """BN254 production entry point (see decompose_plan_t)."""
    return decompose_plan_t(scalars_t, BN_PLAN)


# ---------------------------------------------------------------------------
# signed base-32 digits (5-bit windows, lane sign folded into the digits)
# ---------------------------------------------------------------------------


def _signed_windows5_t(mag: jnp.ndarray, neg: jnp.ndarray, nwin: int) -> jnp.ndarray:
    """(KDIG, N) 16-bit magnitude rows + (1, N) sign -> int32[nwin, N] signed
    base-32 digits in [-16, 15], MSB-first, with the lane sign folded in
    (digits of -v are the negated digits of v, each still within [-16, 16])."""
    # unsigned 5-bit windows, LSB-first
    vals = []
    for w in range(nwin):
        d, s = divmod(5 * w, DIG)
        v = mag[d : d + 1] >> s
        if s > DIG - 5 and d + 1 < mag.shape[0]:
            v = v | (mag[d + 1 : d + 2] << (DIG - s))
        vals.append((v & 0x1F).astype(jnp.int32))
    # signed recode: digit >= 16 borrows from the next window
    carry = jnp.zeros_like(vals[0])
    rows = []
    for v in vals:
        t = v + carry
        carry = (t >= 16).astype(jnp.int32)
        rows.append(t - (carry << 5))
    # the windows5 sizing guarantees the final carry is zero (see GlvPlan)
    signed = [jnp.where(neg, -r, r) for r in rows]
    return jnp.concatenate(signed[::-1], axis=0)


@functools.partial(jax.jit, static_argnums=(1,))
def decompose_signed_plan_t(scalars_t: jnp.ndarray, plan: GlvPlan = BN_PLAN):
    """uint32[nlimbs, N] canonical transposed scalars -> (d1 int32[W,N],
    d2 int32[W,N]) signed base-32 digits MSB-first for the signed GLV
    ladder (pallas_exp.pallas_batch_exp_glv_signed); no separate sign
    masks - the per-lane k_i sign is folded into the digits."""
    k = scalars_t
    T_bits = DIG * TDIG
    c1 = _mul_digits_t(k, plan.m1_d, KDIG + TDIG, round_bit=T_bits - 1)[TDIG:]
    c2 = _mul_digits_t(k, plan.m2_d, KDIG + TDIG, round_bit=T_bits - 1)[TDIG:]

    k_low = k[:KDIG] if k.shape[0] >= KDIG else _carry_t(k, KDIG)
    t1 = _mul_digits_t(c1, plan.a1_d, KDIG)
    t2 = _mul_digits_t(c2, plan.a2_d, KDIG)
    k1 = _apply_signed_t(k_low, t1, plan.s1 * plan.sa1)
    k1 = _apply_signed_t(k1, t2, plan.s2 * plan.sa2)
    u1 = _mul_digits_t(c1, plan.b1_d, KDIG)
    u2 = _mul_digits_t(c2, plan.b2_d, KDIG)
    zero = jnp.zeros_like(k_low)
    k2 = _apply_signed_t(zero, u1, plan.s1 * plan.sb1)
    k2 = _apply_signed_t(k2, u2, plan.s2 * plan.sb2)

    k1_mag, k1_neg = _twos_complement_abs_t(k1)
    k2_mag, k2_neg = _twos_complement_abs_t(k2)
    return (
        _signed_windows5_t(k1_mag, k1_neg, plan.windows5),
        _signed_windows5_t(k2_mag, k2_neg, plan.windows5),
    )


def decompose_signed_device_t(scalars_t: jnp.ndarray):
    """BN254 signed-digit production entry point."""
    return decompose_signed_plan_t(scalars_t, BN_PLAN)
