"""Vectorized prime-field arithmetic for the TPU compute path.

Design (TPU-first, not a port):

* A field element is 16 little-endian 16-bit limbs stored in a uint32 array of
  shape (..., 16). All ops vectorize over the leading batch dimensions on the
  VPU; 16-bit limbs keep every partial product (< 2^32) exact in uint32 lanes
  without needing a widening multiply.
* Internal form is Montgomery with R = 2^256, matching the reference's ff_ce
  4xu64 semantics (/root/reference/pairing/src/bn256/fq.rs:4-7) at the
  serialization boundary, so canonical bytes round-trip bit-exactly.
* Multiplication is CIOS with deferred carries: accumulator digits grow to
  ~2^22 inside the 16-round loop (far below 2^32 overflow) and are normalized
  once at the end.
* Compiler-friendliness: the CIOS rounds run under `lax.fori_loop` and all
  carry/borrow ripples under `lax.scan`, keeping traced program size ~40
  primitives per field op instead of ~400 unrolled. (A Pallas kernel will
  replace the XLA path for the hot ops; this module stays as the portable
  reference device path.)

The same context serves Fq and Fr (both 254-bit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NLIMBS = 16
LIMB_BITS = 16
LIMB_MASK = 0xFFFF
MONT_BITS = NLIMBS * LIMB_BITS  # 256

U32 = jnp.uint32

import os as _os

_UNROLL_ENV = _os.environ.get("PHASE2_TPU_UNROLL", "auto")

_FORCE_ROLLED = False


import contextlib as _contextlib


@_contextlib.contextmanager
def force_rolled():
    """Trace the enclosed jit calls with rolled limb loops regardless of
    backend - for programs whose traced op count would otherwise overwhelm
    the (remote) TPU compiler (Pippenger MSM, group NTT stages)."""
    global _FORCE_ROLLED
    old = _FORCE_ROLLED
    _FORCE_ROLLED = True
    try:
        yield
    finally:
        _FORCE_ROLLED = old


def _unrolled() -> bool:
    """Whether to fully unroll limb loops at trace time.

    Unrolled bodies fuse into far fewer launches (critical on TPU, where each
    tiny rolled-loop step is a dispatch); rolled loops keep traced programs
    small (fast compiles - the CPU test default). The multi-thousand-op
    ladders live in Pallas kernels, so the remaining XLA glue stays small
    enough to compile unrolled. Override with PHASE2_TPU_UNROLL=0/1.
    """
    if _FORCE_ROLLED:
        return False
    if _UNROLL_ENV in ("0", "false"):
        return False
    if _UNROLL_ENV in ("1", "true"):
        return True
    return jax.default_backend() != "cpu"


def int_to_limbs(v: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """Python int -> uint32[nlimbs] little-endian 16-bit limbs (host)."""
    return np.array([(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(nlimbs)], dtype=np.uint32)


def limbs_to_int(a) -> int:
    """uint32[..., nlimbs] (single element) -> Python int (host)."""
    a = np.asarray(a).reshape(-1)
    v = 0
    for i in range(a.shape[0]):
        v |= int(a[i]) << (LIMB_BITS * i)
    return v


def ints_to_limbs_batch(vals, nlimbs: int = NLIMBS) -> np.ndarray:
    """Iterable of ints -> uint32[len, nlimbs] via one bytes round-trip.

    ~50x faster than per-element int_to_limbs for large batches (the
    Groth16 prover converts millions of coefficients per proof)."""
    nbytes = nlimbs * 2
    buf = b"".join(v.to_bytes(nbytes, "little") for v in vals)
    out = np.frombuffer(buf, dtype="<u2").reshape(-1, nlimbs)
    return out.astype(np.uint32)


def limbs_to_ints_batch(arr) -> list[int]:
    """uint32[n, nlimbs] canonical limbs -> list of n Python ints."""
    a = np.ascontiguousarray(np.asarray(arr)).astype("<u2")
    nbytes = a.shape[-1] * 2
    buf = a.tobytes()
    return [
        int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(a.shape[0])
    ]


class FpContext:
    """Per-modulus constants + vectorized ops. Hashable/static for jit."""

    def __init__(self, p: int, name: str, nlimbs: int = NLIMBS):
        assert p % 2 == 1 and p.bit_length() <= LIMB_BITS * nlimbs - 2
        self.p = p
        self.name = name
        self.nlimbs = nlimbs
        self.mont_bits = LIMB_BITS * nlimbs
        self.r = (1 << self.mont_bits) % p
        self.r2 = pow(1 << self.mont_bits, 2, p)
        self.rinv = pow(1 << self.mont_bits, -1, p)
        # -p^-1 mod 2^16 (CIOS per-digit Montgomery factor)
        self.pprime = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.p_limbs = int_to_limbs(p, nlimbs)
        self.one_mont = int_to_limbs(self.r, nlimbs)  # 1 in Montgomery form
        self.r2_limbs = int_to_limbs(self.r2, nlimbs)

    def __hash__(self):
        return hash((self.p, self.name, self.nlimbs))

    def __eq__(self, other):
        return (
            isinstance(other, FpContext)
            and other.p == self.p
            and other.nlimbs == self.nlimbs
        )

    # -- host conversions --------------------------------------------------
    def to_mont_int(self, v: int) -> int:
        return (v * self.r) % self.p

    def from_mont_int(self, v: int) -> int:
        return (v * self.rinv) % self.p

    # -- element constructors ----------------------------------------------
    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros((*batch_shape, self.nlimbs), dtype=U32)

    def ones_mont(self, batch_shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.asarray(self.one_mont), (*batch_shape, self.nlimbs)
        ).astype(U32)

    def const(self, v: int, batch_shape=()) -> jnp.ndarray:
        """Constant in Montgomery form, broadcast over batch dims."""
        limbs = jnp.asarray(int_to_limbs(self.to_mont_int(v), self.nlimbs))
        return jnp.broadcast_to(limbs, (*batch_shape, self.nlimbs)).astype(U32)


# ---------------------------------------------------------------------------
# carry / borrow ripples as scans over the limb axis
# ---------------------------------------------------------------------------

def _carry_canonicalize(t: jnp.ndarray) -> jnp.ndarray:
    """uint32 accumulator digits -> canonical 16-bit digits (value < 2^256)."""
    if _unrolled():
        digits = []
        c = jnp.zeros(t.shape[:-1], dtype=U32)
        for j in range(t.shape[-1]):
            v = t[..., j] + c
            digits.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        return jnp.stack(digits, axis=-1)
    tt = jnp.moveaxis(t, -1, 0)  # (16, ...)

    def step(c, d):
        v = d + c
        return v >> LIMB_BITS, v & LIMB_MASK

    _, digits = jax.lax.scan(step, jnp.zeros(tt.shape[1:], dtype=U32), tt)
    return jnp.moveaxis(digits, 0, -1)


def _sub_limbs(a: jnp.ndarray, b_limbs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) over canonical digits; returns (diff_digits, final_borrow)."""
    aa = jnp.moveaxis(a, -1, 0).astype(jnp.int32)
    bb = jnp.moveaxis(jnp.broadcast_to(b_limbs, a.shape), -1, 0).astype(jnp.int32)
    if _unrolled():
        borrow = jnp.zeros(aa.shape[1:], dtype=jnp.int32)
        digits = []
        for j in range(aa.shape[0]):
            d = aa[j] - bb[j] - borrow
            borrow = (d < 0).astype(jnp.int32)
            digits.append((d + (borrow << LIMB_BITS)).astype(U32))
        return jnp.stack(digits, axis=-1), borrow

    def step(borrow, ab):
        ai, bi = ab
        d = ai - bi - borrow
        borrow = (d < 0).astype(jnp.int32)
        return borrow, (d + (borrow << LIMB_BITS)).astype(U32)

    borrow, digits = jax.lax.scan(step, jnp.zeros(aa.shape[1:], dtype=jnp.int32), (aa, bb))
    return jnp.moveaxis(digits, 0, -1), borrow


def _add_limbs(a: jnp.ndarray, b_limbs: jnp.ndarray) -> jnp.ndarray:
    """(a + b) canonical digits (mod 2^256; final carry dropped by caller's
    invariants)."""
    aa = jnp.moveaxis(a, -1, 0)
    bb = jnp.moveaxis(jnp.broadcast_to(b_limbs, a.shape), -1, 0)
    if _unrolled():
        carry = jnp.zeros(aa.shape[1:], dtype=U32)
        digits = []
        for j in range(aa.shape[0]):
            v = aa[j] + bb[j] + carry
            digits.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(digits, axis=-1)

    def step(carry, ab):
        ai, bi = ab
        v = ai + bi + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    _, digits = jax.lax.scan(step, jnp.zeros(aa.shape[1:], dtype=U32), (aa, bb))
    return jnp.moveaxis(digits, 0, -1)


def _sub_p_if_ge(ctx: FpContext, a: jnp.ndarray) -> jnp.ndarray:
    """a - p if a >= p else a (canonical digits, value < 2p)."""
    diff, borrow = _sub_limbs(a, jnp.asarray(ctx.p_limbs))
    return jnp.where((borrow == 0)[..., None], diff, a)


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS, deferred carries, rolled loop)
# ---------------------------------------------------------------------------

def mont_mul(ctx: FpContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p for reduced Montgomery-form inputs."""
    nl = ctx.nlimbs
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*shape, nl))
    b = jnp.broadcast_to(b, (*shape, nl))
    p = jnp.asarray(ctx.p_limbs)
    pprime = jnp.uint32(ctx.pprime)
    zero_tail = jnp.zeros((*shape, 1), dtype=U32)

    def round_(i, t):
        ai = jax.lax.dynamic_index_in_dim(a, i, axis=a.ndim - 1, keepdims=True)
        prod = ai * b  # exact in uint32
        t = t.at[..., 0:nl].add(prod & LIMB_MASK)
        t = t.at[..., 1 : nl + 1].add(prod >> LIMB_BITS)
        m = ((t[..., 0] * pprime) & LIMB_MASK)[..., None]
        qprod = m * p
        t = t.at[..., 0:nl].add(qprod & LIMB_MASK)
        t = t.at[..., 1 : nl + 1].add(qprod >> LIMB_BITS)
        carry = t[..., 0] >> LIMB_BITS
        t = jnp.concatenate([t[..., 1:], zero_tail], axis=-1)
        return t.at[..., 0].add(carry)

    t0 = jnp.zeros((*shape, nl + 1), dtype=U32)
    if _unrolled():
        t = t0
        for i in range(nl):
            t = round_(i, t)
    else:
        t = jax.lax.fori_loop(0, nl, round_, t0, unroll=4)
    # result value < 2p: top accumulator digit is consumed by the carry
    # ripple across the low digits
    res = _carry_canonicalize(t[..., :nl])
    return _sub_p_if_ge(ctx, res)


def mont_sqr(ctx: FpContext, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


def add(ctx: FpContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _sub_p_if_ge(ctx, _add_limbs(a, b))


def sub(ctx: FpContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    diff, borrow = _sub_limbs(a, b)
    wrapped = _add_limbs(diff, jnp.asarray(ctx.p_limbs))
    return jnp.where((borrow != 0)[..., None], wrapped, diff)


def neg(ctx: FpContext, a: jnp.ndarray) -> jnp.ndarray:
    return sub(ctx, ctx.zeros(a.shape[:-1]), a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def gt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a > b on canonical digit arrays."""
    _, borrow = _sub_limbs(jnp.broadcast_to(b, jnp.broadcast_shapes(a.shape, b.shape)), a)
    return borrow != 0


def to_mont(ctx: FpContext, a: jnp.ndarray) -> jnp.ndarray:
    """Canonical digits -> Montgomery form (multiply by R^2)."""
    return mont_mul(ctx, a, jnp.asarray(ctx.r2_limbs))


def from_mont(ctx: FpContext, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical digits (multiply by 1)."""
    one = jnp.zeros(ctx.nlimbs, dtype=U32).at[0].set(1)
    return mont_mul(ctx, a, one)


def pow_fixed(ctx: FpContext, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-known exponent (square-and-multiply under fori_loop).

    Montgomery in, Montgomery out.
    """
    nbits = max(e.bit_length(), 1)
    ebits = jnp.asarray(np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32))
    res0 = ctx.ones_mont(a.shape[:-1])

    def body(i, carry):
        res, base = carry
        bit = ebits[i]
        res_mul = mont_mul(ctx, res, base)
        res = jnp.where((bit == 1)[..., None], res_mul, res)
        base = mont_sqr(ctx, base)
        return res, base

    res, _ = jax.lax.fori_loop(0, nbits, body, (res0, a))
    return res


def inv(ctx: FpContext, a: jnp.ndarray) -> jnp.ndarray:
    """Batched field inverse via Fermat (a^(p-2)); zero maps to zero."""
    return pow_fixed(ctx, a, ctx.p - 2)


def batch_inv(ctx: FpContext, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-trick batch inverse over the leading axis.

    Two log-depth associative prefix scans + ONE Fermat inversion - the TPU
    replacement for the reference's sequential Montgomery trick
    (/root/reference/pairing/src/bn256/ec.rs:251-299). Zeros map to zero and
    are excluded from the running product.
    """
    zero_mask = is_zero(a)[..., None]
    one = ctx.ones_mont(a.shape[:-1])
    safe = jnp.where(zero_mask, one, a)

    def mul(x, y):
        return mont_mul(ctx, x, y)

    prefix_inc = jax.lax.associative_scan(mul, safe, axis=0)
    total = prefix_inc[-1]
    suffix_inc = jax.lax.associative_scan(mul, safe[::-1], axis=0)[::-1]
    n = a.shape[0]
    pre = jnp.concatenate([one[:1], prefix_inc[: n - 1]], axis=0)
    suf = jnp.concatenate([suffix_inc[1:], one[:1]], axis=0)
    tinv = inv(ctx, total)
    out = mul(mul(pre, suf), jnp.broadcast_to(tinv, a.shape))
    return jnp.where(zero_mask, jnp.zeros_like(a), out)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b with mask over batch dims."""
    return jnp.where(mask[..., None], a, b)
