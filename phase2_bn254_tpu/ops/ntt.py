"""Radix-2 NTT over Fr, and over group elements, for evaluation domains.

TPU-native replacement for bellman's EvaluationDomain FFT
(/root/reference/bellman/src/domain.rs:30-376):

* scalar NTT: iterative Cooley-Tukey with a static bit-reversal gather and
  per-stage vectorized butterflies; twiddles are compile-time constants
  sliced from one root-of-unity power table.
* group NTT (used by prepare_phase2's Lagrange conversion,
  /root/reference/powersoftau/src/bin/prepare_phase2.rs:62-110): identical
  dataflow, but the twiddle multiply is a batched point scalar-mul and the
  butterfly +- are masked Jacobian adds.

Values are bit-exact with the reference since the DFT outputs are unique
field/group elements; the multi-chip variant (parallel/ntt) exchanges
coefficients with all-to-all collectives between local stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import group as G
from ..field import fp
from ..refimpl.field import FR_S, FR_GENERATOR, FR_ROOT_OF_UNITY, R_MOD

CTX_R = fp.FpContext(R_MOD, "fr")

MULT_GEN = FR_GENERATOR  # Fr::multiplicative_generator() = 7


@functools.lru_cache(maxsize=None)
class Domain:
    """Evaluation-domain constants for size m = 2^exp (domain.rs:52-99)."""

    def __init__(self, exp: int):
        assert 0 <= exp <= FR_S
        self.exp = exp
        self.m = 1 << exp
        self.omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - exp), R_MOD)
        self.omegainv = pow(self.omega, -1, R_MOD)
        self.minv = pow(self.m, -1, R_MOD)
        self.gen = MULT_GEN
        self.geninv = pow(MULT_GEN, -1, R_MOD)

    @functools.lru_cache(maxsize=None)
    def twiddles(self, inverse: bool) -> np.ndarray:
        """omega^j (Montgomery limbs) for j in [0, m/2). Small domains are
        pure host-int arithmetic (eager device log-doubling dispatched
        thousands of tiny unrolled-CIOS ops through the remote TPU tunnel -
        ~70 s per table); big domains keep ONE jitted rolled-glue device
        program (at 2^26 a host loop is ~10^8 Python iterations)."""
        g = self.omegainv if inverse else self.omega
        log2n = max(self.exp - 1, 0)
        if log2n <= 19:
            from .pallas_ntt import _host_mont_geom

            return np.ascontiguousarray(_host_mont_geom(g, 1 << log2n).T)
        with jax.ensure_compile_time_eval():
            # one dispatch: the jit wrapper + rolled mont glue keep both the
            # tunnel round-trips and the trace size O(log m)
            with fp.force_rolled():
                table = jax.jit(_power_table, static_argnums=(0, 1))(g, log2n)
        return np.asarray(table)

    @functools.lru_cache(maxsize=None)
    def twiddles_canonical(self, inverse: bool) -> np.ndarray:
        mont = self.twiddles(inverse)
        import jax.numpy as jnp

        return np.asarray(fp.from_mont(CTX_R, jnp.asarray(mont)))

    @functools.lru_cache(maxsize=None)
    def bitrev(self) -> np.ndarray:
        idx = np.arange(self.m, dtype=np.int32)
        rev = np.zeros_like(idx)
        for b in range(self.exp):
            rev |= ((idx >> b) & 1) << (self.exp - 1 - b)
        return rev


def ntt(exp: int, coeffs: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Scalar NTT: uint32[m,16] Montgomery Fr -> same, natural order DFT
    out[k] = sum_j a_j w^(jk) (matching bellman serial_fft semantics).

    Dispatches to the fused Pallas four-step kernels on TPU (VMEM-resident
    butterfly stages); the XLA per-stage path remains the portable/CPU path.
    Override with PHASE2_TPU_NTT=pallas|xla."""
    import os

    choice = os.environ.get("PHASE2_TPU_NTT", "auto")
    # cap 26: v5e-validated (2^24/2^26 on hardware, r3); larger domains
    # exceed single-chip HBM (2^27 needs ~26 GB of live buffers) - the S=28
    # ceiling is served by parallel/ntt.py over the mesh
    use_pallas = (
        choice == "pallas"
        or (choice == "auto" and jax.default_backend() != "cpu" and 10 <= exp <= 26)
    )
    if use_pallas:
        from .pallas_ntt import ntt_pallas

        return ntt_pallas(exp, coeffs, inverse)
    return _ntt_xla(exp, coeffs, inverse)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_xla(exp: int, coeffs: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    d = Domain(exp)
    m = d.m
    if m == 1:
        return coeffs
    W = jnp.asarray(d.twiddles(inverse))
    x = coeffs[jnp.asarray(d.bitrev())]
    for s in range(1, exp + 1):
        mlen = 1 << s
        half = mlen >> 1
        stride = m // mlen
        tw = W[::stride][:half]  # (half,16)
        x = x.reshape(m // mlen, mlen, fp.NLIMBS)
        even, odd = x[:, :half], x[:, half:]
        t = fp.mont_mul(CTX_R, odd, tw[None])
        x = jnp.concatenate([fp.add(CTX_R, even, t), fp.sub(CTX_R, even, t)], axis=1)
        x = x.reshape(m, fp.NLIMBS)
    if inverse:
        x = fp.mont_mul(CTX_R, x, jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(d.minv))))
    return x


@functools.partial(jax.jit, static_argnums=(0,))
def _group_stage(f, x: G.JacobianBatch, even_idx, odd_idx, tw_canon) -> G.JacobianBatch:
    """One NTT butterfly stage over group elements with runtime gather
    indices - constant geometry so a single program serves every stage of
    every domain of the same size."""
    even = jax.tree.map(lambda a: a[even_idx], x)
    odd = jax.tree.map(lambda a: a[odd_idx], x)
    t = _jac_scalar_mul(f, odd, tw_canon)
    lo = G.jac_add(f, even, t)
    hi = G.jac_add(f, even, G.jac_neg(f, t))

    def scatter(a, l, h):
        return a.at[even_idx].set(l).at[odd_idx].set(h)

    return jax.tree.map(scatter, x, lo, hi)


@functools.partial(jax.jit, static_argnums=(0,))
def _jac_const_mul(f, pts: G.JacobianBatch, scalar_canon) -> G.JacobianBatch:
    return _jac_scalar_mul(f, pts, jnp.broadcast_to(scalar_canon, (pts.z.shape[0], fp.NLIMBS)))


def group_ntt_staged(f, exp: int, pts: G.JacobianBatch, inverse: bool) -> G.JacobianBatch:
    """Group NTT built from per-stage jitted calls (one compile per size).

    Preferred for prepare_phase2, which runs every domain size 2^0..2^n.
    """
    d = Domain(exp)
    m = d.m
    if m == 1:
        return pts
    Wc = d.twiddles_canonical(inverse)
    x = jax.tree.map(lambda a: a[jnp.asarray(d.bitrev())], pts)
    idx = np.arange(m // 2, dtype=np.int32)
    for s in range(1, exp + 1):
        mlen = 1 << s
        half = mlen >> 1
        stride = m // mlen
        even_idx = (idx // half) * mlen + idx % half
        odd_idx = even_idx + half
        tw = np.tile(Wc[::stride][:half], (m // mlen, 1))
        x = _group_stage(f, x, jnp.asarray(even_idx), jnp.asarray(odd_idx), jnp.asarray(tw))
    if inverse:
        x = _jac_const_mul(f, x, jnp.asarray(fp.int_to_limbs(d.minv)))
    return x


@functools.partial(jax.jit, static_argnums=(0, 1, 3))
def group_ntt(f, exp: int, pts: G.JacobianBatch, inverse: bool) -> G.JacobianBatch:
    """Group-element NTT: butterfly twiddle = batched point scalar-mul.

    pts: JacobianBatch with leading axis m = 2^exp.
    """
    d = Domain(exp)
    m = d.m
    if m == 1:
        if inverse:
            return pts  # * 1^-1
        return pts
    Wc = jnp.asarray(d.twiddles_canonical(inverse))
    rev = jnp.asarray(d.bitrev())
    x = jax.tree.map(lambda a: a[rev], pts)
    for s in range(1, exp + 1):
        mlen = 1 << s
        half = mlen >> 1
        stride = m // mlen
        tw = Wc[::stride][:half]  # canonical digits (half,16)
        scalars = jnp.tile(tw, (m // mlen, 1))  # (m/2,16)

        def blk(a):
            return a.reshape(m // mlen, mlen, *a.shape[1:])

        xb = jax.tree.map(blk, x)
        even = jax.tree.map(lambda a: a[:, :half].reshape(m // 2, *a.shape[2:]), xb)
        odd = jax.tree.map(lambda a: a[:, half:].reshape(m // 2, *a.shape[2:]), xb)
        t = _jac_scalar_mul(f, odd, scalars)
        lo = G.jac_add(f, even, t)
        hi = G.jac_add(f, even, G.jac_neg(f, t))

        def unblk(l, h):
            ls = l.reshape(m // mlen, half, *l.shape[1:])
            hs = h.reshape(m // mlen, half, *h.shape[1:])
            return jnp.concatenate([ls, hs], axis=1).reshape(m, *l.shape[1:])

        x = jax.tree.map(unblk, lo, hi)
    if inverse:
        minv = jnp.broadcast_to(jnp.asarray(fp.int_to_limbs(d.minv)), (m, fp.NLIMBS))
        x = _jac_scalar_mul(f, x, minv)
    return x


def _jac_scalar_mul(f, pts: G.JacobianBatch, scalars_canon: jnp.ndarray) -> G.JacobianBatch:
    """batch scalar-mul over Jacobian inputs (the group-NTT butterfly).

    Same windowed ladder as batch_scalar_mul, but the table chain starts from
    a Jacobian base (no affine normalization between stages).
    """
    base = pts

    def chain(prev, _):
        nxt = G.jac_add(f, prev, base)
        return nxt, nxt

    _, rest = jax.lax.scan(chain, base, None, length=14)
    zero = G.jac_zero(f, pts.z.shape[: pts.z.ndim - (2 if f.components == 2 else 1)])
    table = jax.tree.map(
        lambda z, b, r: jnp.concatenate([z[None], b[None], r], axis=0), zero, base, rest
    )
    digits = G.scalar_windows(scalars_canon)
    digit_seq = jnp.moveaxis(digits, -1, 0)[::-1]

    def gather_entry(dg):
        def g(arr):
            idx = dg.reshape(dg.shape + (1,) * (arr.ndim - 1 - dg.ndim))
            return jnp.take_along_axis(arr, idx[None].astype(jnp.int32), axis=0)[0]

        return jax.tree.map(g, table)

    def body(acc, dg):
        for _ in range(4):
            acc = G.jac_double(f, acc)
        acc = G.jac_add(f, acc, gather_entry(dg))
        return acc, None

    batch_shape = pts.z.shape[: pts.z.ndim - (2 if f.components == 2 else 1)]
    acc0 = G.jac_zero(f, batch_shape)
    acc, _ = jax.lax.scan(body, acc0, digit_seq)
    return acc


# -- scalar-domain utility ops (pointwise; prover uses these) ---------------

def _power_table(g: int, log2n: int) -> jnp.ndarray:
    """[g^0 .. g^(2^log2n - 1)] Montgomery limbs uint32[2^log2n, 16], built
    on device by log-doubling."""
    from .pallas_ntt import _geom_powers_t

    ratio = jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(g)))
    return jnp.moveaxis(_geom_powers_t(ratio, log2n), 0, -1)


@functools.partial(jax.jit, static_argnums=(0, 2))
def distribute_powers(exp: int, coeffs: jnp.ndarray, g: int) -> jnp.ndarray:
    """coeffs[i] *= g^i (domain.rs:176-189); g is host-known."""
    with fp.force_rolled():  # keep the log-doubling trace O(exp), not O(exp*512)
        table = _power_table(g, exp)
    return fp.mont_mul(CTX_R, coeffs, table)


def coset_ntt(exp: int, coeffs: jnp.ndarray) -> jnp.ndarray:
    return ntt(exp, distribute_powers(exp, coeffs, MULT_GEN), False)


def icoset_ntt(exp: int, coeffs: jnp.ndarray) -> jnp.ndarray:
    d = Domain(exp)
    return distribute_powers(exp, ntt(exp, coeffs, True), d.geninv)


def divide_by_z_on_coset(exp: int, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Multiply by 1/(g^m - 1) (z is constant on the coset, domain.rs:217-230)."""
    d = Domain(exp)
    zinv = pow(pow(MULT_GEN, d.m, R_MOD) - 1, -1, R_MOD)
    c = jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(zinv)))
    return fp.mont_mul(CTX_R, coeffs, c)
