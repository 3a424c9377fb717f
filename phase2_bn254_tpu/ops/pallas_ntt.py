"""Pallas TPU kernel: radix-2 Fr NTT via the four-step decomposition.

TPU-native replacement for the XLA butterfly path in ops/ntt.py (the analog
of bellman's serial_fft/parallel_fft,
/root/reference/bellman/src/domain.rs:274-376), designed so every butterfly
stage runs on VMEM-resident tiles:

* N = R*C is viewed as a matrix; out[k2 + C*k1] =
  DFT_R over j1 [ w^(j1*k2) * DFT_C over j2 [ a[j1 + R*j2] ] ]
  - two column-DFT passes + one fused inter-step twiddle + XLA transposes.
* Each pass is ONE pallas_call: the DFT axis lives on the 128-wide lane
  dimension, butterflies pair lanes with `pltpu.roll` + masked selects, and
  the whole log2-stage cascade runs per tile without touching HBM.
* Twiddle factors for every stage enter as one (S, 16, C) lane-table; the
  inter-step twiddle w^(j1*k2) is applied incrementally row-by-row (one
  (16,1,C) mont_mul per sublane row), so no O(N) host table is ever built
  (the per-lane bases and per-tile start factors are computed on device by
  log-doubling).

Field elements are 16x16-bit limbs on the sublane axis (TOps layout from
ops/pallas_exp.py, instantiated with the Fr modulus). Results are bit-exact
with ops.ntt.ntt (DFT outputs are unique field elements).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fp
from ..refimpl.field import R_MOD
from .pallas_exp import TOps

NLIMBS = fp.NLIMBS
U32 = jnp.uint32

CTX_R = fp.FpContext(R_MOD, "fr")
_FR_P_LIMBS = fp.int_to_limbs(R_MOD)
_FR_PPRIME = (-pow(R_MOD, -1, 1 << 16)) % (1 << 16)


def _fr_ops(p_ref):
    # p enters as a full-lane (16, C) table; broadcast over sublanes only
    # (Mosaic cannot broadcast a (1,1,1) vector over both sublanes and lanes).
    # Lazy [0, 2p) arithmetic inside the butterfly cascade; outputs are
    # canonicalized on store.
    return TOps(p_ref[:][:, None, :], _FR_PPRIME, lazy=True)


# ---------------------------------------------------------------------------
# device-side twiddle construction (log-doubling; no O(N) host loops)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def _geom_powers_t(ratio_mont: jnp.ndarray, log2n: int) -> jnp.ndarray:
    """[1, r, r^2, ..., r^(2^log2n - 1)] as transposed limbs uint32[16, 2^n].

    ratio_mont: (16,) Montgomery limbs. log2n doublings of the prefix block:
    P_{2k} = concat(P_k, P_k * r^k)."""
    ones = jnp.asarray(fp.int_to_limbs(CTX_R.r))[:, None]  # 1 in Montgomery
    out = ones
    step = ratio_mont[:, None]  # r^(2^j) column
    for _ in range(log2n):
        out = jnp.concatenate([out, _colwise_mul(out, step)], axis=1)
        step = _colwise_mul(step, step)
    return out


def _colwise_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product over (16, n) transposed-limb arrays (XLA path)."""
    return fp.mont_mul(CTX_R, jnp.moveaxis(a, 0, -1), jnp.moveaxis(b, 0, -1)).T


def _host_mont_geom(ratio: int, count: int, start: int = 1) -> np.ndarray:
    """uint32[16, count] Montgomery limbs of start * ratio^j, computed with
    host Python ints (NO device dispatches: the old eager-jax construction
    issued thousands of tiny ops through the remote TPU tunnel and cost
    ~70 s of every NTT trace - the r4/r5 bench 'NTT wedge')."""
    p = R_MOD
    v = (start * CTX_R.r) % p  # Montgomery form of start
    buf = bytearray()
    for _ in range(count):
        buf += v.to_bytes(32, "little")
        v = (v * ratio) % p
    arr = np.frombuffer(bytes(buf), dtype="<u2").reshape(count, 16).astype(np.uint32)
    return np.ascontiguousarray(arr.T)


@functools.lru_cache(maxsize=None)
def _pass_tables(log2c: int, omega: int):
    """Stage twiddle table (S, 16, C) for a size-C lane DFT with root omega
    (host int, canonical). Stage s holds omega_m^(j mod h) expanded to every
    lane j (m = 2^s, h = m/2), i.e. the w of lane j's butterfly pair."""
    c = 1 << log2c
    pw = _host_mont_geom(omega, c)  # (16, C): pw[:, j] = omega^j
    stages = []
    lane = np.arange(c, dtype=np.int32)
    for s in range(1, log2c + 1):
        m = 1 << s
        h = m >> 1
        idx = (lane % h) * (c // m)  # omega_m^(j mod h) = omega^((j mod h)*C/m)
        stages.append(pw[:, idx])
    return np.stack(stages)


@functools.lru_cache(maxsize=None)
def _bitrev(log2n: int) -> np.ndarray:
    idx = np.arange(1 << log2n, dtype=np.int32)
    rev = np.zeros_like(idx)
    for b in range(log2n):
        rev |= ((idx >> b) & 1) << (log2n - 1 - b)
    return rev


# ---------------------------------------------------------------------------
# the column-DFT kernel (DFT over the lane axis, radix-2 DIT)
# ---------------------------------------------------------------------------

def _lane_dft_kernel(log2c: int, rows: int, twiddled: bool,
                     p_ref, tw_ref, u_ref, sf_ref, x_ref, o_ref):
    """One (16, rows, C) tile: bit-reversed input (lanes), natural output.

    Stage s pairs lanes at distance h = 2^(s-1) inside 2h-blocks. For the
    even lane je of a pair (je, jo=je+h): t = w * x[jo]; out[je] = x[je] + t,
    out[jo] = x[je] - t. Vectorized full-width: every lane computes its
    pair's t (tw_ref holds w expanded to both lanes), then selects +/-.

    When `twiddled`, the four-step inter-twiddle u^row (u = per-lane base,
    sf = this tile's start factor u^(row0)) is applied incrementally.
    """
    ops = _fr_ops(p_ref)
    c = 1 << log2c
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    x = x_ref[:]

    # The stage cascade runs as ONE fori_loop with a dynamic lane roll and a
    # dynamic tw_ref stage index (the same pattern as pallas_msm's suffix
    # kernel). Unrolling the log2c stages - each ~3 unrolled CIOS muls over a
    # (16, rows, C) tile - made the Mosaic compile of the 2^20..2^24 domains
    # take 15+ minutes, which is what every round's bench recorded as the
    # "fr_ntt tunnel wedge".
    def stage(s, x):
        h = (jnp.int32(1) << (s - 1)).astype(jnp.int32)
        is_even = (lane & h) == 0  # lane mod 2h < h
        tw = tw_ref[s - 1][:, None, :]  # (16, 1, C)
        fwd = pltpu.roll(x, (c - h) % c, 2)  # x[j+h]
        bwd = pltpu.roll(x, h % c, 2)        # x[j-h]
        odd_val = jnp.where(is_even, fwd, x)    # x[jo] at both lanes
        even_val = jnp.where(is_even, x, bwd)   # x[je] at both lanes
        t = ops.mont_mul(odd_val, tw)
        return jnp.where(is_even, ops.add(even_val, t), ops.sub(even_val, t))

    x = jax.lax.fori_loop(1, log2c + 1, stage, x)
    if not twiddled:
        o_ref[:] = ops.canon_out(x)
    else:
        # inter-step twiddle w^(j1*k2): row r of this tile scales by
        # sf * u^r (u = per-lane base w^k2, sf = tile start factor u^row0).
        # Built by log-doubling over the row axis - static shapes only
        # (Mosaic has no dynamic_slice of loaded values), log2(rows) muls.
        u = u_ref[:][:, None, :]      # (16, 1, C)
        prog = sf_ref[0][:, None, :]  # (16, 1, C) start factor
        step = u
        while prog.shape[1] < rows:
            prog = jnp.concatenate([prog, ops.mont_mul(prog, step)], axis=1)
            step = ops.mont_mul(step, step)
        o_ref[:] = ops.canon_out(ops.mont_mul(x, prog))


def _mul_t3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product over (16, ...) limb-first arrays (broadcasting)."""
    return jnp.moveaxis(
        fp.mont_mul(CTX_R, jnp.moveaxis(a, 0, -1), jnp.moveaxis(b, 0, -1)), -1, 0
    )


def _inter_tables_traced(log2c: int, omega_n: int, rows: int, n_tiles: int, scale: int = 1):
    """(u (16,C) per-lane inter-twiddle bases w^k2, sf (n_tiles,16,C) start
    factors scale * u^(g*rows)) as TRACED device ops (log-doubling along the
    tile axis). Big domains must not bake these in as program constants: at
    exp=26 the sf stack is 512 MB, which blew past the remote-compile
    request limit (HTTP 413) and made 2^24 compiles take ~20 min.

    `scale` (canonical int) multiplies every start factor - the iNTT's 1/m
    folds in here so every output is scaled exactly once through the linear
    second pass, instead of a whole-array post-multiply (whose extra buffer
    pushed the 2^26 iNTT 2 GB past HBM)."""
    c = 1 << log2c
    u_pw = _geom_powers_t(
        jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(omega_n))), log2c
    )
    u_rows = u_pw
    for _ in range(max(rows.bit_length() - 1, 0)):
        u_rows = _colwise_mul(u_rows, u_rows)  # elementwise u^rows
    sf = jnp.broadcast_to(
        jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(scale)))[:, None, None],
        (NLIMBS, 1, c),
    ).astype(U32)
    step = u_rows[:, None, :]
    while sf.shape[1] < n_tiles:
        sf = jnp.concatenate([sf, _mul_t3(sf, step)], axis=1)
        step = _mul_t3(step, step)
    return u_pw, jnp.moveaxis(sf[:, :n_tiles], 1, 0)


@functools.lru_cache(maxsize=None)
def _inter_tables(log2c: int, omega_n: int, rows: int, n_tiles: int, scale: int = 1):
    """Host-constant variant of _inter_tables_traced (pure Python-int
    modular arithmetic - no device dispatches; fast reuse for the small
    domains where the tables are a few MB)."""
    c = 1 << log2c
    u_pw = _host_mont_geom(omega_n, c)
    p = R_MOD
    step = pow(omega_n, rows, p)  # u^rows
    sf = np.empty((n_tiles, NLIMBS, c), np.uint32)
    ratio = 1  # step^g
    for g in range(n_tiles):
        # sf[g, :, lane] = mont(scale * omega_n^(lane * g * rows))
        sf[g] = _host_mont_geom(ratio, c, start=scale)
        ratio = (ratio * step) % p
    return u_pw, sf


def _lane_dft_pass(x3: jnp.ndarray, log2c: int, omega: int,
                   omega_n: int | None, rows_per_tile: int,
                   scale: int = 1) -> jnp.ndarray:
    """Run the lane-DFT kernel over x3 (16, R, C); DFT along the last axis.

    omega_n: base of the four-step inter-twiddle w^(j1*k2) (None = plain
    pass). scale: extra factor folded into the inter-twiddle start factors
    (the iNTT's 1/m)."""
    _, r_total, c = x3.shape
    assert c == 1 << log2c
    rows = min(rows_per_tile, r_total)
    assert r_total % rows == 0
    grid = (r_total // rows,)
    tw = jnp.asarray(_pass_tables(log2c, omega))
    s_stages = tw.shape[0]
    twiddled = omega_n is not None
    if twiddled:
        if grid[0] * NLIMBS * c * 4 <= (32 << 20):
            u_np, sf_np = _inter_tables(log2c, omega_n, rows, grid[0], scale)
            u_in, sf_all = jnp.asarray(u_np), jnp.asarray(sf_np)
        else:
            # big domains: build on device per call instead of baking a
            # multi-hundred-MB constant into the program (rolled mont_mul
            # glue: the unrolled CIOS made this trace minutes-long)
            with fp.force_rolled():
                u_in, sf_all = _inter_tables_traced(log2c, omega_n, rows, grid[0], scale)
    else:
        sf_all = jnp.zeros((grid[0], NLIMBS, c), U32)
        u_in = jnp.zeros((NLIMBS, c), U32)

    p_col = jnp.broadcast_to(jnp.asarray(_FR_P_LIMBS)[:, None], (NLIMBS, c))
    kern = functools.partial(_lane_dft_kernel, log2c, rows, twiddled)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NLIMBS, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_stages, NLIMBS, c), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NLIMBS, c), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, rows, c), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMBS, rows, c), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, r_total, c), U32),
        # C=8192 lanes (exp>=25) put the stage table + tile + temps over the
        # default 16M scoped window; v5e VMEM is 128M
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(p_col, tw, u_in, sf_all, x3)


@functools.partial(jax.jit, static_argnums=(0, 2))
def ntt_pallas(exp: int, coeffs: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Drop-in for ops.ntt.ntt: uint32[N,16] Montgomery Fr -> natural-order
    DFT, out[k] = sum_j a_j w^(jk), via the four-step Pallas kernels."""
    from .ntt import Domain

    d = Domain(exp)
    n = d.m
    if n == 1:
        return coeffs
    w = d.omegainv if inverse else d.omega

    log2r = exp // 2
    log2c = exp - log2r
    r, c = 1 << log2r, 1 << log2c
    w_r = pow(w, c, R_MOD)  # order R
    w_c = pow(w, r, R_MOD)  # order C

    # M[j2, j1] = a[j1 + R*j2]  ->  limb-major (16, R=j1, C=j2)
    x1 = jnp.moveaxis(coeffs.reshape(c, r, NLIMBS), 2, 0).transpose(0, 2, 1)
    # pass 1: DFT_C over j2 (lanes), + inter-twiddle w^(j1*k2); the iNTT's
    # 1/m folds into the start factors (the second pass is linear, so every
    # output is scaled exactly once - a whole-array post-multiply would
    # cost an extra N-sized buffer, 2 GB past HBM at 2^26)
    scale = d.minv if inverse and log2r > 0 else 1
    x1 = x1[:, :, jnp.asarray(_bitrev(log2c))]
    rows1 = _rows_per_tile(log2r, log2c)
    b = _lane_dft_pass(x1, log2c, w_c, w, rows1, scale)  # (16, j1, k2)

    # pass 2: DFT_R over j1 (lanes)
    x2 = b.transpose(0, 2, 1)  # (16, k2, j1)
    if log2r == 0:
        out_m = x2  # size-1 DFT
    else:
        x2 = x2[:, :, jnp.asarray(_bitrev(log2r))]
        rows2 = _rows_per_tile(log2c, log2r)
        out_m = _lane_dft_pass(x2, log2r, w_r, None, rows2)  # (16, k2, k1)

    out = out_m.transpose(2, 1, 0).reshape(n, NLIMBS)  # (k1, k2) row-major
    if inverse and log2r == 0:
        out = fp.mont_mul(
            CTX_R, out, jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(d.minv)))
        )
    return out


def _rows_per_tile(log2_rows_total: int, log2_lanes: int) -> int:
    """Pick the sublane tile height: keep each (16, rows, C) block <= ~1 MiB,
    minimum 8 sublanes. Mosaic emits per-vreg code, so instruction count (and
    compile time) scales with 16 * rows/8 * C/128 per op site - the old 4 MiB
    tiles put the 2^20+ compiles in the tens of minutes. Tile count only adds
    grid overhead (ns per tile), so small tiles are near-free at run time."""
    import os

    total = 1 << log2_rows_total
    mb = float(os.environ.get("PHASE2_TPU_NTT_TILE_MB", 1.0))
    budget = int(mb * (1 << 20)) // (NLIMBS * (1 << log2_lanes) * 4)
    rows = max(8, 1 << max(budget.bit_length() - 1, 0))
    return min(rows, total)
