"""NTT correctness: device NTT vs direct DFT over Python ints, round-trips,
coset ops (bellman domain.rs parity at the value level)."""

import random

import jax.numpy as jnp
import numpy as np

from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import ntt
from phase2_bn254_tpu.refimpl.field import FR_ROOT_OF_UNITY, FR_S, R_MOD

random.seed(11)
CTX = ntt.CTX_R


def mont_arr(vals):
    return jnp.asarray(np.stack([fp.int_to_limbs(CTX.to_mont_int(v)) for v in vals]))


def out_ints(arr):
    arr = np.asarray(arr)
    return [CTX.from_mont_int(fp.limbs_to_int(arr[i])) for i in range(arr.shape[0])]


def direct_dft(vals, inverse=False):
    m = len(vals)
    exp = m.bit_length() - 1
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - exp), R_MOD)
    if inverse:
        omega = pow(omega, -1, R_MOD)
    minv = pow(m, -1, R_MOD) if inverse else 1
    return [
        sum(vals[j] * pow(omega, i * j, R_MOD) for j in range(m)) * minv % R_MOD
        for i in range(m)
    ]


def test_ntt_matches_direct_dft():
    exp = 5
    vals = [random.randrange(R_MOD) for _ in range(1 << exp)]
    got = out_ints(ntt.ntt(exp, mont_arr(vals), False))
    assert got == direct_dft(vals)
    got_inv = out_ints(ntt.ntt(exp, mont_arr(vals), True))
    assert got_inv == direct_dft(vals, inverse=True)


def test_ntt_roundtrip_and_coset():
    exp = 6
    vals = [random.randrange(R_MOD) for _ in range(1 << exp)]
    a = mont_arr(vals)
    assert out_ints(ntt.ntt(exp, ntt.ntt(exp, a, False), True)) == vals
    assert out_ints(ntt.icoset_ntt(exp, ntt.coset_ntt(exp, a))) == vals


def test_poly_multiplication_via_coset():
    """domain.rs:380-425 analog: multiply polynomials via pointwise product."""
    exp = 4
    m = 1 << exp
    h = m // 2
    pa = [random.randrange(R_MOD) for _ in range(h)] + [0] * h
    pb = [random.randrange(R_MOD) for _ in range(h)] + [0] * h
    ea = ntt.ntt(exp, mont_arr(pa), False)
    eb = ntt.ntt(exp, mont_arr(pb), False)
    prod = ntt.ntt(exp, fp.mont_mul(CTX, ea, eb), True)
    # naive convolution
    conv = [0] * m
    for i in range(h):
        for j in range(h):
            conv[i + j] = (conv[i + j] + pa[i] * pb[j]) % R_MOD
    assert out_ints(prod) == conv
