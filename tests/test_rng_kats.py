"""Independent known-answer tests for the rand-0.4 ChaCha sampling chain.

Round-1 flagged the rand-0.4 `next_u64` word order as an unverified risk
(no cargo in this environment to cross-run the Rust binaries). This module
pins the whole chain three independent ways:

1. The djb ChaCha20 keystream vector (zero key/nonce) and the rand 0.4
   in-tree `test_rng_true_values` vectors - literal constants from the
   rand 0.4 test suite (rand-0.4 src/prng/chacha.rs), NOT derived from this
   repo's code. rand 0.4 reads the keystream as native little-endian u32
   words, so word 0 of the zero-seed stream is 0xade0b876 (bytes 76 b8 e0
   ad ...).
2. A from-scratch reimplementation of the rand-0.4 semantics in this file
   (independent quarter-round formulation + the documented trait defaults:
   next_u64 = (next_u32 << 32) | next_u32 [rand-0.4 src/lib.rs Rng trait],
   [T; N]: Rand = index order 0..N, bool: Rand = u8 & 1, u8: Rand =
   next_u32 as u8, ff_ce PrimeField derive Rand = repr::rand + shave top
   REPR_SHAVE_BITS of the LAST limb + is_valid retry) - cross-checked
   word-for-word against crypto.chacha.ChaChaRng.
3. Frozen stream pins for a ceremony-realistic seed so any refactor of the
   production path fails loudly.

Reference call sites: /root/reference/powersoftau/src/utils.rs:31-45
(hash_to_g2), /root/reference/pairing/src/bn256/ec.rs:711-726 (G1::rand),
ec.rs:1091-1105 + 1347-1357 (G2::rand with cofactor).
"""

import hashlib

from phase2_bn254_tpu.crypto.chacha import ChaChaRng
from phase2_bn254_tpu.refimpl import sampling
from phase2_bn254_tpu.refimpl.field import MONT_R, Q, R_MOD

# ---------------------------------------------------------------------------
# 1. literal vectors from the rand 0.4 test suite / djb spec
# ---------------------------------------------------------------------------

# rand-0.4 src/prng/chacha.rs test_rng_true_values, first vector:
# ChaChaRng::from_seed(&[0u32; 8]), 16 draws (== LE words of the djb
# zero-key zero-nonce keystream block 0: 76 b8 e0 ad a0 f1 3d 90 ...)
RAND04_ZERO_SEED_BLOCK0 = [
    0xADE0B876, 0x903DF1A0, 0xE56A5D40, 0x28BD8653,
    0xB819D2BD, 0x1AED8DA0, 0xCCEF36A8, 0xC70D778B,
    0x7C5941DA, 0x8D485751, 0x3FE02477, 0x374AD8B8,
    0xF4B8436A, 0x1CA11815, 0x69B687C3, 0x8665EEB2,
]
# ... and the next 16 draws (block 1 of the same djb vector)
RAND04_ZERO_SEED_BLOCK1 = [
    0xBEE7079F, 0x7A385155, 0x7C97BA98, 0x0D082D73,
    0xA0290FCB, 0x6965E348, 0x3E53C612, 0xED7AEE32,
    0x7621B729, 0x434EE69C, 0xB03371D5, 0xD539D874,
    0x281FED31, 0x45FB0A51, 0x1F0AE1AC, 0x6F4D794B,
]
# rand-0.4 src/prng/chacha.rs test_rng_true_values, second vector:
# ChaChaRng::from_seed(&[0, 1, 2, 3, 4, 5, 6, 7]). The published vector
# samples the 17*i-th draw (word i of block i), not the first 16 words.
# Draw 0 (0xf225c81a) is the published rand-0.4 leading value (the anchor
# tying our key schedule to rand-0.4's: seed words are placed as raw native
# u32 key words); the remaining 15 stride-17 draws and the first full block
# are frozen from this implementation after word-for-word cross-checking
# against the independent _SpecChaChaRng below.
RAND04_COUNTING_SEED_STRIDE17 = [
    0xF225C81A, 0x6AB1BE57, 0x04D42951, 0x70858036,
    0x49884684, 0x64EFEC72, 0x4BE2D186, 0x3615B384,
    0x11CFA18E, 0xD3C50049, 0x75C775F6, 0x434C6530,
    0x2C5BAD8F, 0x898881DC, 0x5F1C86D9, 0xC1F8E7F4,
]
COUNTING_SEED_BLOCK0 = [
    0xF225C81A, 0x3F1B748E, 0xA84158C6, 0x9F3DD7E5,
    0x64A1C01E, 0x315F05B9, 0x0B1A2CD8, 0xDDCF51AB,
    0xD572B853, 0x82AA874A, 0x86478F6D, 0xDC3031E5,
    0xB844E252, 0x8337FA00, 0xC437F66E, 0x2D6B20DF,
]


def test_rand04_zero_seed_vectors():
    rng = ChaChaRng.from_seed([0] * 8)
    assert [rng.next_u32() for _ in range(16)] == RAND04_ZERO_SEED_BLOCK0
    assert [rng.next_u32() for _ in range(16)] == RAND04_ZERO_SEED_BLOCK1


def test_rand04_counting_seed_vector():
    rng = ChaChaRng.from_seed(list(range(8)))
    got = []
    for _ in range(16):
        got.append(rng.next_u32())
        for _ in range(16):
            rng.next_u32()
    assert got == RAND04_COUNTING_SEED_STRIDE17

    rng = ChaChaRng.from_seed(list(range(8)))
    assert [rng.next_u32() for _ in range(16)] == COUNTING_SEED_BLOCK0


def test_next_u64_word_order():
    """rand-0.4 Rng::next_u64 default: FIRST u32 is the HIGH half."""
    rng = ChaChaRng.from_seed([0] * 8)
    v = rng.next_u64()
    assert v == (RAND04_ZERO_SEED_BLOCK0[0] << 32) | RAND04_ZERO_SEED_BLOCK0[1]


# ---------------------------------------------------------------------------
# 2. from-scratch reimplementation (independent formulation)
# ---------------------------------------------------------------------------

def _qr(a, b, c, d):
    """djb quarter round, functional formulation (vs the in-place mutation
    in crypto/chacha.py)."""
    M = 0xFFFFFFFF

    def rot(x, n):
        return ((x << n) & M) | (x >> (32 - n))

    a = (a + b) & M
    d = rot(d ^ a, 16)
    c = (c + d) & M
    b = rot(b ^ c, 12)
    a = (a + b) & M
    d = rot(d ^ a, 8)
    c = (c + d) & M
    b = rot(b ^ c, 7)
    return a, b, c, d


_ROUND_IDX = [
    (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
    (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
]


class _SpecChaChaRng:
    """rand-0.4 ChaChaRng written directly from the spec for cross-checking."""

    def __init__(self, seed_words):
        key = (list(seed_words) + [0] * 8)[:8]
        self.st = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574] + key + [0] * 4
        self.out = []

    def next_u32(self):
        if not self.out:
            x = list(self.st)
            for _ in range(10):
                for ia, ib, ic, idx in _ROUND_IDX:
                    x[ia], x[ib], x[ic], x[idx] = _qr(x[ia], x[ib], x[ic], x[idx])
            self.out = [(a + b) & 0xFFFFFFFF for a, b in zip(x, self.st)]
            # 64-bit block counter in words 12..13
            ctr = (self.st[12] | (self.st[13] << 32)) + 1
            self.st[12] = ctr & 0xFFFFFFFF
            self.st[13] = (ctr >> 32) & 0xFFFFFFFF
        return self.out.pop(0)

    def next_u64(self):
        hi = self.next_u32()
        return (hi << 32) | self.next_u32()

    def gen_bool(self):
        return (self.next_u32() & 0xFF) & 1 == 1

    def rand_fr_mont(self):
        """ff_ce derive: FrRepr([u64;4]) limb 0 first; shave 2 bits of limb
        3; retry until < r. Accepted value IS the Montgomery repr."""
        while True:
            limbs = [self.next_u64() for _ in range(4)]
            limbs[3] &= (1 << 62) - 1
            v = limbs[0] | (limbs[1] << 64) | (limbs[2] << 128) | (limbs[3] << 192)
            if v < R_MOD:
                return v


def test_spec_reimpl_matches_production_stream():
    for seed in ([0] * 8, list(range(8)), [0xDEADBEEF, 7, 0, 0xFFFFFFFF, 3, 1, 4, 1]):
        a = ChaChaRng.from_seed(seed)
        b = _SpecChaChaRng(seed)
        for _ in range(100):
            assert a.next_u32() == b.next_u32()
        # cross the 16-word block boundary in u64 mode too
        a2 = ChaChaRng.from_seed(seed)
        b2 = _SpecChaChaRng(seed)
        for _ in range(40):
            assert a2.next_u64() == b2.next_u64()


def test_spec_fr_rand_matches_production():
    seed = [int.from_bytes(hashlib.blake2b(b"kat").digest()[4 * i : 4 * i + 4], "big")
            for i in range(8)]
    a = ChaChaRng.from_seed(seed)
    b = _SpecChaChaRng(seed)
    for _ in range(20):
        got = a.gen_fp_mont(R_MOD)
        want = b.rand_fr_mont()
        assert got == want


# ---------------------------------------------------------------------------
# 3. frozen ceremony-chain pins
# ---------------------------------------------------------------------------

def test_hash_to_g2_pin():
    """hash_to_g2 of Blake2b('phase2-bn254-tpu kat') - full chain pin
    (seeding + Fq2::rand + bool + get_point_from_x + cofactor mul)."""
    digest = hashlib.blake2b(b"phase2-bn254-tpu kat").digest()
    p = sampling.hash_to_g2(digest)
    # affine x.c0 canonical int, frozen 2026-08-17
    assert p.x.c0 == 0x145FC239E3EAC8AF2BE57F39F70CA54B24A957E16A0F9C7C1AA7BF7FF293F9AF
    got = (p.x.c0, p.x.c1, p.y.c0, p.y.c1)
    digest2 = hashlib.blake2b(repr(got).encode()).hexdigest()[:16]
    assert digest2 == PIN_HASH_TO_G2


# The pin is the blake2b-16 of the affine coordinate tuple repr; regenerate
# deliberately (and record why) if the sampling chain ever changes.
PIN_HASH_TO_G2 = "8f60496adfd23206"


def test_fr_rand_first_draws_pin():
    rng = ChaChaRng.from_seed([0] * 8)
    draws = [sampling.rand_fr(rng) for _ in range(4)]
    digest = hashlib.blake2b(repr(draws).encode()).hexdigest()[:16]
    assert digest == PIN_FR_DRAWS


PIN_FR_DRAWS = "60a6e3a08baf4928"
