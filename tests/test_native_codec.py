"""Native (C++) codec vs the numpy fallback and the exact byte formats.

The native module replaces the host byte-swizzle half of the point codecs
(reference formats: /root/reference/pairing/src/bn256/ec.rs:763-946); these
tests pin that both implementations produce identical bytes and identical
rejection behavior, over the same decode_batch/encode_batch surface the
ceremony uses.
"""

import numpy as np
import pytest

import phase2_bn254_tpu.curve.codecs as codecs
import phase2_bn254_tpu.curve.group as G
from phase2_bn254_tpu import native
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import Q


def _sample_points(group, n, seed):
    gen = rc.G1_GEN if group == "g1" else rc.G2_GEN
    return [gen.mul(3 * i + seed + 1) for i in range(n)]


@pytest.fixture(scope="module")
def g1_batch():
    pts = _sample_points("g1", 17, 5)
    return codecs.points_to_batch(pts, "g1"), pts


@pytest.fixture(scope="module")
def g2_batch():
    pts = _sample_points("g2", 9, 11)
    return codecs.points_to_batch(pts, "g2"), pts


def test_native_available():
    # the build environment has g++; the native path must actually engage
    assert native.available()


@pytest.mark.parametrize("group", ["g1", "g2"])
@pytest.mark.parametrize("compressed", [False, True])
def test_decode_digits_native_matches_numpy(group, compressed, g1_batch, g2_batch):
    batch, _ = g1_batch if group == "g1" else g2_batch
    raw = codecs.encode_batch(batch, group, compressed)
    count = int(np.asarray(batch.inf).shape[0])
    ncoords = (1 if group == "g1" else 2) * (1 if compressed else 2)

    res = native.decode_digits(
        raw, count, ncoords, 16, Q.to_bytes(32, "big"), reject_greatest=not compressed
    )
    assert res is not None
    digits_nat, greatest_nat, _ = res

    # numpy path
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(count, ncoords * 32).copy()
    greatest_np = (arr[:, 0] & 0x80) != 0
    arr[:, 0] &= 0x3F
    digits_np = np.stack(
        [codecs.be_bytes_to_digits(arr[:, 32 * c : 32 * (c + 1)].copy()) for c in range(ncoords)],
        axis=1,
    )
    assert np.array_equal(digits_nat, digits_np)
    assert np.array_equal(greatest_nat, greatest_np)


@pytest.mark.parametrize("group", ["g1", "g2"])
@pytest.mark.parametrize("compressed", [False, True])
def test_encode_decode_roundtrip_native(group, compressed, g1_batch, g2_batch):
    batch, pts = g1_batch if group == "g1" else g2_batch
    raw = codecs.encode_batch(batch, group, compressed)
    # must equal the exact spec encoding point by point
    esize = (32 if group == "g1" else 64) * (1 if compressed else 2)
    for i, p in enumerate(pts):
        assert raw[i * esize : (i + 1) * esize] == rc.point_to_bytes(p, compressed)
    back = codecs.decode_batch(raw, group, len(pts), compressed, check=True)
    assert codecs.encode_batch(back, group, compressed) == raw


def test_decode_rejections(g1_batch):
    batch, pts = g1_batch
    raw = bytearray(codecs.encode_batch(batch, "g1", False))
    n = len(pts)

    bad = bytearray(raw)
    bad[64 * 3] |= 0x40  # infinity flag
    with pytest.raises(ValueError):
        codecs.decode_batch(bytes(bad), "g1", n, False, check=False)

    bad = bytearray(raw)
    bad[64 * 2] |= 0x80  # compression flag on uncompressed
    with pytest.raises(ValueError):
        codecs.decode_batch(bytes(bad), "g1", n, False, check=False)

    bad = bytearray(raw)
    bad[64 * 5 : 64 * 5 + 32] = Q.to_bytes(32, "big")  # x == q
    with pytest.raises(ValueError):
        codecs.decode_batch(bytes(bad), "g1", n, False, check=False)


def test_encode_infinity_radix_semantics(g1_batch):
    import jax.numpy as jnp

    batch, pts = g1_batch
    n = len(pts)
    inf = np.zeros(n, dtype=bool)
    inf[4] = True
    b2 = G.AffineBatch(batch.x, batch.y, jnp.asarray(inf))
    with pytest.raises(ValueError):
        codecs.encode_batch(b2, "g1", False)
    out = np.frombuffer(
        codecs.encode_batch(b2, "g1", False, allow_infinity=True), dtype=np.uint8
    ).reshape(n, 64)
    assert out[4, 0] == 0x40 and not out[4, 1:].any()
    ref = np.frombuffer(codecs.encode_batch(batch, "g1", False), dtype=np.uint8).reshape(n, 64)
    mask = np.ones(n, dtype=bool)
    mask[4] = False
    assert np.array_equal(out[mask], ref[mask])


def test_numpy_fallback_bytes_identical(monkeypatch, g1_batch, g2_batch):
    """Force the fallback and require byte-identical encode/decode results."""
    for group, (batch, pts) in (("g1", g1_batch), ("g2", g2_batch)):
        for compressed in (False, True):
            raw_native = codecs.encode_batch(batch, group, compressed)
            monkeypatch.setattr(native, "_LIB", None)
            monkeypatch.setattr(native, "_TRIED", True)
            assert not native.available()
            raw_np = codecs.encode_batch(batch, group, compressed)
            dec = codecs.decode_batch(raw_np, group, len(pts), compressed, check=True)
            monkeypatch.undo()
            assert raw_native == raw_np
            assert codecs.encode_batch(dec, group, compressed) == raw_native
