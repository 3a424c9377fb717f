"""Codec round-trips + flag-bit corruption handling (reference
random_encoding_tests, pairing/src/tests/curve.rs:430-460)."""

import random

import pytest

from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(99)


def rand_pts(group, n):
    gen = rc.G1_GEN if group == "g1" else rc.G2_GEN
    return [gen.mul(random.randrange(1, R_MOD)) for _ in range(n)]


@pytest.mark.parametrize("group", ["g1", "g2"])
@pytest.mark.parametrize("compressed", [False, True])
def test_roundtrip_host_and_device(group, compressed):
    pts = rand_pts(group, 8)
    raw = b"".join(rc.point_to_bytes(p, compressed) for p in pts)
    # host decode
    esize = (32 if group == "g1" else 64) * (1 if compressed else 2)
    back = [
        rc.point_from_bytes(raw[i * esize : (i + 1) * esize], group, compressed)
        for i in range(len(pts))
    ]
    assert back == pts
    # device decode -> re-encode must be byte-identical
    batch = codecs.decode_batch(raw, group, len(pts), compressed, check=True)
    assert codecs.encode_batch(batch, group, compressed) == raw
    # and device -> host points match
    assert codecs.batch_to_points(batch, group) == pts


def test_corrupted_flags_rejected():
    p = rand_pts("g1", 1)[0]
    unc = bytearray(rc.point_to_bytes(p, False))
    unc[0] |= 0x80  # compression bit on uncompressed
    with pytest.raises(ValueError):
        rc.point_from_bytes(bytes(unc), "g1", False)
    with pytest.raises(ValueError):
        codecs.decode_batch(bytes(unc), "g1", 1, False, True)

    unc2 = bytearray(rc.point_to_bytes(p, False))
    unc2[0] |= 0x40  # infinity bit with nonzero payload
    with pytest.raises(ValueError):
        rc.point_from_bytes(bytes(unc2), "g1", False)

    comp = bytearray(rc.point_to_bytes(p, True))
    comp[31] ^= 0x01  # x no longer on curve (overwhelmingly a non-QR or
    # different point; accept either failure or a different point)
    try:
        q = rc.point_from_bytes(bytes(comp), "g1", True)
        assert q != p
    except ValueError:
        pass


def test_not_on_curve_rejected():
    p = rand_pts("g1", 1)[0]
    bad = rc.Point(p.x, (p.y + 1) % rc.Q, False, "g1")
    raw = rc.g1_to_uncompressed(bad)
    with pytest.raises(ValueError):
        rc.point_from_bytes(raw, "g1", False, check=True)
    with pytest.raises(ValueError):
        codecs.decode_batch(raw, "g1", 1, False, True)
    # unchecked host read must pass (CheckForCorrectness::No semantics)
    q = rc.point_from_bytes(raw, "g1", False, check=False)
    assert not q.is_on_curve()


def test_infinity_encoding():
    z = rc.point_zero("g1")
    assert rc.point_to_bytes(z, False)[0] == 0x40
    assert rc.point_from_bytes(rc.point_to_bytes(z, False), "g1", False) == z
    assert rc.point_from_bytes(rc.point_to_bytes(z, True), "g1", True) == z
    z2 = rc.point_zero("g2")
    assert rc.point_from_bytes(rc.point_to_bytes(z2, False), "g2", False) == z2
