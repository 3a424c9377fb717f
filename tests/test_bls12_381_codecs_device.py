"""BLS12-381 device codecs vs the exact host codecs (which are pinned to the
upstream .dat vectors)."""

import os
import random

import numpy as np
import pytest

from phase2_bn254_tpu.bls12_381 import codecs_device as dc
from phase2_bn254_tpu.bls12_381 import curve as host
from phase2_bn254_tpu.bls12_381 import device as dev
from phase2_bn254_tpu.bls12_381.field import R_MOD

random.seed(8)


def _points(grp, n):
    gen = host.G1_GEN if grp == "g1" else host.G2_GEN
    return [gen.mul(random.randrange(1, R_MOD)) for _ in range(n)]


def _to_bytes(p, compressed):
    f = {
        ("g1", True): host.g1_to_compressed,
        ("g1", False): host.g1_to_uncompressed,
        ("g2", True): host.g2_to_compressed,
        ("g2", False): host.g2_to_uncompressed,
    }[(p.group, compressed)]
    return f(p)


@pytest.mark.parametrize("grp", ["g1", "g2"])
@pytest.mark.parametrize("compressed", [False, True])
def test_decode_encode_roundtrip_matches_host(grp, compressed):
    pts = _points(grp, 4)
    raw = b"".join(_to_bytes(p, compressed) for p in pts)
    batch = dc.decode_batch(raw, grp, 4, compressed, check=True)
    # device decode -> host points equals the host decode
    got = dev.batch_to_points(batch, grp)
    assert got == pts
    # re-encode both ways
    assert dc.encode_batch(batch, grp, compressed) == raw
    other = dc.encode_batch(batch, grp, not compressed)
    want = b"".join(_to_bytes(p, not compressed) for p in pts)
    assert other == want


def test_bad_encodings_rejected():
    pts = _points("g1", 2)
    raw = bytearray(b"".join(_to_bytes(p, True) for p in pts))
    with pytest.raises(ValueError):
        # two compressed points reinterpreted as one uncompressed point:
        # the compression bit is set
        dc.decode_batch(bytes(raw), "g1", 1, compressed=False)
    raw[0] &= 0x7F  # clear compression bit
    with pytest.raises(ValueError):
        dc.decode_batch(bytes(raw), "g1", 2, compressed=True)


@pytest.mark.skipif(
    not os.environ.get("PHASE2_TPU_SLOW_TESTS"),
    reason="BLS Pallas ladder in interpreter mode costs minutes; covered on "
    "real TPU by scripts/dev/bench_bls_pallas.py",
)
@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_pallas_batch_mul_matches_host(grp):
    pts = _points(grp, 4)
    scalars = [random.randrange(R_MOD) for _ in range(4)]
    got = dev.pallas_batch_mul(pts, scalars, grp)
    want = [p.mul(s) for p, s in zip(pts, scalars)]
    assert got == want
