"""End-to-end phase-1 ceremony: JAX backend vs exact host backend, byte-equal.

This is the framework's analog of powersoftau/test.sh (new -> contribute ->
verify -> decompress) at a reduced size, plus the cross-backend golden check:
the TPU compute path must produce byte-identical challenge/response files to
the exact Python spec.
"""

import hashlib
import os

import pytest

from phase2_bn254_tpu.cli.phase1 import (
    contribute,
    new_challenge,
    participant_rng,
    verify_transform,
)
from phase2_bn254_tpu.ops.backend import JaxBackend
from phase2_bn254_tpu.refimpl.backend import ExactBackend

SIZE, BATCH = 4, 8


def _run_round(tmpdir, backend, tag):
    c1 = os.path.join(tmpdir, f"challenge1_{tag}")
    r1 = os.path.join(tmpdir, f"response1_{tag}")
    c2 = os.path.join(tmpdir, f"challenge2_{tag}")
    new_challenge(c1, SIZE, BATCH)
    rng = participant_rng("deterministic test entropy", system_entropy=bytes(1024))
    contribute(c1, r1, SIZE, BATCH, rng, backend=backend)
    verify_transform(c1, r1, c2, SIZE, BATCH, backend=backend)
    return tuple(open(p, "rb").read() for p in (c1, r1, c2))


def test_jax_matches_exact_backend(tmp_path):
    files_jax = _run_round(str(tmp_path), JaxBackend(), "jax")
    files_exact = _run_round(str(tmp_path), ExactBackend(), "exact")
    for fj, fe, name in zip(files_jax, files_exact, ("challenge", "response", "new_challenge")):
        assert fj == fe, f"{name} bytes differ between JAX and exact backends"


def test_tampered_response_rejected(tmp_path):
    c1 = str(tmp_path / "c1")
    r1 = str(tmp_path / "r1")
    c2 = str(tmp_path / "c2")
    new_challenge(c1, SIZE, BATCH)
    rng = participant_rng("x", system_entropy=bytes(1024))
    contribute(c1, r1, SIZE, BATCH, rng, backend=JaxBackend())
    # corrupt one accumulator point (keep the hash header intact)
    data = bytearray(open(r1, "rb").read())
    data[64 + 40] ^= 0x01
    open(r1, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        verify_transform(c1, r1, c2, SIZE, BATCH, backend=JaxBackend())


def test_same_ratio_batch_semantics():
    """SameRatioBatch (host path) matches same_ratio per check, including
    zero rejection and the swapped-side G2 variant."""
    import random

    from phase2_bn254_tpu.ceremony.accumulator import SameRatioBatch
    from phase2_bn254_tpu.refimpl import curve as rc
    from phase2_bn254_tpu.refimpl.field import R_MOD

    random.seed(41)
    x = random.randrange(2, R_MOD)
    a = rc.G1_GEN.mul(random.randrange(1, R_MOD))
    c = rc.G2_GEN.mul(random.randrange(1, R_MOD))

    b = SameRatioBatch(device_ok=False)
    b.add("ok", (a, a.mul(x)), (c, c.mul(x)))
    b.add_g2("ok-g2", (c, c.mul(x)), (a, a.mul(x)))
    assert b.flush() is None

    b = SameRatioBatch(device_ok=False)
    b.add("ok", (a, a.mul(x)), (c, c.mul(x)))
    b.add("bad", (a, a.mul(x)), (c, c.mul(x + 1)))
    assert b.flush() == "bad"

    b = SameRatioBatch(device_ok=False)
    b.add("zero", (a, rc.point_zero("g1")), (c, c.mul(x)))
    assert b.flush() == "zero"

    b = SameRatioBatch(device_ok=False)
    b.add_g2("bad-g2", (c, c.mul(x + 1)), (a, a.mul(x)))
    assert b.flush() == "bad-g2"
