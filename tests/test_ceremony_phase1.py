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
