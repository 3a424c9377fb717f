"""Golden phase-2 MPC byte blob: a deterministic radix -> new -> contribute
chain is frozen in tests/fixtures/ and regenerated bit-exactly on every run.

Pins the entire phase-2 serialization surface (bellman Parameters byte
format, cs_hash derivation, phase-2 keypair transcript/sampling chain,
delta application) against silent drift - the phase-2 counterpart of
test_golden_ceremony.py. Reference format: /root/reference/phase2/src/
parameters.rs:663-703 (params || cs_hash || u32 count || pubkeys).
"""

import hashlib
import os

from phase2_bn254_tpu.ceremony.prepare import prepare_phase2
from phase2_bn254_tpu.cli.phase1 import contribute as p1_contribute
from phase2_bn254_tpu.cli.phase1 import new_challenge, participant_rng
from phase2_bn254_tpu.crypto.chacha import ChaChaRng
from phase2_bn254_tpu.phase2.circom import CircomCircuit
from phase2_bn254_tpu.phase2.mpc import MPCParameters
from phase2_bn254_tpu.refimpl.backend import ExactBackend

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

SIZE, BATCH = 3, 4
CIRCUIT_JSON = {
    "constraints": [[{"2": "1"}, {"3": "1"}, {"1": "1"}]],
    "nPubInputs": 0,
    "nOutputs": 1,
    "nVars": 4,
}

GOLDEN_PARAMS_BLAKE2B = "ad8571e9f8aefc188c53c6ce7d77f4b2"


def _build_params(tmp_path) -> bytes:
    c1 = str(tmp_path / "c1")
    r1 = str(tmp_path / "r1")
    new_challenge(c1, SIZE, BATCH)
    rng = participant_rng("golden phase2", system_entropy=bytes(1024))
    p1_contribute(c1, r1, SIZE, BATCH, rng, backend=ExactBackend())
    prepare_phase2(r1, SIZE, BATCH, ExactBackend(), out_dir=str(tmp_path))

    circuit = CircomCircuit.from_json(CIRCUIT_JSON)
    mp = MPCParameters.new(
        circuit, True, lambda exp: str(tmp_path / f"phase1radix2m{exp}")
    )
    mp.contribute(ChaChaRng.from_digest_be(bytes(range(64))))
    return mp.write()


def test_golden_phase2_params_bytes(tmp_path):
    got = _build_params(tmp_path)
    fixture = os.path.join(FIXTURES, "golden_params_s3.bin")
    if not os.path.exists(fixture):  # pragma: no cover - first generation
        with open(fixture, "wb") as f:
            f.write(got)
    want = open(fixture, "rb").read()
    assert hashlib.blake2b(got).hexdigest()[:32] == GOLDEN_PARAMS_BLAKE2B
    assert got == want, "golden .params bytes drifted"
