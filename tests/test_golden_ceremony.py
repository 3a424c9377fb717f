"""Golden ceremony byte blobs: a deterministic size-4/batch-16 phase-1
round (initial challenge + one contribution with a fixed ChaCha seed) is
frozen in tests/fixtures/ and regenerated bit-exactly on every run.

This pins the ENTIRE serialization surface across rounds - codecs, file
geometry, tau-power transform, the rand-0.4 sampling chain (hash_to_g2 /
Fr::rand word order, the round-1 `next_u64` risk) - against silent drift
(VERDICT round-1 item 3).
"""

import hashlib
import os

from phase2_bn254_tpu.cli.phase1 import contribute as p1_contribute
from phase2_bn254_tpu.cli.phase1 import new_challenge
from phase2_bn254_tpu.crypto.chacha import ChaChaRng
from phase2_bn254_tpu.refimpl.backend import ExactBackend

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

GOLDEN_CHALLENGE_BLAKE2B = "2054432085403180e1678602c83562f1"
GOLDEN_RESPONSE_BLAKE2B = "b078195993b456a42435fc82de6295be"


def test_golden_ceremony_bytes(tmp_path):
    c1 = str(tmp_path / "challenge")
    r1 = str(tmp_path / "response")
    new_challenge(c1, 4, 16)
    rng = ChaChaRng.from_digest_be(bytes(range(64)))
    p1_contribute(c1, r1, 4, 16, rng, backend=ExactBackend())

    for path, fixture, pin in (
        (c1, "golden_challenge_s4_b16.bin", GOLDEN_CHALLENGE_BLAKE2B),
        (r1, "golden_response_s4_b16.bin", GOLDEN_RESPONSE_BLAKE2B),
    ):
        got = open(path, "rb").read()
        want = open(os.path.join(FIXTURES, fixture), "rb").read()
        assert hashlib.blake2b(got).hexdigest()[:32] == pin
        assert got == want, f"{fixture} bytes drifted"
