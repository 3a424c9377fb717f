"""wNAF recoding parity + full-transcript verifier."""

import random

from phase2_bn254_tpu.cli.phase1 import contribute, new_challenge, participant_rng
from phase2_bn254_tpu.cli.transcript import verify_transcript
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl import wnaf
from phase2_bn254_tpu.refimpl.backend import ExactBackend
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(55)


def test_wnaf_matches_plain_mul():
    """random_wnaf_tests analog (pairing/src/tests/curve.rs:68-93)."""
    for w in (2, 3, 4, 5):
        base = rc.G1_GEN.mul(random.randrange(1, R_MOD))
        s = random.randrange(R_MOD)
        table = wnaf.wnaf_table(base, w)
        form = wnaf.wnaf_form(s, w)
        assert wnaf.wnaf_exp(table, form) == base.mul(s)
        # digits are odd or zero and bounded
        assert all(d == 0 or (d % 2 == 1 and abs(d) < (1 << w)) for d in form)


def test_transcript_verifier(tmp_path):
    SIZE, BATCH = 4, 8
    be = ExactBackend()
    c1 = str(tmp_path / "c1")
    r1 = str(tmp_path / "r1")
    r2 = str(tmp_path / "r2")
    new_challenge(c1, SIZE, BATCH)
    contribute(c1, r1, SIZE, BATCH, participant_rng("t1", system_entropy=bytes(1024)), backend=be)
    # second round builds on the decompressed first response
    import tempfile

    from phase2_bn254_tpu.ceremony import accumulator
    from phase2_bn254_tpu.ceremony.params import CeremonyParams
    from phase2_bn254_tpu.crypto.hashing import calculate_hash

    params = CeremonyParams(SIZE, BATCH)
    c2 = str(tmp_path / "c2")
    with open(r1, "rb") as fin, open(c2, "wb") as fnew:
        fnew.truncate(params.accumulator_size)
        fnew.seek(0)
        fnew.write(calculate_hash(r1))
        accumulator.decompress(fin, fnew, params, be)
    contribute(c2, r2, SIZE, BATCH, participant_rng("t2", system_entropy=bytes(1024)), backend=be)

    hashes = verify_transcript(c1, [r1, r2], SIZE, BATCH, backend=be)
    assert len(hashes) == 2

    # tampering any round must fail
    data = bytearray(open(r2, "rb").read())
    data[70] ^= 1
    open(r2, "wb").write(bytes(data))
    try:
        verify_transcript(c1, [r1, r2], SIZE, BATCH, backend=be)
        assert False, "tampered transcript accepted"
    except ValueError:
        pass
