"""prepare_phase2: JAX group-iNTT radix files vs exact host inverse DFT."""

import os

from phase2_bn254_tpu.ceremony.prepare import prepare_phase2, reduce_powers
from phase2_bn254_tpu.cli.phase1 import contribute, new_challenge, participant_rng
from phase2_bn254_tpu.ops.backend import JaxBackend
from phase2_bn254_tpu.refimpl.backend import ExactBackend

SIZE, BATCH = 3, 4


def test_prepare_phase2_backends_agree(tmp_path):
    c1 = str(tmp_path / "c1")
    r1 = str(tmp_path / "r1")
    new_challenge(c1, SIZE, BATCH)
    rng = participant_rng("radix test", system_entropy=bytes(1024))
    contribute(c1, r1, SIZE, BATCH, rng, backend=JaxBackend())

    dj = tmp_path / "jax"
    de = tmp_path / "exact"
    dj.mkdir()
    de.mkdir()
    pj = prepare_phase2(r1, SIZE, BATCH, JaxBackend(), out_dir=str(dj))
    pe = prepare_phase2(r1, SIZE, BATCH, ExactBackend(), out_dir=str(de))
    assert len(pj) == len(pe) == SIZE + 1
    for a, b in zip(pj, pe):
        da, db = open(a, "rb").read(), open(b, "rb").read()
        assert len(da) == len(db)
        assert da == db, f"radix file mismatch: {os.path.basename(a)}"


def test_reduce_powers(tmp_path):
    c1 = str(tmp_path / "c1")
    red = str(tmp_path / "reduced")
    new_challenge(c1, SIZE, BATCH)
    reduce_powers(c1, red, SIZE, SIZE - 1, BATCH)
    # reduced initial challenge must byte-match a directly generated smaller
    # accumulator body (all generator points), modulo the header
    c_small = str(tmp_path / "c_small")
    new_challenge(c_small, SIZE - 1, BATCH)
    a = open(red, "rb").read()
    b = open(c_small, "rb").read()
    assert a[64:] == b[64:]
    assert a[:64] != b[:64]  # reduced_hash header, not blank hash
