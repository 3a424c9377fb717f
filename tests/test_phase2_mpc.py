"""Phase-2 MPC end-to-end: ceremony radix files -> MPCParameters ->
contributions -> verification -> Groth16 proof -> verify.

The framework analog of phase2/test.sh (sans the npm circom/snarkjs steps,
which need network): new -> contribute x2 -> verify_contribution -> prove ->
verify, plus serialization round-trips and export formats.
"""

import json

import pytest

from phase2_bn254_tpu.ceremony.prepare import prepare_phase2
from phase2_bn254_tpu.cli.phase1 import contribute as p1_contribute
from phase2_bn254_tpu.cli.phase1 import new_challenge, participant_rng
from phase2_bn254_tpu.crypto.chacha import ChaChaRng
from phase2_bn254_tpu.groth16.prover import create_random_proof
from phase2_bn254_tpu.groth16.verifier import prepare_verifying_key, verify_proof
from phase2_bn254_tpu.phase2.circom import (
    CircomCircuit,
    filter_params,
    proof_to_json,
    proving_key_json,
    verification_key_json,
)
from phase2_bn254_tpu.phase2.mpc import MPCParameters, contains_contribution, verify_contribution
from phase2_bn254_tpu.refimpl.backend import ExactBackend

SIZE, BATCH = 3, 4

CIRCUIT_JSON = {
    # one multiplication: aux2 * aux3 == public output (var 1)
    "constraints": [[{"2": "1"}, {"3": "1"}, {"1": "1"}]],
    "nPubInputs": 0,
    "nOutputs": 1,
    "nVars": 4,
}
WITNESS = [1, 6, 2, 3]


@pytest.fixture(scope="module")
def radix_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("radix")
    c1 = str(d / "c1")
    r1 = str(d / "r1")
    new_challenge(c1, SIZE, BATCH)
    rng = participant_rng("phase2 radix", system_entropy=bytes(1024))
    p1_contribute(c1, r1, SIZE, BATCH, rng, backend=ExactBackend())
    prepare_phase2(r1, SIZE, BATCH, ExactBackend(), out_dir=str(d))
    return d


def _radix_path_for(d):
    return lambda exp: str(d / f"phase1radix2m{exp}")


def test_phase2_mpc_end_to_end(radix_dir, tmp_path):
    circuit = CircomCircuit.from_json(CIRCUIT_JSON)
    mp = MPCParameters.new(circuit, True, _radix_path_for(radix_dir))

    # round-trip serialization
    data = mp.write()
    mp2 = MPCParameters.read(data, disallow_points_at_infinity=False, checked=True)
    assert mp == mp2

    before = MPCParameters.read(data)
    d1 = mp.contribute(ChaChaRng.from_digest_be(bytes(range(64))))
    h1 = verify_contribution(before, mp)
    assert h1 == d1

    mid = MPCParameters.read(mp.write())
    d2 = mp.contribute(ChaChaRng.from_digest_be(bytes(range(1, 65))))
    h2 = verify_contribution(mid, mp)
    assert h2 == d2

    # full transcript verify against the circuit
    hashes = mp.verify(circuit, True, _radix_path_for(radix_dir))
    assert contains_contribution(hashes, d1)
    assert contains_contribution(hashes, d2)

    # tampering with H must be caught
    bad = MPCParameters.read(mp.write())
    bad.params.h[0] = bad.params.h[0].double()
    with pytest.raises(ValueError):
        verify_contribution(mid, bad)

    # prove + verify
    params = filter_params(MPCParameters.read(mp.write()).params)
    witness_circuit = circuit.with_witness(WITNESS)
    proof = create_random_proof(
        witness_circuit, params, ChaChaRng.from_digest_be(bytes(range(2, 66)))
    )
    pvk = prepare_verifying_key(params.vk)
    assert verify_proof(pvk, proof, witness_circuit.get_public_inputs())
    assert not verify_proof(pvk, proof, [7])

    # export formats parse as JSON with expected keys
    pk = json.loads(proving_key_json(params))
    vk = json.loads(verification_key_json(params))
    pj = json.loads(proof_to_json(proof))
    assert set(pk) >= {"a", "b1", "b2", "c", "h", "vk_alfa_1", "vk_delta_1"}
    assert set(vk) >= {"ic", "vk_alfabeta_12", "inputs_count", "protocol"}
    assert pj["protocol"] == "groth"

    # snarkjs-semantics verify from the serialized JSONs alone (the
    # `npx snarkjs verify` step of phase2/test.sh:44, npm-free)
    from phase2_bn254_tpu.phase2.circom import snarkjs_verify

    vk_json = verification_key_json(params)
    proof_json = proof_to_json(proof)
    publics = witness_circuit.get_public_inputs()
    public_json = json.dumps([str(v) for v in publics])
    assert snarkjs_verify(vk_json, proof_json, public_json)
    assert not snarkjs_verify(vk_json, proof_json, json.dumps(["7"]))
    # corrupted serialized alfabeta_12 must be caught (the pairing check
    # consumes the serialized value, not a recomputation)
    bad_vk = json.loads(vk_json)
    bad_vk["vk_alfabeta_12"][0][0][0] = "12345"
    assert not snarkjs_verify(json.dumps(bad_vk), proof_json, public_json)


def test_device_qap_eval_matches_host(radix_dir):
    """Segmented-MSM QAP evaluation (ops/segsum.py) vs the host point loop:
    MPCParameters.new must be bit-identical (cs_hash pins the bytes)."""
    from phase2_bn254_tpu.ops.backend import JaxBackend

    circuit = CircomCircuit.from_json(CIRCUIT_JSON)
    host = MPCParameters.new(circuit, True, _radix_path_for(radix_dir))
    dev = MPCParameters.new(circuit, True, _radix_path_for(radix_dir), backend=JaxBackend())
    assert host.cs_hash == dev.cs_hash
    assert host.write() == dev.write()


def test_portable_contribute(radix_dir):
    """WASM-binding analog (phase2/src/lib.rs:26-88): one-shot byte-level
    contribute with the Blake2b(entropy)-seeded RNG, pure host."""
    from phase2_bn254_tpu.phase2.portable import contribute as portable_contribute

    circuit = CircomCircuit.from_json(CIRCUIT_JSON)
    mp = MPCParameters.new(circuit, True, _radix_path_for(radix_dir))
    before_bytes = mp.write()
    after_bytes, h = portable_contribute(before_bytes, b"portable entropy")
    before = MPCParameters.read(before_bytes)
    after = MPCParameters.read(after_bytes)
    assert verify_contribution(before, after) == h


def test_solidity_verifier_export(radix_dir):
    """generate_verifier analog: all template placeholders substituted with
    the actual vk points (circom_circuit.rs:202-241)."""
    from phase2_bn254_tpu.phase2.circom import CircomCircuit
    from phase2_bn254_tpu.phase2.mpc import MPCParameters
    from phase2_bn254_tpu.phase2.solidity import create_verifier_sol

    circuit = CircomCircuit.from_json(CIRCUIT_JSON)
    mp = MPCParameters.new(circuit, True, _radix_path_for(radix_dir))
    sol = create_verifier_sol(mp.params)
    assert "<%" not in sol, "unsubstituted template placeholder"
    assert f"uint256({mp.params.vk.alpha_g1.x})" in sol
    assert f"uint256({mp.params.vk.gamma_g2.x.c1})" in sol
    assert f"vk.IC[{len(mp.params.vk.ic) - 1}]" in sol
    assert "pragma solidity" in sol and "function verify" in sol
