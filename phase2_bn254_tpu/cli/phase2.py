"""Phase-2 MPC command-line tools.

Byte/argv-compatible counterparts of the eight phase2 binaries
(/root/reference/phase2/src/bin/): new, contribute, beacon,
verify_contribution, prove, export_keys, copy_json, generate_verifier.
"""

from __future__ import annotations

import argparse
import json

from ..crypto.chacha import ChaChaRng
from ..groth16.prover import create_random_proof
from ..groth16.verifier import prepare_verifying_key, verify_proof
from ..phase2.circom import (
    CircomCircuit,
    filter_params,
    proof_to_json,
    proving_key_json,
    verification_key_json,
    witness_from_json_file,
)
from ..phase2.mpc import MPCParameters, contains_contribution, verify_contribution
from ..phase2.solidity import create_verifier_sol_file
from .phase1 import beacon_rng, participant_rng


def _radix_path_for(directory: str):
    return lambda exp: f"{directory}/phase1radix2m{exp}"


def _load_mpc(path: str, checked: bool = True) -> MPCParameters:
    with open(path, "rb") as f:
        return MPCParameters.read(f.read(), disallow_points_at_infinity=False, checked=checked)


def load_params_file(path: str):
    """circom_circuit.rs load_params: bellman Parameters view of a .params."""
    return _load_mpc(path).params


def main_new(argv=None):
    ap = argparse.ArgumentParser(prog="phase2-new")
    ap.add_argument("circuit_json")
    ap.add_argument("out_params")
    ap.add_argument("radix_directory")
    a = ap.parse_args(argv)
    print(f"Creating initial parameters for {a.circuit_json}...")
    circuit = CircomCircuit.from_json_file(a.circuit_json)
    params = MPCParameters.new(circuit, False, _radix_path_for(a.radix_directory))
    with open(a.out_params, "wb") as f:
        f.write(params.write())
    print(f"Wrote initial parameters to {a.out_params}.")


def main_contribute(argv=None):
    ap = argparse.ArgumentParser(prog="phase2-contribute")
    ap.add_argument("in_params")
    ap.add_argument("out_params")
    ap.add_argument("entropy")
    ap.add_argument("-v", "--progress-interval", type=int, default=0)
    a = ap.parse_args(argv)
    rng = participant_rng(a.entropy)
    params = _load_mpc(a.in_params)
    print(f"Contributing to {a.in_params}...")
    h = params.contribute(rng, backend=_default_backend())
    print(f"Contribution hash: 0x{h.hex()}")
    with open(a.out_params, "wb") as f:
        f.write(params.write())
    print(f"Wrote parameters to {a.out_params}.")


def main_beacon(argv=None):
    ap = argparse.ArgumentParser(prog="phase2-beacon")
    ap.add_argument("in_params")
    ap.add_argument("beacon_hash")
    ap.add_argument("num_iterations_exp", type=int)
    ap.add_argument("out_params")
    a = ap.parse_args(argv)
    if not 10 <= a.num_iterations_exp <= 63:
        raise SystemExit("in_num_iterations_exp should be in [10, 63] range")
    rng = beacon_rng(a.beacon_hash, a.num_iterations_exp)
    params = _load_mpc(a.in_params)
    h = params.contribute(rng, backend=_default_backend())
    print(f"Contribution hash: 0x{h.hex()}")
    with open(a.out_params, "wb") as f:
        f.write(params.write())


def main_verify_contribution(argv=None):
    ap = argparse.ArgumentParser(prog="phase2-verify-contribution")
    ap.add_argument("circuit_json")
    ap.add_argument("old_params")
    ap.add_argument("new_params")
    ap.add_argument("radix_directory")
    a = ap.parse_args(argv)
    old = _load_mpc(a.old_params)
    new = _load_mpc(a.new_params)
    print(f"Checking contribution {a.new_params}...")
    contribution = verify_contribution(old, new, backend=_default_backend())
    circuit = CircomCircuit.from_json_file(a.circuit_json)
    result = new.verify(circuit, False, _radix_path_for(a.radix_directory), backend=_default_backend())
    assert contains_contribution(result, contribution)
    print(f"Contribution {a.new_params} verified.")


def main_prove(argv=None):
    ap = argparse.ArgumentParser(prog="phase2-prove")
    ap.add_argument("circuit_json")
    ap.add_argument("witness_json")
    ap.add_argument("params")
    ap.add_argument("proof_json")
    ap.add_argument("public_json")
    a = ap.parse_args(argv)
    params = filter_params(load_params_file(a.params))
    circuit = CircomCircuit.from_json_file(a.circuit_json).with_witness(
        witness_from_json_file(a.witness_json)
    )
    # create_rng in the reference is OsRng-seeded ChaCha via Blake2b
    rng = participant_rng("", None)
    print("Proving...")
    proof = create_random_proof(circuit, params, rng, backend=_default_backend())
    print("Verifying proof")
    pvk = prepare_verifying_key(params.vk)
    assert verify_proof(pvk, proof, circuit.get_public_inputs()), "Proof is correct"
    with open(a.proof_json, "w") as f:
        f.write(proof_to_json(proof))
    with open(a.public_json, "w") as f:
        f.write(json.dumps([str(x) for x in circuit.get_public_inputs()]))
    print("Done!")


def main_export_keys(argv=None):
    ap = argparse.ArgumentParser(prog="phase2-export-keys")
    ap.add_argument("in_params")
    ap.add_argument("out_vk_json")
    ap.add_argument("out_pk_json")
    a = ap.parse_args(argv)
    print(f"Exporting {a.in_params}...")
    params = load_params_file(a.in_params)
    with open(a.out_pk_json, "w") as f:
        f.write(proving_key_json(params))
    with open(a.out_vk_json, "w") as f:
        f.write(verification_key_json(params))
    print(f"Created {a.out_pk_json} and {a.out_vk_json}.")


def main_copy_json(argv=None):
    """Merge key/values of in.json over reference.json (copy_json.rs:7-26)."""
    ap = argparse.ArgumentParser(prog="phase2-copy-json")
    ap.add_argument("reference_json")
    ap.add_argument("in_json")
    ap.add_argument("out_json")
    a = ap.parse_args(argv)
    with open(a.reference_json) as f:
        ref = json.load(f)
    with open(a.in_json) as f:
        src = json.load(f)
    ref.update(src)
    with open(a.out_json, "w") as f:
        f.write(json.dumps(ref))
    print("Done")


def main_generate_verifier(argv=None):
    ap = argparse.ArgumentParser(prog="phase2-generate-verifier")
    ap.add_argument("in_params")
    ap.add_argument("out_sol")
    a = ap.parse_args(argv)
    params = load_params_file(a.in_params)
    create_verifier_sol_file(params, a.out_sol)
    print(f"Created {a.out_sol}")


def _default_backend():
    """Same selection policy (and `PHASE2_TPU_BACKEND` override) as phase1."""
    from .phase1 import _default_backend as _phase1_default

    return _phase1_default()


def main_snarkjs_verify(argv=None):
    """`npx snarkjs verify --vk vk.json --proof proof.json` analog
    (phase2/test.sh:44) - consumes only the exported JSON files."""
    ap = argparse.ArgumentParser(prog="phase2-snarkjs-verify")
    ap.add_argument("vk_json")
    ap.add_argument("proof_json")
    ap.add_argument("public_json")
    a = ap.parse_args(argv)
    from ..phase2.circom import snarkjs_verify

    with open(a.vk_json) as f:
        vk = f.read()
    with open(a.proof_json) as f:
        proof = f.read()
    with open(a.public_json) as f:
        public = f.read()
    if snarkjs_verify(vk, proof, public):
        print("OK")
        return 0
    print("INVALID")
    raise SystemExit(1)
