#!/bin/sh
# End-to-end phase-2 exercise, mirroring the reference's phase2/test.sh:1-45
# minus the npm circom/snarkjs steps (no network in this environment): the
# bundled circuit.json/witness.json stand in for the circom compiler output.
set -e
cd "$(dirname "$0")/.."
REPO=$(pwd)

WORK=${WORK:-/tmp/p2tpu_phase2}
RADIX=${RADIX:-/tmp/p2tpu_phase1}
if [ ! -f "$RADIX/phase1radix2m0" ]; then
    echo "Run scripts/test_phase1.sh first to generate radix files"
    exit 1
fi
rm -rf "$WORK" && mkdir -p "$WORK"
cp "$RADIX"/phase1radix* "$WORK"/
cp "$REPO"/scripts/fixtures/circuit.json "$REPO"/scripts/fixtures/witness.json "$WORK"/

run() { python -m phase2_bn254_tpu "$@"; }

cd "$WORK"
run new circuit.json circom1.params ./

run contribute circom1.params circom2.params asdajdzixcjlzxjczxlkcjzxlkcj
run verify_contribution circuit.json circom1.params circom2.params ./

run contribute circom2.params circom3.params dsfjkshdfakjhsdf
run verify_contribution circuit.json circom2.params circom3.params ./

run contribute circom3.params circom4.params askldfjklasdf
run verify_contribution circuit.json circom3.params circom4.params ./

run export_keys circom4.params vk.json pk.json
run generate_verifier circom4.params verifier.sol

run prove circuit.json witness.json circom4.params proof.json public.json
run snarkjs_verify vk.json proof.json public.json
python "$REPO"/scripts/vk2ethsnarks.py vk.json ethsnarks_vk.json
echo "PHASE2 E2E OK ($WORK)"
