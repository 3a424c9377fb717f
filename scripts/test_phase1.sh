#!/bin/sh
# End-to-end phase-1 ceremony exercise, mirroring the reference's
# powersoftau/test.sh:1-30 (new -> 3 contributions with verification ->
# beacon -> verify -> prepare_phase2), with our CLI.
set -e
cd "$(dirname "$0")/.."

WORK=${WORK:-/tmp/p2tpu_phase1}
SIZE=${SIZE:-10}
BATCH=${BATCH:-256}
rm -rf "$WORK" && mkdir -p "$WORK"

run() { python -m phase2_bn254_tpu "$@"; }

cd "$WORK"
run new_constrained challenge1 $SIZE $BATCH
run compute_constrained challenge1 response1 $SIZE $BATCH --entropy "first contribution entropy"
run verify_transform_constrained challenge1 response1 challenge2 $SIZE $BATCH

run compute_constrained challenge2 response2 $SIZE $BATCH --entropy "second contribution entropy"
run verify_transform_constrained challenge2 response2 challenge3 $SIZE $BATCH

run compute_constrained challenge3 response3 $SIZE $BATCH --entropy "third contribution entropy"
run verify_transform_constrained challenge3 response3 challenge4 $SIZE $BATCH

run beacon_constrained challenge4 response4 $SIZE $BATCH 0000000000000000000a558a61ddc8ee4e488d647a747fe4dcc362fe2026c620 10
run verify_transform_constrained challenge4 response4 challenge5 $SIZE $BATCH

run verify_transcript challenge1 response1 response2 response3 response4 --size $SIZE --batch $BATCH

run prepare_phase2 response4 $SIZE $BATCH --out-dir .
echo "PHASE1 E2E OK ($WORK)"
