"""Hardware validation: verify_transform with the device pairing batch ACTIVE.

VERDICT r3 item 5: the SameRatioBatch device flush (ceremony/accumulator.py)
only activates on TPU with >=8 queued pairings, so the default CPU suite
never exercises it end-to-end; this script runs a size-14 ceremony round on
the live device and asserts the batched device Miller loop actually ran and
accepted, plus a tamper check that it (or the host re-check) still rejects.

Usage: python scripts/dev/validate_device_pairing.py [SIZE=14] [BATCH=8192]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 14
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8192


def main():
    from phase2_bn254_tpu.ceremony import accumulator
    from phase2_bn254_tpu.cli.phase1 import (
        contribute,
        new_challenge,
        participant_rng,
        verify_transform,
    )
    from phase2_bn254_tpu.ops.backend import JaxBackend

    calls = {"device": 0, "host": 0}
    orig_dev = accumulator.SameRatioBatch._flush_device
    orig_host = accumulator.SameRatioBatch._flush_host

    def dev(self):
        calls["device"] += 1
        return orig_dev(self)

    def host(self):
        calls["host"] += 1
        return orig_host(self)

    accumulator.SameRatioBatch._flush_device = dev
    accumulator.SameRatioBatch._flush_host = host

    d = tempfile.mkdtemp(prefix="devpair_")
    os.chdir(d)
    backend = JaxBackend()
    print(f"workdir {d}  SIZE={SIZE} BATCH={BATCH}", flush=True)

    t0 = time.time()
    new_challenge("challenge", SIZE, BATCH)
    print(f"new_challenge: {time.time()-t0:.1f} s", flush=True)

    rng = participant_rng("device pairing validation", b"\x2a" * 1024)
    t0 = time.time()
    contribute("challenge", "response", SIZE, BATCH, rng, backend=backend)
    print(f"contribute: {time.time()-t0:.1f} s", flush=True)

    t0 = time.time()
    verify_transform("challenge", "response", "new_challenge", SIZE, BATCH, backend=backend)
    print(f"verify_transform: {time.time()-t0:.1f} s", flush=True)
    print(f"pairing flush calls: {calls}", flush=True)
    assert calls["device"] >= 1, "device pairing batch never ran!"
    assert calls["host"] == 0, "device path fell back to host pairings on a VALID response"

    # tamper: flip a byte inside the response accumulator region; the reject
    # must come through (device flags -> host re-check confirms, ADVICE r3)
    calls["device"] = calls["host"] = 0
    with open("response", "r+b") as f:
        f.seek(64 + 5 * 32 + 7)  # inside tau_g1 region (compressed)
        b = f.read(1)
        f.seek(-1, 1)
        f.write(bytes([b[0] ^ 0x01]))
    try:
        verify_transform("challenge", "response", "new_challenge2", SIZE, BATCH, backend=backend)
        raise SystemExit("TAMPERED RESPONSE ACCEPTED - FAIL")
    except (ValueError, SystemExit) as e:
        if "INVALID" not in str(e) and "curve" not in str(e) and "decode" not in str(e).lower():
            print(f"(rejected with: {type(e).__name__}: {e})", flush=True)
        print(f"tamper rejected OK; flush calls after tamper: {calls}", flush=True)
    print("DEVICE PAIRING VALIDATION OK", flush=True)


if __name__ == "__main__":
    main()
