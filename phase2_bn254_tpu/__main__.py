"""Unified CLI dispatcher: python -m phase2_bn254_tpu <tool> [args...].

Tool names mirror the reference binaries (powersoftau/src/bin and
phase2/src/bin).
"""

import sys


def _transcript_main(argv):
    from .cli.transcript import main_verify_transcript

    main_verify_transcript(argv)


def main():
    # Multi-host runs must join the process group BEFORE any import
    # initializes the XLA backend (the kernel stack's module-level jnp
    # constants do); parallel.multihost is import-light by design.
    import os

    if os.environ.get("PHASE2_TPU_COORDINATOR") or os.environ.get(
        "PHASE2_TPU_AUTO_DISTRIBUTED"
    ):
        from .parallel import multihost

        multihost.init_distributed()

    from .cli import phase1, phase2 as p2cli

    tools = {
        # phase 1 (powersoftau)
        "new_constrained": phase1.main_new,
        "compute_constrained": phase1.main_compute,
        "beacon_constrained": phase1.main_beacon,
        "verify_transform_constrained": phase1.main_verify,
        "prepare_phase2": phase1.main_prepare_phase2,
        "reduce_powers": phase1.main_reduce_powers,
        "verify_transcript": _transcript_main,
        # phase 2
        "new": p2cli.main_new,
        "contribute": p2cli.main_contribute,
        "beacon": p2cli.main_beacon,
        "verify_contribution": p2cli.main_verify_contribution,
        "prove": p2cli.main_prove,
        "export_keys": p2cli.main_export_keys,
        "copy_json": p2cli.main_copy_json,
        "generate_verifier": p2cli.main_generate_verifier,
        "snarkjs_verify": p2cli.main_snarkjs_verify,
    }
    if len(sys.argv) < 2 or sys.argv[1] not in tools:
        print("Usage: python -m phase2_bn254_tpu <tool> [args...]")
        print("Tools:", ", ".join(sorted(tools)))
        raise SystemExit(64)
    tools[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
