"""phase2_bn254_tpu: TPU-native BN254 trusted-setup ceremony framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
kobigurk/phase2-bn254 (see SURVEY.md). Subpackages:

* field/    - vectorized multi-limb Montgomery arithmetic (Fq, Fr, Fq2)
* curve/    - masked Jacobian group law, windowed scalar-mul, point codecs
* ops/      - ceremony bulk kernels (Pallas batch-exp/NTT, MSM, GLV/GLS
              splits, device pairing) + JAX backend
* parallel/ - mesh sharding (pjit/shard_map), distributed NTT, multi-host
* crypto/   - ChaCha20 (rand-0.4 bit-exact), Blake2b/SHA-256, Keccak-256
* refimpl/  - exact Python-int spec layer (golden tests, host pairings)
* ceremony/ - phase-1 powers-of-tau protocol (params, keypair, accumulator,
              out-of-core streaming)
* groth16/  - R1CS + Groth16 generator/prover/verifier stack
* gm17/     - GM17 SAP reduction + generator (reference feature-flag scope)
* sonic/    - complete SONIC: helped + unhelped (succinct) protocols
* phase2/   - circuit-specific MPC (MPCParameters), Circom import,
              snarkjs/Solidity exporters + npm-free snarkjs verifier
* bls12_381/- second engine: exact host layer + 24-limb device path + GLV
* cli/      - byte-compatible command-line tools (14 reference bins + extras)
"""

import os


def _enable_compile_cache():
    """Persistent XLA compilation cache - first-compile of the unrolled
    kernels is minutes on TPU; cached reruns are instant."""
    if os.environ.get("PHASE2_TPU_NO_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # respect an explicit setting (e.g. the test conftest)
        # Decide the platform WITHOUT initializing the backend:
        # jax.default_backend() would open the (possibly remote) device
        # tunnel at import time, which can hang every consumer — including
        # host-only code paths.  jax_platforms is a plain config read.
        first = (jax.config.jax_platforms or "").split(",")[0]
        if first == "cpu":
            # XLA:CPU AOT cache entries have crashed on reload here
            # (machine-feature mismatch SIGSEGV in the AOT loader)
            return
        if not first:
            # platform unset: enable only if a TPU-ish PJRT plugin is
            # importable, still without initializing it
            import importlib.util

            if not any(
                importlib.util.find_spec(m) for m in ("libtpu", "axon")
            ):
                return
        platform = "tpu"
        cache = os.environ.get(
            "PHASE2_TPU_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "phase2_bn254_tpu", f"jax_cache_{platform}"
            ),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


_enable_compile_cache()
