"""phase2_bn254_tpu: TPU-native BN254 trusted-setup ceremony framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
kobigurk/phase2-bn254 (see SURVEY.md). Subpackages:

* field/   - vectorized multi-limb Montgomery arithmetic (Fq, Fr, Fq2)
* curve/   - masked Jacobian group law, windowed scalar-mul, point codecs
* ops/     - ceremony bulk kernels (batch_exp, MSM, NTT) + JAX backend
* parallel/- mesh sharding (pjit/shard_map) for multi-chip runs
* crypto/  - ChaCha20 (rand-0.4 bit-exact), Blake2b/SHA-256 helpers
* refimpl/ - exact Python-int spec layer (golden tests, host pairings)
* ceremony/- phase-1 powers-of-tau protocol (params, keypair, accumulator)
* groth16/ - R1CS + Groth16 prover/verifier stack
* phase2/  - circuit-specific MPC (MPCParameters), Circom import, exporters
* cli/     - byte-compatible command-line tools
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
        # key the cache by backend platform: CPU AOT artifacts produced by a
        # remote compile service are machine-specific and SIGILL elsewhere
        platform = jax.default_backend()
        if platform == "cpu":
            # XLA:CPU AOT cache entries have crashed on reload here
            # (machine-feature mismatch SIGSEGV in the AOT loader)
            return
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
