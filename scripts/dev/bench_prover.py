"""Groth16 prover wall-clock at scale (VERDICT r3 item 9).

Usage: python scripts/dev/bench_prover.py [LOG2_CONSTRAINTS=17] [--cpu]

Times `create_proof` (the full device pipeline: 6 NTTs + divide-by-z for h,
then 7 MSMs - /root/reference/bellman/src/groth16/prover.rs:216-342) on a
synthetic parameter set of production shape. CRS points are tiled random
points and assignments random scalars: the prover's arithmetic cost is
data-independent, so the timing is exact while skipping an hours-long CRS
generation; value-correct proofs are covered by test_groth16_generator.py's
MiMC integration at small sizes.

Comparison point: the reference's MiMC bench (bellman/tests/mimc.rs:1-341)
prints avg proving time on all CPU cores (no published number).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import random
import time

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 17
    n = 1 << lg

    from phase2_bn254_tpu.groth16.containers import Parameters, VerifyingKey
    from phase2_bn254_tpu.groth16.prover import ProvingAssignment, create_proof
    from phase2_bn254_tpu.ops.backend import JaxBackend
    from phase2_bn254_tpu.refimpl import curve as rc
    from phase2_bn254_tpu.refimpl.field import R_MOD

    random.seed(17)

    def g1s(count):
        base = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(64)]
        return (base * (count // 64 + 1))[:count]

    def g2s(count):
        base = [rc.G2_GEN.mul(random.randrange(1, R_MOD)) for _ in range(16)]
        return (base * (count // 16 + 1))[:count]

    ninp = 2
    naux = n - ninp
    b_dense = n // 2  # ~half the variables appear in B (MiMC-like density)

    vk = VerifyingKey(
        alpha_g1=rc.G1_GEN.mul(5),
        beta_g1=rc.G1_GEN.mul(7),
        beta_g2=rc.G2_GEN.mul(7),
        gamma_g2=rc.G2_GEN.mul(11),
        delta_g1=rc.G1_GEN.mul(13),
        delta_g2=rc.G2_GEN.mul(13),
        ic=g1s(ninp + 1),
    )
    if "--source" in sys.argv:
        # streaming-ParameterSource mode (groth16/source.py): the parameter
        # bytes are tiled with numpy - NO host Point lists anywhere, so this
        # is the "2^22 constraints in bounded host RAM" validation
        import struct

        import numpy as np

        from phase2_bn254_tpu.groth16.source import ParametersSource

        def tile_bytes(pts, esize, count):
            block = np.frombuffer(
                b"".join(rc.point_to_bytes(p, False) for p in pts), dtype=np.uint8
            )
            reps = -(-count * esize // block.size)
            return np.tile(block, reps).tobytes()[: count * esize]

        g1_base, g2_base = g1s(64), g2s(16)
        buf = bytearray(vk.write())
        for count in (n - 1, naux, n, b_dense):
            buf += struct.pack(">I", count) + tile_bytes(g1_base, 64, count)
        buf += struct.pack(">I", b_dense) + tile_bytes(g2_base, 128, b_dense)
        print(f"parameter bytes: {len(buf)/2**20:.0f} MiB (streamed, no Point lists)")
        params = ParametersSource(bytes(buf), checked="--checked" in sys.argv)
    else:
        params = Parameters(
            vk=vk,
            h=g1s(n - 1),
            l=g1s(naux),
            a=g1s(n),
            b_g1=g1s(b_dense),
            b_g2=g2s(b_dense),
        )

    pa = ProvingAssignment()
    pa.a = [random.randrange(R_MOD) for _ in range(n)]
    pa.b = [random.randrange(R_MOD) for _ in range(n)]
    pa.c = [random.randrange(R_MOD) for _ in range(n)]
    pa.input_assignment = [random.randrange(R_MOD) for _ in range(ninp)]
    pa.aux_assignment = [random.randrange(R_MOD) for _ in range(naux)]
    pa.a_aux_density = [True] * naux
    pa.b_input_density = [True] * ninp
    pa.b_aux_density = [True] * (b_dense - ninp) + [False] * (naux - (b_dense - ninp))

    backend = None if "--exact" in sys.argv else JaxBackend()
    for rep in range(2):
        t0 = time.time()
        proof = create_proof(pa, params, r=3, s=4, backend=backend)
        dt = time.time() - t0
        tag = "cold(+compiles)" if rep == 0 else "steady"
        print(
            f"groth16 prover 2^{lg} constraints: {dt:8.2f} s {tag} "
            f"({n/dt:,.0f} constraints/s)",
            flush=True,
        )
    assert not proof.a.is_zero()


if __name__ == "__main__":
    main()
