"""Worker process for the 2-process multi-host test (test_multihost.py).

Invoked as: python multihost_worker.py <proc_id> <num_procs> <port> <outdir>
with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=N
set by the parent. Joins the jax.distributed process group, builds the
GLOBAL mesh over every process's virtual CPU devices, runs sharded_pow_mul
and sharded_msm through the production multi-host code path
(parallel/multihost.py + parallel/sharded.py put_global/gather_host), and
the coordinator writes the results for the parent to compare.
"""

import os
import sys


def main():
    proc_id, num_procs, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ["PHASE2_TPU_COORDINATOR"] = f"localhost:{port}"
    os.environ["PHASE2_TPU_NUM_PROCS"] = str(num_procs)
    os.environ["PHASE2_TPU_PROC_ID"] = str(proc_id)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    # multihost is import-light; init the process group BEFORE the kernel
    # stack's module-level jnp constants initialize the XLA backend
    from phase2_bn254_tpu.parallel import multihost

    assert multihost.init_distributed(), "distributed init did not trigger"
    assert jax.process_count() == num_procs, jax.process_count()

    from phase2_bn254_tpu.parallel import sharded

    mesh = multihost.global_mesh()
    assert mesh.devices.size == num_procs * jax.local_device_count()

    # deterministic inputs, identical on every process (the ceremony analog:
    # all processes decode the same challenge file bytes)
    import random

    from phase2_bn254_tpu.curve import codecs
    from phase2_bn254_tpu.field import fp
    from phase2_bn254_tpu.refimpl import curve as rc
    from phase2_bn254_tpu.refimpl.field import R_MOD

    random.seed(77)
    n = 16
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    batch = codecs.points_to_batch(pts, "g1")
    tau = random.randrange(1, R_MOD)
    scalars = [random.randrange(R_MOD) for _ in range(n)]

    out = sharded.sharded_pow_mul(mesh, "g1", batch, tau, start=2, coeff=None)
    host = {k: sharded.gather_host(mesh, getattr(out, k)) for k in ("x", "y", "inf")}

    sc = np.stack([fp.int_to_limbs(s) for s in scalars])
    msm_out = sharded.sharded_msm(mesh, "g1", batch, sc)
    msm_host = {f"msm_{k}": np.asarray(getattr(msm_out, k)) for k in ("x", "y", "inf")}

    if multihost.is_coordinator():
        np.savez(os.path.join(outdir, "result.npz"), **host, **msm_host)

    # --- e2e: a full size-4 contribute through the CLI + ShardedBackend ---
    from jax.experimental import multihost_utils

    from phase2_bn254_tpu.cli import phase1
    from phase2_bn254_tpu.parallel.backend import ShardedBackend

    ch = os.path.join(outdir, "challenge")
    resp = os.path.join(outdir, "response")
    phase1.new_challenge(ch, 4, 16)  # non-coordinators write+drop scratch
    multihost_utils.sync_global_devices("challenge written")
    rng = phase1.participant_rng("mh test", b"\x07" * 1024)
    backend = ShardedBackend(mesh=mesh, min_per_device=2)
    phase1.contribute(ch, resp, 4, 16, rng, backend=backend)

    # every process must reach the barrier before exit or the coordinator
    # may be torn down mid-collective
    multihost_utils.sync_global_devices("done")
    print(f"proc {proc_id} OK", flush=True)


if __name__ == "__main__":
    main()
