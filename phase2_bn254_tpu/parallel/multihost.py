"""Multi-host (multi-process) scaffolding for the ceremony backends.

The reference has no distributed backend at all - its "multi-node" story is
challenge/response files passed between participants, and inside one node a
thread pool (/root/reference/bellman/src/multicore.rs:55-71). The TPU-native
replacement layers:

1. `jax.distributed` process group initialization (one process per host,
   standard JAX env/flags: coordinator address, process count, process id).
2. A GLOBAL mesh over every chip of every host. Device order from
   `jax.devices()` is process-major, so contiguous batch shards land on one
   host's chips first: the ShardedBackend's per-device Pippenger partials
   and pow_mul shards need no cross-host traffic until the final one-point
   all_gather, which crosses DCN exactly once per MSM. The distributed
   four-step NTT's all_to_alls run over the same mesh; XLA routes the
   intra-host portion over ICI and the cross-host portion over DCN.
3. File I/O stays on process 0 (the ceremony file formats are the
   inter-participant interface and are written by one coordinator).

Single-process fallback: everything degrades to the local mesh, so the same
code runs unchanged on one host (the only mode testable in this
environment; the driver validates the sharding on a virtual CPU mesh).
"""

from __future__ import annotations

import os

import jax

# NOTE: keep this module import-light: init_distributed() must run before
# anything initializes the XLA backend, and importing .sharded pulls in the
# kernel stack whose module-level jnp constants do exactly that.


def init_distributed() -> bool:
    """Initialize the JAX process group when multi-host env config is
    present; no-op (returns False) otherwise.

    Trigger: PHASE2_TPU_COORDINATOR (host:port), plus PHASE2_TPU_NUM_PROCS /
    PHASE2_TPU_PROC_ID - or any standard JAX cluster env (JAX auto-detects
    on TPU pods, where initialize() needs no arguments)."""
    if jax.distributed.is_initialized():
        return True  # idempotent: __main__ initializes before CLI imports
    coord = os.environ.get("PHASE2_TPU_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["PHASE2_TPU_NUM_PROCS"]),
            process_id=int(os.environ["PHASE2_TPU_PROC_ID"]),
        )
        return True
    if os.environ.get("PHASE2_TPU_AUTO_DISTRIBUTED"):
        # TPU pod slices: coordinator/process topology comes from the metadata server
        jax.distributed.initialize()
        return True
    return False


def global_mesh():
    """Mesh over every device of every process (process-major order).

    Contiguous shards of a batch land on one host's chips before spilling to
    the next host, keeping pow_mul/MSM shard traffic on ICI."""
    from . import sharded

    return sharded.make_mesh(jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()
