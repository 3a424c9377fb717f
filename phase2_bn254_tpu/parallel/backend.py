"""Multi-chip ceremony backend: the JaxBackend protocol over a device mesh.

Every bulk operation of the phase-1 accumulator (transform pow_mul, verify
power_pairs MSMs) runs sharded over a `jax.sharding.Mesh` instead of on a
single device - the TPU replacement for the reference's only parallelism,
the single-node Worker thread pool
(/root/reference/bellman/src/multicore.rs:55-71, used by
/root/reference/powersoftau/src/batched_accumulator.rs:1130-1216 and the
verification dense_multiexp /root/reference/powersoftau/src/utils.rs:190-292).

File bytes are identical to the single-device and exact backends: sharding
only changes where each batch element is computed, never its value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import codecs
from ..field import fp
from ..ops.backend import JaxBackend, PointSet, _next_pow2, _pad_batch
from ..refimpl.field import R_MOD
from . import sharded


class ShardedBackend(JaxBackend):
    """Ceremony bulk-math backend sharded over a device mesh.

    Batches are padded so every device holds a power-of-two shard of at
    least `min_per_device` elements (padding entries are generator points
    with scalar 0/identity coefficients; they are sliced away on encode and
    skipped by the MSM bucket logic).
    """

    name = "sharded"

    def __init__(self, mesh=None, min_per_device: int = 32, use_pallas: bool | None = None):
        self.mesh = mesh if mesh is not None else sharded.make_mesh()
        self.ndev = int(self.mesh.devices.size)
        assert self.ndev & (self.ndev - 1) == 0, "mesh size must be a power of two"
        self.min_batch = self.ndev * min_per_device
        self.use_pallas = use_pallas

    def _pad_target(self, n: int) -> int:
        return _next_pow2(n, minimum=self.min_batch)

    def pow_mul(self, ps: PointSet, tau: int, start: int, coeff: int | None) -> PointSet:
        target = self._pad_target(ps.n)
        padded = _pad_batch(ps.batch, ps.group, target)
        aff = sharded.sharded_pow_mul(
            self.mesh, ps.group, padded, tau, start, coeff, use_pallas=self.use_pallas
        )
        if jax.process_count() > 1:
            # encode/codecs index arbitrary batch elements: gather each
            # process a full host copy (one cross-host all-gather per chunk;
            # file I/O itself stays on the coordinator)
            aff = jax.tree.map(lambda a: jnp.asarray(sharded.gather_host(self.mesh, a)), aff)
        return PointSet(aff, ps.n, ps.group)

    def msm(self, ps: PointSet, scalars: list[int]):
        assert len(scalars) == ps.n
        target = self._pad_target(ps.n)
        padded = _pad_batch(ps.batch, ps.group, target)
        sc = np.zeros((target, fp.NLIMBS), dtype=np.uint32)
        for i, s in enumerate(scalars):
            sc[i] = fp.int_to_limbs(s % R_MOD)
        out = sharded.sharded_msm(self.mesh, ps.group, padded, jnp.asarray(sc))
        return codecs.batch_to_points(out, ps.group)[0]
