"""Stage-by-stage timing of the G1 contribute hot path at 2^16:
tau-power ladder, GLV decomposition, Pallas GLV ladder kernel, batched
normalization. Each stage is synchronized with a host pull (the only
reliable barrier through the axon tunnel)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from phase2_bn254_tpu.curve import codecs, group as G
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.ops import glv_device, pallas_exp
from phase2_bn254_tpu.ops.backend import CTX_R, _field_ops
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD


def sync(x):
    np.asarray(jax.tree.leaves(x)[0])[:1]


def timeit(label, fn, reps=3):
    fn()  # compile
    sync_out = fn()
    sync(sync_out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        sync(out)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1e3:.1f} ms")
    return out, dt


def main():
    random.seed(11)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    log2n = n.bit_length() - 1
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(64)]
    batch = codecs.points_to_batch(pts * (n // 64), "g1")
    tau = random.randrange(1, R_MOD)
    tau_start = jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(1)))
    tau_pows = jnp.asarray(
        np.stack(
            [fp.int_to_limbs(CTX_R.to_mont_int(pow(tau, 1 << j, R_MOD))) for j in range(log2n)]
        )
    )
    one = jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(1)))

    @jax.jit
    def powers_fn(tau_start, tau_pows, coeff):
        powers = tau_start[None]
        for j in range(log2n):
            powers = jnp.concatenate(
                [powers, fp.mont_mul(CTX_R, powers, tau_pows[j][None])], axis=0
            )
        powers = fp.mont_mul(CTX_R, powers, coeff[None])
        return fp.from_mont(CTX_R, powers)

    scalars, dt_pow = timeit("tau powers + from_mont", lambda: powers_fn(tau_start, tau_pows, one))

    decomp = jax.jit(glv_device.decompose_device)
    (d1, d2, negs), dt_dec = timeit("glv decompose (device)", lambda: decomp(scalars))

    xt, yt = batch.x.T, batch.y.T
    kern = lambda: pallas_exp.pallas_batch_exp_glv(xt, yt, d1, d2, negs)
    (ox, oy, oz), dt_kern = timeit("pallas GLV ladder", kern)

    f = _field_ops("g1")
    jac = G.JacobianBatch(ox.T, oy.T, oz.T)

    @jax.jit
    def norm(jac):
        return G.jac_normalize(f, jac)

    _, dt_norm = timeit("jac_normalize (batched inverse)", lambda: norm(jac))

    total = dt_pow + dt_dec + dt_kern + dt_norm
    print(f"sum: {total * 1e3:.1f} ms -> {n / total:.0f} points/s")
    print(f"kernel-only rate: {n / dt_kern:.0f} points/s")


if __name__ == "__main__":
    main()
