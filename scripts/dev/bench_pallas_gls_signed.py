"""Signed GLS quad-ladder G2 kernel: correctness spot-check + throughput.

The signed variant (14 windows x 5 doublings + 4 adds vs 17 x 4 + 4) has
been the DEFAULT G2 path since the 2026-08-18 v5e validation (66.5k pts/s);
the old PHASE2_TPU_GLS / PHASE2_TPU_SIGNED5 opt-ins are gone. Current
opt-outs: PHASE2_TPU_NO_SIGNED5=1 (unsigned 17x4 quad ladder),
PHASE2_TPU_NO_GLS=1 (plain 64x4 ladder)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, random
import jax, jax.numpy as jnp, numpy as np
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.curve import codecs, group as G
from phase2_bn254_tpu.ops import gls_device
from phase2_bn254_tpu.ops.pallas_exp import (
    pallas_batch_exp_gls_signed,
    batch_exp_transposed_gls_signed,
)
from phase2_bn254_tpu.ops.backend import _field_ops
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD, Fq2

random.seed(15)
N = 256
pts = [rc.G2_GEN.mul(random.randrange(1, R_MOD)) for _ in range(8)] * (N // 8)
batch = codecs.points_to_batch(pts, "g2")
scalars = [random.randrange(R_MOD) for _ in range(N)]
f2 = _field_ops("g2")

t0 = time.time()
out = batch_exp_transposed_gls_signed(batch.x, batch.y, scalars)
aff = G.jac_normalize(f2, out)
xs = np.asarray(aff.x); ys = np.asarray(aff.y)
print("compile+run:", round(time.time() - t0, 1), "s")
ok = True
for i in random.sample(range(N), 6):
    gx = Fq2(codecs.CTX.from_mont_int(fp.limbs_to_int(xs[i, 0])), codecs.CTX.from_mont_int(fp.limbs_to_int(xs[i, 1])))
    gy = Fq2(codecs.CTX.from_mont_int(fp.limbs_to_int(ys[i, 0])), codecs.CTX.from_mont_int(fp.limbs_to_int(ys[i, 1])))
    exp = pts[i].mul(scalars[i])
    if gx != exp.x or gy != exp.y:
        ok = False; print("MISMATCH", i); break
print("g2 signed GLS pallas correctness:", ok)

# steady-state throughput incl. device decomposition (the production glue)
N2 = 4096
bx = jnp.tile(batch.x, (N2 // N, 1, 1)); by = jnp.tile(batch.y, (N2 // N, 1, 1))
sc_t = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars * (N2 // N)]).T)
x0, x1 = bx[:, 0].T, bx[:, 1].T
y0, y1 = by[:, 0].T, by[:, 1].T

def run():
    digits = gls_device.decompose_signed_device_t(sc_t)
    outs = pallas_batch_exp_gls_signed(x0, x1, y0, y1, digits)
    np.asarray(outs[0][:1])  # host pull barrier (axon tunnel)

run()
t0 = time.time()
iters = 3
for _ in range(iters):
    run()
dt = (time.time() - t0) / iters
print(f"g2 signed GLS pallas: {N2/dt:.0f} points/s ({dt*1e3:.0f} ms / {N2})")
