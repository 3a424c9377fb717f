"""Hardware validation + throughput for the signed base-32 GLV ladder.

Run on the TPU (no flags); first run pays the Mosaic compile. The signed
base-32 ladder has been the DEFAULT G1 path since the 2026-08-18 v5e
validation (174.9k pts/s); the old PHASE2_TPU_SIGNED5 opt-in is gone and
PHASE2_TPU_NO_SIGNED5=1 is the opt-out back to the unsigned base-16 ladder.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, random
import jax, numpy as np
import jax.numpy as jnp
from phase2_bn254_tpu.curve import codecs, group as G
from phase2_bn254_tpu.ops.pallas_exp import pallas_batch_exp_glv_signed
from phase2_bn254_tpu.ops import glv_device
from phase2_bn254_tpu.ops.backend import _field_ops
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(25)
N = 512
pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(8)] * (N // 8)
batch = codecs.points_to_batch(pts, "g1")
scalars = [random.randrange(R_MOD) for _ in range(N)]


def run(bx, by, sc):
    sc_t = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in sc]).T)
    d1, d2 = glv_device.decompose_signed_device_t(sc_t)
    ox, oy, oz = pallas_batch_exp_glv_signed(bx.T, by.T, d1, d2)
    return G.JacobianBatch(ox.T, oy.T, oz.T)


t0 = time.time()
out = run(batch.x, batch.y, scalars)
aff = G.jac_normalize(_field_ops("g1"), out)
xs = np.asarray(aff.x); ys = np.asarray(aff.y)  # host pull = real barrier
print("compile+run:", round(time.time() - t0, 1))
ok = True
for i in random.sample(range(N), 16):
    gx = codecs.CTX.from_mont_int(fp.limbs_to_int(xs[i]))
    gy = codecs.CTX.from_mont_int(fp.limbs_to_int(ys[i]))
    e = pts[i].mul(scalars[i])
    if (gx, gy) != (e.x, e.y):
        ok = False
        print("MISMATCH", i)
        break
print("signed glv correctness:", ok)

N2 = 16384
bx = jnp.tile(batch.x, (N2 // N, 1)); by = jnp.tile(batch.y, (N2 // N, 1))
sc2 = scalars * (N2 // N)
aff = G.jac_normalize(_field_ops("g1"), run(bx, by, sc2)); np.asarray(aff.x)
t0 = time.time()
for _ in range(3):
    aff = G.jac_normalize(_field_ops("g1"), run(bx, by, sc2))
    np.asarray(aff.x)
dt = (time.time() - t0) / 3
print(f"signed glv pallas batch_exp: {N2/dt:.0f} points/s (incl device split + normalize)")
