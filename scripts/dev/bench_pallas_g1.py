import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, random
import jax, jax.numpy as jnp, numpy as np
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.curve import codecs, group as G
from phase2_bn254_tpu.ops.pallas_exp import batch_exp_transposed
from phase2_bn254_tpu.ops.backend import _field_ops
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD
random.seed(5)
N = 512
pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(8)] * (N//8)
batch = codecs.points_to_batch(pts, "g1")
scalars = [random.randrange(R_MOD) for _ in range(N)]
sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
t0=time.time()
out = batch_exp_transposed(batch.x, batch.y, sc)
aff = G.jac_normalize(_field_ops("g1"), out)
xs = np.asarray(aff.x); ys = np.asarray(aff.y)
print("compile+run:", round(time.time()-t0,1), "s")
ok = True
for i in random.sample(range(N), 12):
    gx = codecs.CTX.from_mont_int(fp.limbs_to_int(xs[i]))
    gy = codecs.CTX.from_mont_int(fp.limbs_to_int(ys[i]))
    exp = pts[i].mul(scalars[i])
    if (gx, gy) != (exp.x, exp.y):
        ok = False; print("MISMATCH at", i); break
print("pallas correctness:", ok)
# timing steady-state at larger N
N2 = 8192
pts2x = jnp.tile(batch.x, (N2//N, 1))
pts2y = jnp.tile(batch.y, (N2//N, 1))
sc2 = jnp.tile(sc, (N2//N, 1))
out = batch_exp_transposed(pts2x, pts2y, sc2); np.asarray(out.x)
t0=time.time()
for _ in range(3):
    out = batch_exp_transposed(pts2x, pts2y, sc2); np.asarray(out.x)
dt = (time.time()-t0)/3
print(f"pallas batch_exp: {N2/dt:.0f} points/s")
