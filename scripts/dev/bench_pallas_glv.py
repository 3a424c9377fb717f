import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, random
import jax, numpy as np
from phase2_bn254_tpu.curve import codecs, group as G
from phase2_bn254_tpu.ops.pallas_exp import batch_exp_transposed_glv
from phase2_bn254_tpu.ops.backend import _field_ops
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD
random.seed(25)
N = 512
pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(8)] * (N//8)
batch = codecs.points_to_batch(pts, "g1")
scalars = [random.randrange(R_MOD) for _ in range(N)]
t0=time.time()
out = batch_exp_transposed_glv(batch.x, batch.y, scalars)
aff = G.jac_normalize(_field_ops("g1"), out)
xs = np.asarray(aff.x); ys = np.asarray(aff.y)
print("compile+run:", round(time.time()-t0,1))
ok=True
for i in random.sample(range(N), 16):
    gx = codecs.CTX.from_mont_int(fp.limbs_to_int(xs[i]))
    gy = codecs.CTX.from_mont_int(fp.limbs_to_int(ys[i]))
    e = pts[i].mul(scalars[i])
    if (gx,gy) != (e.x,e.y): ok=False; print("MISMATCH", i); break
print("glv correctness:", ok)
N2 = 16384
import jax.numpy as jnp
bx = jnp.tile(batch.x,(N2//N,1)); by = jnp.tile(batch.y,(N2//N,1)); sc2 = scalars*(N2//N)
out = batch_exp_transposed_glv(bx, by, sc2); np.asarray(out.x)
t0=time.time()
for _ in range(3):
    out = batch_exp_transposed_glv(bx, by, sc2); np.asarray(out.x)
dt=(time.time()-t0)/3
print(f"glv pallas batch_exp: {N2/dt:.0f} points/s (incl host decomposition)")
