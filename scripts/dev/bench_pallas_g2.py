import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, random
import jax, jax.numpy as jnp, numpy as np
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.curve import codecs, group as G
from phase2_bn254_tpu.ops.pallas_exp import batch_exp_transposed_g2
from phase2_bn254_tpu.ops.backend import _field_ops
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD
random.seed(15)
N = 256
pts = [rc.G2_GEN.mul(random.randrange(1, R_MOD)) for _ in range(8)] * (N//8)
batch = codecs.points_to_batch(pts, "g2")
scalars = [random.randrange(R_MOD) for _ in range(N)]
sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
f2 = _field_ops("g2")
t0=time.time()
out = batch_exp_transposed_g2(batch.x, batch.y, sc)
aff = G.jac_normalize(f2, out)
xs = np.asarray(aff.x); ys = np.asarray(aff.y)
print("compile+run:", round(time.time()-t0,1), "s")
from phase2_bn254_tpu.refimpl.field import Fq2
ok=True
for i in random.sample(range(N), 6):
    gx = Fq2(codecs.CTX.from_mont_int(fp.limbs_to_int(xs[i,0])), codecs.CTX.from_mont_int(fp.limbs_to_int(xs[i,1])))
    gy = Fq2(codecs.CTX.from_mont_int(fp.limbs_to_int(ys[i,0])), codecs.CTX.from_mont_int(fp.limbs_to_int(ys[i,1])))
    exp = pts[i].mul(scalars[i])
    if gx != exp.x or gy != exp.y: ok=False; print("MISMATCH", i); break
print("g2 pallas correctness:", ok)
N2 = 2048
bx = jnp.tile(batch.x, (N2//N,1,1)); by = jnp.tile(batch.y, (N2//N,1,1)); sc2 = jnp.tile(sc,(N2//N,1))
out = batch_exp_transposed_g2(bx, by, sc2); np.asarray(out.x)
t0=time.time()
for _ in range(3):
    out = batch_exp_transposed_g2(bx, by, sc2); np.asarray(out.x)
print(f"g2 pallas: {N2/((time.time()-t0)/3):.0f} points/s")
