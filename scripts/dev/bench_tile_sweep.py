import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, random
import jax, jax.numpy as jnp, numpy as np
from phase2_bn254_tpu.field import fp
from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.ops.pallas_exp import pallas_batch_exp
from phase2_bn254_tpu.curve import group as G
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD
random.seed(5)
N = 16384
pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(8)] * (N//8)
batch = codecs.points_to_batch(pts, "g1")
sc = jnp.asarray(np.stack([fp.int_to_limbs(random.randrange(R_MOD)) for _ in range(N)]))
digits = G.scalar_windows(sc)
digits_msb = jnp.flip(digits, axis=-1).T.astype(jnp.int32)
xt, yt = batch.x.T, batch.y.T
for tile in (256, 512, 1024):
    out = pallas_batch_exp(xt, yt, digits_msb, tile); np.asarray(out[0])
    t0=time.time()
    for _ in range(3):
        out = pallas_batch_exp(xt, yt, digits_msb, tile); np.asarray(out[0])
    print(f"tile={tile}: {N/((time.time()-t0)/3):.0f} points/s")
