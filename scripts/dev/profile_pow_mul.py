import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, random
import numpy as np, jax
from phase2_bn254_tpu.ops.backend import JaxBackend, _pow_mul_pallas, _field_ops, _use_pallas
from phase2_bn254_tpu.curve import codecs
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl.field import R_MOD
random.seed(2)
N = 65536
be = JaxBackend()
pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(16)]
raw_one = b"".join(rc.point_to_bytes(p, False) for p in pts) * (N//16)
tau = random.randrange(1, R_MOD)

t0=time.time(); ps = be.decode(raw_one, "g1", N, False, False); print("decode g1:", round(time.time()-t0,2))
t0=time.time(); ps2 = be.pow_mul(ps, tau, 0, None); print("pow_mul g1 (first):", round(time.time()-t0,2))
t0=time.time(); ps2 = be.pow_mul(ps, tau, 0, None); print("pow_mul g1 (warm):", round(time.time()-t0,2))
t0=time.time(); out = be.encode(ps2, True); print("encode g1 comp:", round(time.time()-t0,2))

pts2 = [rc.G2_GEN.mul(random.randrange(1, R_MOD)) for _ in range(8)]
raw2 = b"".join(rc.point_to_bytes(p, False) for p in pts2) * (N//8)
t0=time.time(); qs = be.decode(raw2, "g2", N, False, False); print("decode g2:", round(time.time()-t0,2))
t0=time.time(); qs2 = be.pow_mul(qs, tau, 0, None); print("pow_mul g2 (first):", round(time.time()-t0,2))
t0=time.time(); qs2 = be.pow_mul(qs, tau, 0, None); print("pow_mul g2 (warm):", round(time.time()-t0,2))
t0=time.time(); out = be.encode(qs2, True); print("encode g2 comp:", round(time.time()-t0,2))
