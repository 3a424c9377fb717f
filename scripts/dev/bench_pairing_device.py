"""Device batched pairing: correctness spot-check + throughput on TPU.

The host optimal ate runs ~72 ms/pairing single-threaded; the batched
device path amortizes one Miller/final-exp program over N lanes."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, random
import numpy as np

import jax

from phase2_bn254_tpu.ops import pairing_device as pd
from phase2_bn254_tpu.refimpl import curve as rc
from phase2_bn254_tpu.refimpl import pairing as hp
from phase2_bn254_tpu.refimpl.field import R_MOD

random.seed(33)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 64

pts1 = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(N)]
pts2 = [rc.G2_GEN.mul(random.randrange(1, R_MOD)) for _ in range(N)]
px, py, qx, qy = pd.points_to_arrays(pts1, pts2)

t0 = time.time()
out = pd.batch_pairing(px, py, qx, qy)
np.asarray(out[:1])  # host pull barrier (axon tunnel)
print(f"compile+run: {time.time()-t0:.1f} s")

# correctness on 3 random lanes
got = pd.fq12_to_host(np.asarray(out)[:3])
for i in range(3):
    assert got[i] == hp.pairing(pts1[i], pts2[i]), f"lane {i} mismatch"
print("correctness vs host ate: OK")

t0 = time.time()
iters = 3
for _ in range(iters):
    out = pd.batch_pairing(px, py, qx, qy)
    np.asarray(out[:1])
dt = (time.time() - t0) / iters
print(f"device batch pairing: {N/dt:.1f} pairings/s ({dt*1e3:.0f} ms / {N})")
print(f"host single-thread reference: ~14 pairings/s")
