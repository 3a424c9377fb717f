import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import os, time, tempfile, hashlib
os.chdir(tempfile.mkdtemp())
from phase2_bn254_tpu.cli.phase1 import new_challenge, contribute, verify_transform, participant_rng
from phase2_bn254_tpu.ops.backend import JaxBackend
SIZE, BATCH = 10, 256
t0=time.time()
new_challenge("c1", SIZE, BATCH)
rng = participant_rng("tpu e2e", system_entropy=bytes(1024))
contribute("c1","r1",SIZE,BATCH,rng,backend=JaxBackend())
print("contribute done", round(time.time()-t0,1), "s")
t0=time.time()
verify_transform("c1","r1","c2",SIZE,BATCH,backend=JaxBackend())
print("verify done", round(time.time()-t0,1), "s")
for f in ("c1","r1","c2"):
    print(f, hashlib.blake2b(open(f,'rb').read()).hexdigest()[:32])
