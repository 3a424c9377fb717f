import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import os, time, tempfile
os.chdir(tempfile.mkdtemp())
from phase2_bn254_tpu.cli.phase1 import new_challenge, contribute, participant_rng
from phase2_bn254_tpu.ops.backend import JaxBackend
SIZE, BATCH = 21, 65536
t0=time.time()
new_challenge("c1", SIZE, BATCH)
print("new done", round(time.time()-t0,1))
rng = participant_rng("bench 2^21", system_entropy=bytes(1024))
t0=time.time()
contribute("c1","r1",SIZE,BATCH,rng,backend=JaxBackend())
dt = time.time()-t0
print(f"contribute 2^21 wall: {dt:.1f} s  (reference ~3h for 2^26 => ~{3*3600/32:.0f} s at 2^21 scale)")
