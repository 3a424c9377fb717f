import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, tempfile
os.chdir(tempfile.mkdtemp())
from phase2_bn254_tpu.cli.phase1 import new_challenge, contribute, participant_rng
from phase2_bn254_tpu.ops.backend import JaxBackend
SIZE, BATCH = int(os.environ.get("SIZE", 21)), int(os.environ.get("BATCH", 65536))
be = JaxBackend()
new_challenge("c1", SIZE, BATCH)
rng = participant_rng("warmup", system_entropy=bytes(1024))
t0=time.time(); contribute("c1","r1",SIZE,BATCH,rng,backend=be)
print(f"contribute cold: {time.time()-t0:.1f} s")
rng2 = participant_rng("steady", system_entropy=bytes(1024))
t0=time.time(); contribute("c1","r2",SIZE,BATCH,rng2,backend=be)
print(f"contribute 2^{SIZE} steady: {time.time()-t0:.1f} s")
