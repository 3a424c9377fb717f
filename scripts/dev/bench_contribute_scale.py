"""Scale benchmark: full contribute (+ optional verify) at any power.

Usage: python scripts/dev/bench_contribute_scale.py [SIZE] [BATCH] [--verify]

The out-of-core measurement the round asks for: at SIZE=24 the challenge is
~6.1 GB (reference sizing: /root/reference/powersoftau/src/parameters.rs:77-107)
and everything must stream through batch-sized chunks. Prints per-phase wall
clock and G1-equivalent throughput; all device work is synchronized by the
file writes themselves (no tunnel-ack ambiguity).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 24
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
DO_VERIFY = "--verify" in sys.argv

if "--cpu" in sys.argv:
    # JAX_PLATFORMS=cpu in the env is overridden by the axon sitecustomize;
    # only a config update after import actually forces CPU
    import jax

    jax.config.update("jax_platforms", "cpu")

workdir = tempfile.mkdtemp(prefix=f"p2tpu_bench_{SIZE}_")
os.chdir(workdir)
print(f"workdir {workdir}  SIZE={SIZE} BATCH={BATCH}")

from phase2_bn254_tpu.cli.phase1 import (  # noqa: E402
    contribute,
    new_challenge,
    participant_rng,
    verify_transform,
)
from phase2_bn254_tpu.ops.backend import JaxBackend  # noqa: E402

t0 = time.time()
new_challenge("c1", SIZE, BATCH)
t_new = time.time() - t0
print(f"new_challenge: {t_new:.1f} s  ({os.path.getsize('c1') / 1e9:.2f} GB)")

rng = participant_rng(f"bench 2^{SIZE}", system_entropy=bytes(1024))
t0 = time.time()
contribute("c1", "r1", SIZE, BATCH, rng, backend=JaxBackend())
t_con = time.time() - t0
# work: (3*2^n + 2^(n+1)) G1 + 2^n G2 ~ (5 + 3) * 2^n G1-equivalents
g1_equiv = 8 * (1 << SIZE)
print(
    f"contribute 2^{SIZE} wall: {t_con:.1f} s  "
    f"({g1_equiv / t_con:.0f} G1-equiv muls/s; reference laptop ~5.0e4/s)"
)

if DO_VERIFY:
    t0 = time.time()
    verify_transform("c1", "r1", "c2", SIZE, BATCH, backend=JaxBackend())
    t_ver = time.time() - t0
    print(f"verify_transform 2^{SIZE} wall: {t_ver:.1f} s")

print("files:", {f: os.path.getsize(f) for f in os.listdir(".")})
