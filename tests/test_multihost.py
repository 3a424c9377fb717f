"""Two-process jax.distributed execution on CPU (VERDICT r2 item 4).

Spawns 2 worker processes (4 virtual CPU devices each) that join a real
jax.distributed process group via PHASE2_TPU_COORDINATOR, build the global
8-device mesh, and run sharded_pow_mul + sharded_msm through the production
multi-host input path (put_global / gather_host). Asserts the coordinator's
gathered bytes match the exact host computation - the DCN code path
(multi-process mesh construction, cross-host collectives, coordinator-only
output) executed for real, not just scaffolding."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port



def test_two_process_sharded_ops(tmp_path):
    port = _free_port()
    num_procs = 2
    env = dict(os.environ)
    env.pop("PHASE2_TPU_COORDINATOR", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(HERE)
    # workers share the suite's persistent XLA:CPU compile cache (entries are
    # keyed by topology, so the 2-process programs get their own entries)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(HERE, "multihost_worker.py"),
                str(i),
                str(num_procs),
                str(port),
                str(tmp_path),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(num_procs)
    ]
    outs = []
    for p in procs:
        # cold-cache 2-process compiles under a fully loaded xdist session
        # have been observed past 1100 s; warm-cache runs take ~2 min
        out, _ = p.communicate(timeout=2400)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"proc {i} OK" in out

    got = np.load(tmp_path / "result.npz")

    # exact host expectation
    import random

    from phase2_bn254_tpu.curve import codecs
    from phase2_bn254_tpu.refimpl import curve as rc
    from phase2_bn254_tpu.refimpl.field import R_MOD

    random.seed(77)
    n = 16
    pts = [rc.G1_GEN.mul(random.randrange(1, R_MOD)) for _ in range(n)]
    tau = random.randrange(1, R_MOD)
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    expect = [p.mul(pow(tau, 2 + i, R_MOD)) for i, p in enumerate(pts)]
    want = codecs.points_to_batch(expect, "g1")
    assert (got["x"] == np.asarray(want.x)).all()
    assert (got["y"] == np.asarray(want.y)).all()
    assert (got["inf"] == np.asarray(want.inf)).all()

    acc = rc.point_zero("g1")
    for p, s in zip(pts, scalars):
        acc = acc.add(p.mul(s))
    want_msm = codecs.points_to_batch([acc], "g1")
    assert (got["msm_x"] == np.asarray(want_msm.x)).all()
    assert (got["msm_y"] == np.asarray(want_msm.y)).all()
    assert (got["msm_inf"] == np.asarray(want_msm.inf)).all()

    # e2e: the 2-process sharded contribute must be byte-identical to the
    # exact single-process host backend (same deterministic entropy)
    from phase2_bn254_tpu.cli import phase1
    from phase2_bn254_tpu.refimpl.backend import ExactBackend

    ch = tmp_path / "challenge.exact"
    resp = tmp_path / "response.exact"
    phase1.new_challenge(str(ch), 4, 16)
    rng = phase1.participant_rng("mh test", b"\x07" * 1024)
    phase1.contribute(str(ch), str(resp), 4, 16, rng, backend=ExactBackend())
    assert (tmp_path / "challenge").read_bytes() == ch.read_bytes()
    assert (tmp_path / "response").read_bytes() == resp.read_bytes()
    # non-coordinator scratch must be cleaned up
    assert not list(tmp_path.glob("*.scratch"))
