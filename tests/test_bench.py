"""Protocol test for the bench.py parent/worker orchestrator.

Rounds 1-4 each failed to land a full benchmark board (external timeout,
then a tunnel wedge that poisoned the whole process and segfaulted at exit).
The round-5 orchestrator isolates metrics in a killable worker subprocess;
this test drives it through the synthetic PHASE2_TPU_BENCH_SELFTEST registry:
ok -> raising -> hanging-forever (fake wedge) -> ok-after-respawn, and
asserts the board survives all four, the last stdout line parses, and the
process exits 0.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_orchestrator_survives_hang_and_error():
    env = dict(
        os.environ,
        PHASE2_TPU_BENCH_SELFTEST="1",
        PHASE2_TPU_BENCH_MIN_DEADLINE_S="3",
        PHASE2_TPU_BENCH_INIT_S="30",
        PHASE2_TPU_BENCH_BUDGET_S="60",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    board = json.loads(lines[-1])  # the driver parses the LAST line
    by_name = {m["name"]: m for m in board["metrics"]}
    assert by_name["st_ok"]["value"] == 1.0
    assert "boom" in by_name["st_err"]["error"]
    assert "Timeout" in by_name["st_hang"]["error"]
    # the respawned worker still captured the metric AFTER the hang
    assert by_name["st_after"]["value"] == 2.0


def test_budget_skips_everything_cleanly():
    env = dict(
        os.environ,
        PHASE2_TPU_BENCH_SELFTEST="1",
        PHASE2_TPU_BENCH_BUDGET_S="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=60,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    board = json.loads(out.stdout.splitlines()[-1])
    assert all("skipped" in m for m in board["metrics"])
