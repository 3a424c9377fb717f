#!/usr/bin/env python
"""Benchmark scoreboard: every BASELINE.json north-star metric, one JSON line.

Headline metric stays `bn254_g1_batch_exp_points_per_s` at 2^16 (the phase-1
contribute hot loop, /root/reference/powersoftau/src/batched_accumulator.rs:1130-1181);
the `metrics` array carries the full scoreboard:

  * G1/G2 fused-ladder batch exp at 2^16 and the 2^19 production chunk shape
  * Pallas Pippenger MSM at 2^20 (multiexp.rs:521-549 harness analog)
  * Pallas Fr NTT wall-clock at 2^20 / 2^22 / 2^24 (domain.rs:528-552 analog)
  * end-to-end size-14 contribute (file-to-file, hash chain included)

Baseline derivation: the reference computes a full 2^26 powers-of-tau
contribution in ~3 hours on a laptop (/root/reference/powersoftau/README.md:11):
3*2^26 G1 + 2^27 G1 + 2^26 G2 (~3x G1) ~= 5.4e8 G1-equivalent 256-bit scalar
muls in 10800 s => ~5.0e4 G1-muls/s. `vs_baseline` is measured rate over that.

Roofline: v5e VPU ~9.6e11 int32 lane-ops/s (8x128 lanes @ 0.94 GHz); a GLV
G1 exp needs ~2150 mont_muls x 512 lane-ops (scripts/dev/microbench.py:60-82),
a signed-GLS G2 exp ~5000 Fq-mul-equivalents. pct_of_roofline divides the
analytic minimum by measured lane-op throughput.

PROCESS ARCHITECTURE (the lesson of rounds 1-4, all of which failed to land
a full board: r3 rc=124 external timeout, r4 rc=139 segfault after a tunnel
wedge poisoned the whole process):

  * `python bench.py` is a PARENT ORCHESTRATOR that never imports jax. It
    spawns a WORKER subprocess (`bench.py --worker m1,m2,...`) in its own
    session/process-group and relays `@RESULT` lines into the board.
  * If the worker goes silent past a per-metric deadline (the axon tunnel
    wedges: every device op then hangs forever) the parent SIGKILLs the
    worker's WHOLE process group, marks that one metric hung, and respawns
    a FRESH worker for the remaining metrics — a fresh process gets a fresh
    tunnel connection, so one wedge no longer forfeits the rest of the board.
  * The parent re-prints the complete board as one flushed JSON line after
    every event (the driver parses the LAST JSON line) and always exits 0.

BUDGET: wall-clock budget PHASE2_TPU_BENCH_BUDGET_S (default 900 s from
parent start). Metrics are ordered most-important-first and each is skipped,
with a reason on the board, when its estimated warm-path cost no longer fits.
Measured per-kernel costs through the remote axon tunnel (warm persistent
cache): ~90-250 s one-time device init per process, ~40 s trace of an
unrolled ladder, ~95-145 s executable load even on a compile-cache HIT.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

T_PROC0 = float(os.environ.get("PHASE2_TPU_BENCH_T0", time.time()))

BASELINE_G1_MULS_PER_S = 5.0e4
PEAK_LANE_OPS = float(os.environ.get("PHASE2_TPU_PEAK_LANE_OPS", 8 * 128 * 0.94e9))
MULS_PER_G1_EXP = 2150.0  # signed-GLV double ladder (ops/pallas_exp.py)
MULS_PER_G2_EXP = 5000.0  # signed-GLS quad ladder, Fq-mul equivalents
LANE_OPS_PER_MUL = 512.0  # 2 * NLIMBS^2 16x16 products (CIOS)

BUDGET_S = float(os.environ.get("PHASE2_TPU_BENCH_BUDGET_S", 900.0))
INIT_DEADLINE_S = float(os.environ.get("PHASE2_TPU_BENCH_INIT_S", 420.0))
MAX_RESPAWNS = int(os.environ.get("PHASE2_TPU_BENCH_RESPAWNS", 4))


def _remaining() -> float:
    return BUDGET_S - (time.time() - T_PROC0)


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


# --------------------------------------------------------------------------
# metric implementations (run inside the worker process only)
# --------------------------------------------------------------------------


def bench_batch_exp(group: str, log2n: int, reps: int):
    """Fused-ladder pow_mul throughput (the contribute hot loop).

    Returns (median points/s, spread_pct across reps) — the axon tunnel adds
    per-call jitter, so a single rep is not trustworthy (VERDICT r3 #8)."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phase2_bn254_tpu.curve import codecs
    from phase2_bn254_tpu.field import fp
    from phase2_bn254_tpu.ops.backend import CTX_R, _field_ops, _pow_mul_pallas
    from phase2_bn254_tpu.refimpl import curve as rc
    from phase2_bn254_tpu.refimpl.field import R_MOD

    n = 1 << log2n
    random.seed(9)
    gen = rc.G1_GEN if group == "g1" else rc.G2_GEN
    pts = [gen.mul(random.randrange(1, R_MOD)) for _ in range(64)]
    base = codecs.points_to_batch(pts, group)
    reps_tile = n // 64
    batch = jax.tree.map(
        lambda a: jnp.tile(a, (reps_tile,) + (1,) * (a.ndim - 1)), base
    )
    tau = random.randrange(1, R_MOD)
    tau_start = jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(1)))
    tau_pows = jnp.asarray(
        np.stack(
            [fp.int_to_limbs(CTX_R.to_mont_int(pow(tau, 1 << j, R_MOD))) for j in range(log2n)]
        )
    )
    one = jnp.asarray(fp.int_to_limbs(CTX_R.to_mont_int(1)))
    f = _field_ops(group)
    out = _pow_mul_pallas(f, log2n, batch, tau_start, tau_pows, one)
    np.asarray(out.x)  # host pull: the only reliable barrier through axon
    rates = []
    for _ in range(reps):
        t0 = time.time()
        out = _pow_mul_pallas(f, log2n, batch, tau_start, tau_pows, one)
        np.asarray(out.x)
        rates.append(n / (time.time() - t0))
        if _remaining() < 10 and rates:
            break
    med = _median(rates)
    spread = 100.0 * (max(rates) - min(rates)) / med if med else 0.0
    return med, round(spread, 1)


def bench_msm(log2n: int, reps: int):
    """Pallas Pippenger MSM points/s (same-point batch: value checked via
    sum-of-scalars, mildly pessimistic for the wave double branch)."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phase2_bn254_tpu.curve import codecs
    from phase2_bn254_tpu.field import fp
    from phase2_bn254_tpu.ops import pallas_msm
    from phase2_bn254_tpu.ops.backend import _field_ops, _normalize_kernel
    from phase2_bn254_tpu.refimpl import curve as rc
    from phase2_bn254_tpu.refimpl.field import R_MOD

    n = 1 << log2n
    random.seed(11)
    P = rc.G1_GEN.mul(random.randrange(1, R_MOD))
    batch1 = codecs.points_to_batch([P], "g1")
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), batch1)
    scalars = [random.randrange(R_MOD) for _ in range(n)]
    sc = jnp.asarray(np.stack([fp.int_to_limbs(s) for s in scalars]))
    f = _field_ops("g1")

    def run():
        jac = pallas_msm.msm_pallas_or_none("g1", batch, sc)
        assert jac is not None
        aff = _normalize_kernel(f, jax.tree.map(lambda a: a[None], jac))
        np.asarray(aff.x)
        return aff

    aff = run()
    times = []
    for _ in range(reps):
        t0 = time.time()
        aff = run()
        times.append(time.time() - t0)
        if _remaining() < 10:
            break
    got = codecs.batch_to_points(aff, "g1")[0]
    assert got == P.mul(sum(scalars) % R_MOD), "MSM value mismatch"
    return n / _median(times)


def bench_ntt(exp: int, reps: int):
    """Pallas four-step Fr NTT wall-clock (domain.rs:528-552 analog)."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from phase2_bn254_tpu.field import fp
    from phase2_bn254_tpu.ops import ntt as ntt_mod
    from phase2_bn254_tpu.ops.pallas_ntt import ntt_pallas

    import jax

    random.seed(13)
    n = 1 << exp
    vals = np.stack(
        [
            fp.int_to_limbs(ntt_mod.CTX_R.to_mont_int(random.randrange(ntt_mod.CTX_R.p)))
            for _ in range(256)
        ]
    )
    coeffs = jnp.asarray(np.tile(vals, (n // 256, 1)))
    fwd = jax.jit(lambda c: ntt_pallas(exp, c, False))
    out = fwd(coeffs)
    np.asarray(out[:1])
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fwd(coeffs)
        np.asarray(out[:1])
        times.append(time.time() - t0)
        if _remaining() < 10:
            break
    return _median(times)


def bench_contribute(size: int, batch: int):
    """End-to-end file-to-file contribute (new_challenge + timed contribute),
    the compute_constrained.rs:18-237 flow."""
    import contextlib

    from phase2_bn254_tpu.cli import phase1

    d = tempfile.mkdtemp(prefix="bench_contrib_")
    ch = os.path.join(d, "challenge")
    resp = os.path.join(d, "response")
    with contextlib.redirect_stdout(sys.stderr):  # keep stdout = one JSON line
        phase1.new_challenge(ch, size, batch)
        rng = phase1.participant_rng("bench entropy", b"\x07" * 1024)
        phase1.contribute(ch, resp, size, batch, rng)  # warm the compiles
        rng = phase1.participant_rng("bench entropy 2", b"\x09" * 1024)
        t0 = time.time()
        phase1.contribute(ch, resp + ".2", size, batch, rng)
    return time.time() - t0


# --------------------------------------------------------------------------
# metric registry: name -> (est_cost_s, builder of the board entry)
# Ordered most-important-first: each never-yet-captured flagship number
# outranks a cheaper repeat measurement.
# --------------------------------------------------------------------------


def _exp_roofline(pts_per_s, muls_per_exp):
    return round(pts_per_s * muls_per_exp * LANE_OPS_PER_MUL / PEAK_LANE_OPS * 100, 1)


def _entry_batch_exp(name, group, log2n, reps, g2=False):
    value, spread = bench_batch_exp(group, log2n, reps)
    vs = (3 * value if g2 else value) / BASELINE_G1_MULS_PER_S
    return {
        "name": name,
        "value": round(value, 1),
        "unit": "points/s/chip",
        "spread_pct": spread,
        "vs_baseline": round(vs, 3),
        "pct_of_roofline": _exp_roofline(value, MULS_PER_G2_EXP if g2 else MULS_PER_G1_EXP),
    }


def _entry_ntt(name, exp, reps):
    ms = 1e3 * bench_ntt(exp, reps)
    return {"name": name, "value": round(ms, 1), "unit": "ms"}


def _entry_msm(name, log2n, reps):
    v = bench_msm(log2n, reps)
    return {
        "name": name,
        "value": round(v, 1),
        "unit": "points/s/chip",
        # analytic minimum: windows x 1.5 slot-madds/pt x 13 muls
        "pct_of_roofline": round(v * 20 * 1.5 * 13 * LANE_OPS_PER_MUL / PEAK_LANE_OPS * 100, 1),
    }


def _entry_contribute(name, size, batch):
    v = bench_contribute(size, batch)
    # reference-equivalent work: (3*2^14 + 2^15) G1 + 2^14 G2 (~3x G1)
    vs = ((3 * (1 << size) + (1 << (size + 1)) + 3 * (1 << size)) / BASELINE_G1_MULS_PER_S) / v
    return {"name": name, "value": round(v, 1), "unit": "s", "vs_baseline": round(vs, 3)}


METRICS = [
    # (name, est_cost_s, thunk). NTT costs re-measured 2026-08-20 after the
    # rolled-stage kernel fix: trace+compile+first = 64/82/94 s cold at
    # 2^20/22/24 (was 375+ s compile alone - the perennial "NTT wedge").
    ("g1_batch_exp_2^16", 120.0, lambda: _entry_batch_exp("g1_batch_exp_2^16", "g1", 16, reps=5)),
    ("g1_msm_pallas_2^20", 150.0, lambda: _entry_msm("g1_msm_pallas_2^20", 20, reps=2)),
    ("fr_ntt_2^20", 90.0, lambda: _entry_ntt("fr_ntt_2^20", 20, reps=3)),
    ("fr_ntt_2^22", 100.0, lambda: _entry_ntt("fr_ntt_2^22", 22, reps=2)),
    ("fr_ntt_2^24", 120.0, lambda: _entry_ntt("fr_ntt_2^24", 24, reps=2)),
    ("g2_batch_exp_2^16", 190.0, lambda: _entry_batch_exp("g2_batch_exp_2^16", "g2", 16, reps=3, g2=True)),
    # large production chunk shape (full 2^21 as ONE kernel call OOMs the
    # remote compile helper; real ceremonies stream 2^16..2^19 chunks —
    # batched_accumulator.rs:1119 equivalent)
    ("g1_batch_exp_2^19", 200.0, lambda: _entry_batch_exp("g1_batch_exp_2^19", "g1", 19, reps=2)),
    # LAST + honest cost: two full size-14 contributes (one warm-up) run
    # 540+ s even on a warm compile cache; at the driver's default 900 s
    # budget this metric is skipped-with-reason instead of starving the
    # cheaper metrics behind it (r5 final board lesson)
    ("contribute_e2e_size14", 600.0, lambda: _entry_contribute("contribute_e2e_size14", 14, 1 << 13)),
]
if os.environ.get("PHASE2_TPU_BENCH_SELFTEST"):
    # Orchestration self-test (tests/test_bench.py): synthetic metrics that
    # exercise the protocol — ok, raise, hang-forever (fake tunnel wedge),
    # then ok-after-respawn — with no jax import and tiny deadlines.
    def _st_ok(name, v):
        return {"name": name, "value": v, "unit": "widgets"}

    METRICS = [
        ("st_ok", 5.0, lambda: _st_ok("st_ok", 1.0)),
        ("st_err", 5.0, lambda: (_ for _ in ()).throw(ValueError("boom"))),
        ("st_hang", 1.0, lambda: time.sleep(10_000)),
        ("st_after", 5.0, lambda: _st_ok("st_after", 2.0)),
    ]

MIN_DEADLINE_S = float(os.environ.get("PHASE2_TPU_BENCH_MIN_DEADLINE_S", 240.0))
METRIC_BY_NAME = {name: (cost, thunk) for name, cost, thunk in METRICS}


# --------------------------------------------------------------------------
# worker: runs metrics in-process, speaks a line protocol on stdout
# --------------------------------------------------------------------------


def worker_main(names):
    """`bench.py --worker a,b,c`: probe the device, then run each metric.

    Protocol (stdout, line-oriented, flushed):
      @READY                     device answered a trivial op (init done)
      @START <name>              about to run <name>
      @RESULT <json entry>       <name> finished; entry goes on the board
      @ERROR <name> <message>    <name> raised (worker continues)
    Everything else a metric prints goes to stderr. A wedged tunnel makes
    the worker go silent mid-metric; the PARENT owns the deadline and kills
    this whole process group, so no in-process watchdog threads exist here
    (the r4 board died rc=139 from exactly that thread/runtime interplay)."""
    if not os.environ.get("PHASE2_TPU_BENCH_SELFTEST"):
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.ones((8, 8)) * 2)  # one-time backend init + tunnel probe
    print("@READY", flush=True)
    for name in names:
        _, thunk = METRIC_BY_NAME[name]
        print(f"@START {name}", flush=True)
        try:
            entry = thunk()
        except Exception as e:  # noqa: BLE001 — reported to the parent board
            print(f"@ERROR {name} {type(e).__name__}: {e}", flush=True)
            continue
        print(f"@RESULT {json.dumps(entry)}", flush=True)
    print("@DONE", flush=True)


# --------------------------------------------------------------------------
# parent: orchestrates workers, owns the board, always exits 0
# --------------------------------------------------------------------------


class Worker:
    """A bench worker subprocess in its own session (killpg-able)."""

    def __init__(self, names):
        import queue
        import threading

        env = dict(os.environ, PHASE2_TPU_BENCH_T0=str(T_PROC0))
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", ",".join(names)],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            start_new_session=True,
            env=env,
        )
        self.q = queue.Queue()

        def pump(pipe, q):
            for line in pipe:
                q.put(line.rstrip("\n"))
            q.put(None)  # EOF

        self.reader = threading.Thread(target=pump, args=(self.proc.stdout, self.q), daemon=True)
        self.reader.start()

    def next_line(self, timeout_s):
        import queue

        try:
            return self.q.get(timeout=max(0.1, timeout_s))
        except queue.Empty:
            return TimeoutError

    def kill(self):
        try:
            os.killpg(self.proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        try:
            self.proc.wait(timeout=10)
        except Exception:
            pass


def parent_main():
    headline = {
        "metric": "bn254_g1_batch_exp_points_per_s",
        "value": 0,
        "unit": "points/s/chip",
        "vs_baseline": 0,
    }
    board = {}  # name -> entry dict
    order = [name for name, _, _ in METRICS]

    def emit():
        """Re-print the full board as ONE JSON line (the driver keeps the
        last parseable line, so mid-run kills still leave a real board)."""
        headline["metrics"] = [board[n] for n in order if n in board]
        headline["budget_s"] = BUDGET_S
        headline["elapsed_s"] = round(time.time() - T_PROC0, 1)
        print(json.dumps(headline), flush=True)

    def note(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    def record(entry):
        board[entry["name"]] = entry
        if entry["name"] == "g1_batch_exp_2^16" and "value" in entry:
            headline["value"] = entry["value"]
            headline["vs_baseline"] = entry.get("vs_baseline", 0)
        emit()

    pending = list(order)
    respawns = 0
    headline_retried = []
    emit()  # a parseable (if empty) board exists from second zero

    while pending:
        # Drop metrics whose estimated cost no longer fits the budget, but
        # always leave the headline a chance while any budget remains.
        runnable = []
        for name in pending:
            cost = METRIC_BY_NAME[name][0]
            if _remaining() >= cost or (name == order[0] and _remaining() > 30):
                runnable.append(name)
            else:
                board[name] = {
                    "name": name,
                    "skipped": f"budget ({round(_remaining())}s left, needs ~{round(cost)}s)",
                }
                note(f"{name} SKIPPED (budget)")
        pending = runnable
        emit()
        if not pending:
            break
        if respawns > MAX_RESPAWNS:
            for name in pending:
                board[name] = {"name": name, "skipped": "respawn limit after repeated tunnel wedges"}
            emit()
            break

        w = Worker(pending)
        note(f"worker spawned (attempt {respawns + 1}) for: {', '.join(pending)}")
        current = None  # metric the worker is executing right now
        # Phase 1: wait for @READY (device init — 90-250 s through the tunnel)
        deadline = min(INIT_DEADLINE_S, max(30.0, _remaining()))
        t_phase = time.time()
        wedged = False
        while True:
            line = w.next_line(t_phase + deadline - time.time())
            if line is TimeoutError:
                wedged = True
                reason = (
                    f"device init exceeded {round(deadline)}s"
                    if current is None
                    else f"metric exceeded {round(deadline)}s (tunnel wedge)"
                )
                note(f"KILLING worker: {reason}")
                w.kill()
                if current is not None:
                    board[current] = {"name": current, "error": f"TimeoutError: {reason}"}
                    # the headline gets ONE retry in the respawned worker —
                    # it is the only number the driver promotes to the top
                    retry = current == order[0] and not headline_retried
                    if retry:
                        headline_retried.append(True)
                        del board[current]
                    elif current in pending:
                        pending.remove(current)
                    # Same-family metrics (e.g. fr_ntt_2^22 after fr_ntt_2^20
                    # timed out) almost certainly share the root cause: demote
                    # them behind every other family so one bad family can't
                    # burn the whole respawn budget (the r5 warm-run lesson:
                    # three NTT timeouts starved g2/contribute/2^19).
                    fam = current.rsplit("_2^", 1)[0]
                    kept = [m for m in pending if not m.startswith(fam)]
                    demoted = [m for m in pending if m.startswith(fam)]
                    if demoted:
                        note(f"demoting family '{fam}': {', '.join(demoted)}")
                    pending = kept + demoted
                emit()
                break
            if line is None:  # EOF before @DONE: worker crashed (init error,
                # segfault, OOM) — counts as a respawn either way
                rc = w.proc.wait()
                note(f"worker exited rc={rc} before @DONE")
                if current is not None:  # died mid-metric
                    board[current] = {"name": current, "error": f"worker died rc={rc} mid-metric"}
                    if current in pending:
                        pending.remove(current)
                wedged = True
                emit()
                break
            if line == "@READY":
                note(f"device ready after {round(time.time() - T_PROC0, 1)}s")
                t_phase, deadline = time.time(), max(60.0, _remaining())
                continue
            if line.startswith("@START "):
                current = line.split(" ", 1)[1]
                cost = METRIC_BY_NAME[current][0]
                t_phase = time.time()
                deadline = min(max(cost * 3.0, MIN_DEADLINE_S), max(30.0, _remaining() + 30.0))
                continue
            if line.startswith("@RESULT "):
                entry = json.loads(line.split(" ", 1)[1])
                note(f"{entry['name']}: {entry}")
                record(entry)
                if current in pending:
                    pending.remove(current)
                current = None
                continue
            if line.startswith("@ERROR "):
                _, name, msg = line.split(" ", 2)
                board[name] = {"name": name, "error": msg}
                note(f"{name} FAILED: {msg}")
                if name in pending:
                    pending.remove(name)
                current = None
                emit()
                continue
            if line == "@DONE":
                w.kill()  # reap; also guards against wedged atexit hangs
                pending = [n for n in pending if n not in board]
                break
            # any other stdout line from the worker: relay to stderr
            note(f"worker: {line}")
        if wedged:
            respawns += 1

    emit()


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker_main([n for n in sys.argv[2].split(",") if n])
        return
    parent_main()
    # the parent never imports jax; nothing can segfault at interpreter exit


if __name__ == "__main__":
    main()
