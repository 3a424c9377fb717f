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

BUDGET DISCIPLINE (the driver runs this under an external `timeout`): the
run works against a wall-clock budget (PHASE2_TPU_BENCH_BUDGET_S, default
900 s from process start).  After EVERY completed metric the full current
scoreboard is re-printed as one JSON line on stdout (flushed) — the driver
parses the last JSON line, so even an external kill mid-run leaves a complete
headline + partial board.  Metrics are ordered by value-per-second (headline
first, cheap NTT next, the expensive cold-compile metrics last) and each one
is skipped, with a reason in the board, when its estimated warm-path cost no
longer fits the remaining budget.  Per-kernel cost on the remote axon tunnel
(measured, warm persistent cache): ~90-170 s one-time device init, ~40 s
trace of an unrolled ladder, ~95-145 s executable load even on a compile
cache HIT, so a realistic warm full board is ~10-13 min.
"""

import json
import os
import sys
import tempfile
import time

T_PROC0 = time.time()

BASELINE_G1_MULS_PER_S = 5.0e4
PEAK_LANE_OPS = float(os.environ.get("PHASE2_TPU_PEAK_LANE_OPS", 8 * 128 * 0.94e9))
MULS_PER_G1_EXP = 2150.0  # signed-GLV double ladder (ops/pallas_exp.py)
MULS_PER_G2_EXP = 5000.0  # signed-GLS quad ladder, Fq-mul equivalents
LANE_OPS_PER_MUL = 512.0  # 2 * NLIMBS^2 16x16 products (CIOS)

BUDGET_S = float(os.environ.get("PHASE2_TPU_BENCH_BUDGET_S", 900.0))


def _remaining() -> float:
    return BUDGET_S - (time.time() - T_PROC0)


def _device_watchdog() -> bool:
    """True once the device answers a trivial computation.

    The remote axon TPU tunnel can wedge (every op then hangs forever) and
    recover minutes later; probes retry until ~40% of the budget is burned.
    The first successful op also performs the (90-250 s) one-time backend
    init, so a generous per-probe timeout is the norm, not the exception."""
    import threading

    ok = []

    def probe():
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.ones((8, 8)) * 2)
        ok.append(True)

    deadline = T_PROC0 + min(0.4 * BUDGET_S, 420.0)
    t = threading.Thread(target=probe, daemon=True)
    t.start()
    while time.time() < deadline:
        t.join(min(30.0, max(1.0, deadline - time.time())))
        if ok:
            return True
    return bool(ok)


def _run_with_timeout(fn, timeout_s: float):
    """Run fn in a worker thread; raises TimeoutError if it doesn't finish.

    A tunnel wedge MID-BENCH would otherwise hang the process with the
    scoreboard stuck at whatever was last emitted; the worker thread is
    abandoned (daemon) and the caller stops scheduling further metrics."""
    import threading

    result, error = [], []

    def work():
        try:
            result.append(fn())
        except BaseException as e:  # noqa: BLE001 - reported to the board
            error.append(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if result:
        return result[0]
    if error:
        raise error[0]
    raise TimeoutError(f"metric did not finish within {round(timeout_s)}s (tunnel wedge?)")


def _exp_roofline(pts_per_s, muls_per_exp):
    return round(pts_per_s * muls_per_exp * LANE_OPS_PER_MUL / PEAK_LANE_OPS * 100, 1)


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


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


def main():
    import jax  # noqa: F401

    headline = {
        "metric": "bn254_g1_batch_exp_points_per_s",
        "value": 0,
        "unit": "points/s/chip",
        "vs_baseline": 0,
    }
    metrics = []

    def emit():
        """Re-print the full current board as ONE JSON line (last line wins).

        The driver may kill this process at an unknown external timeout; by
        flushing a complete JSON object after every metric, the scoreboard
        degrades to 'whatever finished so far' instead of parsed:null."""
        headline["metrics"] = metrics
        headline["budget_s"] = BUDGET_S
        headline["elapsed_s"] = round(time.time() - T_PROC0, 1)
        print(json.dumps(headline), flush=True)

    if not _device_watchdog():
        headline["error"] = "device unreachable (axon tunnel wedged; probe timed out)"
        emit()
        return

    hung = []

    def add(name, unit, fn, vs=None, roofline=None, est_cost_s=60.0):
        """Run one metric if it fits the remaining budget; re-emit the board."""
        if hung:
            metrics.append({"name": name, "skipped": "tunnel wedged on an earlier metric"})
            emit()
            return None
        if _remaining() < est_cost_s:
            metrics.append(
                {"name": name, "skipped": f"budget ({round(_remaining())}s left, needs ~{round(est_cost_s)}s)"}
            )
            print(f"# {name} SKIPPED (budget)", file=sys.stderr, flush=True)
            emit()
            return None
        try:
            t0 = time.time()
            value = _run_with_timeout(fn, min(_remaining(), max(est_cost_s * 3.0, 240.0)))
            extra = {}
            if isinstance(value, tuple):
                value, extra["spread_pct"] = value
            entry = {"name": name, "value": round(value, 1), "unit": unit, **extra}
            if vs is not None:
                entry["vs_baseline"] = round(vs(value), 3)
            if roofline is not None:
                entry["pct_of_roofline"] = roofline(value)
            entry["bench_wall_s"] = round(time.time() - t0, 1)
            metrics.append(entry)
            print(f"# {name}: {entry}", file=sys.stderr, flush=True)
            emit()
            return value
        except Exception as e:  # one failed metric must not kill the board
            metrics.append({"name": name, "error": f"{type(e).__name__}: {e}"})
            print(f"# {name} FAILED: {e}", file=sys.stderr, flush=True)
            if isinstance(e, TimeoutError):
                hung.append(name)  # wedged tunnel: stop scheduling metrics
            emit()
            return None

    # --- headline first: g1 batch-exp 2^16, median of 5 reps + spread ---
    v16 = add(
        "g1_batch_exp_2^16",
        "points/s/chip",
        lambda: bench_batch_exp("g1", 16, reps=5),
        vs=lambda v: v / BASELINE_G1_MULS_PER_S,
        roofline=lambda v: _exp_roofline(v, MULS_PER_G1_EXP),
        est_cost_s=60.0,  # always attempt the headline
    )
    if v16:
        headline["value"] = round(v16, 1)
        headline["vs_baseline"] = round(v16 / BASELINE_G1_MULS_PER_S, 3)

    # --- cheap small-program kernels next (fast trace + load) ---
    add("fr_ntt_2^20", "ms", lambda: 1e3 * bench_ntt(20, reps=3), est_cost_s=60.0)
    add("fr_ntt_2^22", "ms", lambda: 1e3 * bench_ntt(22, reps=2), est_cost_s=60.0)
    add("fr_ntt_2^24", "ms", lambda: 1e3 * bench_ntt(24, reps=2), est_cost_s=75.0)
    add(
        "g1_msm_pallas_2^20",
        "points/s/chip",
        lambda: bench_msm(20, reps=2),
        # analytic minimum: 20 windows x 1.5 slot-madds/pt x 13 muls
        roofline=lambda v: round(v * 20 * 1.5 * 13 * LANE_OPS_PER_MUL / PEAK_LANE_OPS * 100, 1),
        est_cost_s=120.0,
    )

    # --- heavyweight unrolled-ladder / multi-kernel metrics last ---
    add(
        "g2_batch_exp_2^16",
        "points/s/chip",
        lambda: bench_batch_exp("g2", 16, reps=3),
        vs=lambda v: 3 * v / BASELINE_G1_MULS_PER_S,  # G2 ~ 3x G1 work
        roofline=lambda v: _exp_roofline(v, MULS_PER_G2_EXP),
        est_cost_s=190.0,
    )
    add(
        "contribute_e2e_size14",
        "s",
        lambda: bench_contribute(14, 1 << 13),
        # reference-equivalent work: (3*2^14 + 2^15) G1 + 2^14 G2 (~3x G1)
        # = 1.31e5 G1-muls => baseline would take that / 5.0e4 seconds
        vs=lambda v: ((3 * (1 << 14) + (1 << 15) + 3 * (1 << 14)) / BASELINE_G1_MULS_PER_S) / v,
        est_cost_s=180.0,
    )
    add(
        # large production chunk shape (full 2^21 as ONE kernel call OOMs
        # the remote compile helper; real ceremonies stream 2^16..2^19
        # chunks - batched_accumulator.rs:1119 equivalent)
        "g1_batch_exp_2^19",
        "points/s/chip",
        lambda: bench_batch_exp("g1", 19, reps=2),
        vs=lambda v: v / BASELINE_G1_MULS_PER_S,
        roofline=lambda v: _exp_roofline(v, MULS_PER_G1_EXP),
        est_cost_s=200.0,
    )

    emit()


if __name__ == "__main__":
    main()
