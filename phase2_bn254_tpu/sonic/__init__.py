"""SONIC proof system (/root/reference/bellman/src/sonic/).

Layers (submodules mirror the reference's tree):

* this module - the core everything builds on: `SRS` (srs/srs.rs), the
  Kate/Laurent polynomial commitment scheme (util.rs:75-148, 535-568),
  polynomial utilities (NTT-backed multiply), and the Keccak-256
  Fiat-Shamir `Transcript` (transcript/).
* `cs` / `synthesis` - the A/B/C-wire constraint system, the three
  synthesizers (assigning, nonassigning, M=3 permutation) and standard
  backends (cs/, sonic/constraint_systems.rs, sonic/backends.rs).
* `poly` - SxEval / SyEval partial evaluations of S(X, Y) (helped/poly.rs).
* `helped` / `prover` / `verifier` / `helper` - the helped protocol:
  Proof/SxyAdvice/VerifyingKey/Parameters containers with reference byte
  formats, create_proof / create_advice, the batched MultiVerifier, and
  cross-proof aggregation (helped/).
* `adaptor` - runs bellman-style R1CS circuits (groth16.cs interface) on a
  sonic constraint system (sonic/adaptor.rs).
* `unhelped` - the succinct arguments (signatures of correct computation).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from ..crypto.keccak import keccak256
from ..refimpl import curve as rc
from ..refimpl.field import R_MOD
from ..refimpl.pairing import FQ12_ONE, fq12_mul, pairing


@dataclass
class SRS:
    """sonic/srs/srs.rs:9-115."""

    d: int
    g_negative_x: list  # g^{x^0}, g^{x^-1}, ..., g^{x^-d}
    g_positive_x: list  # g^{x^0}, g^{x^1}, ..., g^{x^d}
    h_negative_x: list
    h_positive_x: list
    g_negative_x_alpha: list  # alpha * (g^{x^-1} ... g^{x^-d})
    g_positive_x_alpha: list
    h_negative_x_alpha: list  # alpha * (h^{x^0} ... h^{x^-d})
    h_positive_x_alpha: list

    @classmethod
    def new(cls, d: int, x: int, alpha: int) -> "SRS":
        x_inv = pow(x, -1, R_MOD)

        def table(gen, cur, step, num):
            out = []
            for _ in range(num):
                out.append(gen.mul(cur))
                cur = (cur * step) % R_MOD
            return out

        g1, g2 = rc.G1_GEN, rc.G2_GEN
        return cls(
            d=d,
            g_negative_x=table(g1, 1, x_inv, d + 1),
            g_positive_x=table(g1, 1, x, d + 1),
            h_negative_x=table(g2, 1, x_inv, d + 1),
            h_positive_x=table(g2, 1, x, d + 1),
            g_negative_x_alpha=table(g1, (x_inv * alpha) % R_MOD, x_inv, d),
            g_positive_x_alpha=table(g1, (x * alpha) % R_MOD, x, d),
            h_negative_x_alpha=table(g2, alpha, x_inv, d + 1),
            h_positive_x_alpha=table(g2, alpha, x, d + 1),
        )

    @classmethod
    def dummy(cls, d: int) -> "SRS":
        g1, g2 = rc.G1_GEN, rc.G2_GEN
        return cls(
            d,
            [g1] * (d + 1), [g1] * (d + 1), [g2] * (d + 1), [g2] * (d + 1),
            [g1] * d, [g1] * d, [g2] * (d + 1), [g2] * (d + 1),
        )

    def write(self) -> bytes:
        out = [struct.pack(">I", self.d)]
        for vec in (
            self.g_negative_x, self.g_positive_x,
            self.h_negative_x, self.h_positive_x,
            self.g_negative_x_alpha, self.g_positive_x_alpha,
            self.h_negative_x_alpha, self.h_positive_x_alpha,
        ):
            out += [rc.point_to_bytes(p, False) for p in vec]
        return b"".join(out)

    @classmethod
    def read(cls, data: bytes, checked: bool = True) -> "SRS":
        (d,) = struct.unpack_from(">I", data, 0)
        off = 4

        def rd(group, num):
            nonlocal off
            size = 64 if group == "g1" else 128
            out = []
            for _ in range(num):
                p = rc.point_from_bytes(data[off : off + size], group, False, check=checked)
                if p.is_zero():
                    raise ValueError("point at infinity in SRS")
                out.append(p)
                off += size
            return out

        return cls(
            d,
            rd("g1", d + 1), rd("g1", d + 1), rd("g2", d + 1), rd("g2", d + 1),
            rd("g1", d), rd("g1", d), rd("g2", d + 1), rd("g2", d + 1),
        )


# ---------------------------------------------------------------------------
# polynomial utilities (sonic/util.rs)
# ---------------------------------------------------------------------------

def kate_division(coeffs: list[int], b: int) -> list[int]:
    """Divide polynomial by (x - b), no remainder (util.rs:444-464)."""
    nb = (-b) % R_MOD
    q = [0] * (len(coeffs) - 1)
    tmp = 0
    for i in range(len(q) - 1, -1, -1):
        lead = (coeffs[i + 1] - tmp) % R_MOD
        q[i] = lead
        tmp = (lead * nb) % R_MOD
    return q


def evaluate_at_consecutive_powers(coeffs: list[int], first: int, base: int) -> int:
    """sum_i coeffs[i] * first * base^i (util.rs:151-200)."""
    acc, cur = 0, first
    for c in coeffs:
        acc = (acc + c * cur) % R_MOD
        cur = (cur * base) % R_MOD
    return acc


def add_polynomials(a: list[int], b: list[int]) -> list[int]:
    assert len(a) == len(b)
    return [(x + y) % R_MOD for x, y in zip(a, b)]


def mul_polynomial_by_scalar(a: list[int], s: int) -> list[int]:
    return [(x * s) % R_MOD for x in a]


def multiply_polynomials(a: list[int], b: list[int]) -> list[int]:
    """Product via the scalar NTT (util.rs:630-659); host fallback for tiny
    inputs."""
    n = len(a) + len(b) - 1
    if n <= 64:
        out = [0] * n
        for i, x in enumerate(a):
            for j, y in enumerate(b):
                out[i + j] = (out[i + j] + x * y) % R_MOD
        return out
    m, exp = 1, 0
    while m < n:
        m *= 2
        exp += 1
    import jax.numpy as jnp
    import numpy as np

    from ..field import fp
    from ..ops import ntt as sntt

    def to_dev(v):
        arr = np.zeros((m, fp.NLIMBS), np.uint32)
        for i, x in enumerate(v):
            arr[i] = fp.int_to_limbs(sntt.CTX_R.to_mont_int(x))
        return jnp.asarray(arr)

    fa = sntt.ntt(exp, to_dev(a), False)
    fb = sntt.ntt(exp, to_dev(b), False)
    prod = fp.mont_mul(sntt.CTX_R, fa, fb)
    res = sntt.ntt(exp, prod, True)
    host = np.asarray(res)
    return [
        sntt.CTX_R.from_mont_int(fp.limbs_to_int(host[i])) for i in range(n)
    ]


# ---------------------------------------------------------------------------
# polynomial commitment scheme (util.rs:75-148, 535-568)
# ---------------------------------------------------------------------------

def _msm(points, scalars):
    """G1 multi-scalar mul: host wNAF-free loop for test sizes, the device
    Pippenger backend above the dispatch threshold (the SONIC provers do
    O(n)-sized commitment MSMs per proof - the TPU hot path for real
    circuits)."""
    import os

    n = len(points)
    if (
        n >= 4096
        and not os.environ.get("PHASE2_TPU_SONIC_HOST_MSM")
    ):
        try:
            import jax

            if jax.default_backend() != "cpu":
                from ..ops.backend import JaxBackend

                backend = JaxBackend()
                return backend.msm(
                    backend.from_points(list(points), "g1"),
                    [s % R_MOD for s in scalars],
                )
        except Exception:
            pass  # fall through to the exact host path
    acc = rc.point_zero("g1")
    for p, s in zip(points, scalars):
        if s % R_MOD:
            acc = acc.add(p.mul(s % R_MOD))
    return acc


def polynomial_commitment(
    max_power: int,
    largest_negative_power: int,
    largest_positive_power: int,
    srs: SRS,
    coeffs: list[int],
) -> rc.Point:
    """util.rs:75-109: commit under the alpha-shifted basis."""
    d = srs.d
    assert max_power >= largest_positive_power
    if d < max_power + largest_negative_power + 1:
        min_power = largest_negative_power + max_power - d
        max_pow = d + largest_positive_power - max_power
        basis = list(reversed(srs.g_negative_x_alpha[:min_power])) + list(
            srs.g_positive_x_alpha[:max_pow]
        )
        return _msm(basis, coeffs)
    return _msm(srs.g_positive_x_alpha[d - max_power - largest_negative_power - 1 :], coeffs)


def polynomial_commitment_opening(
    largest_negative_power: int,
    largest_positive_power: int,
    coeffs: list[int],
    point: int,
    srs: SRS,
) -> rc.Point:
    """util.rs:113-148; `coeffs` MUST already be f(x) - f(z) in Laurent
    layout (index 0 = coefficient of x^-largest_negative_power)."""
    q = kate_division(coeffs, point)
    neg = list(reversed(q[:largest_negative_power]))
    pos = q[largest_negative_power:]
    basis = list(srs.g_negative_x[1 : len(neg) + 1]) + list(srs.g_positive_x[: len(pos)])
    return _msm(basis, neg + pos)


def check_polynomial_commitment(
    commitment: rc.Point,
    point: int,
    value: int,
    opening: rc.Point,
    max_power: int,
    srs: SRS,
) -> bool:
    """util.rs:535-568: e(W, h^{alpha x}) * e(g^v W^{-z}, h^alpha)
    == e(F, h^{x^{d-max}})."""
    if srs.d < max_power:
        return False
    alpha_x = srs.h_positive_x_alpha[1]
    alpha_h = srs.h_positive_x_alpha[0]
    x_n_minus_d = srs.h_negative_x[srs.d - max_power]

    gv = srs.g_positive_x[0].mul(value % R_MOD)
    w_minus_z = opening.mul((-point) % R_MOD)
    gv = gv.add(w_minus_z)

    lhs = fq12_mul(pairing(opening, alpha_x), pairing(gv, alpha_h))
    rhs = pairing(commitment, x_n_minus_d)
    return lhs == rhs


# ---------------------------------------------------------------------------
# Fiat-Shamir transcript (sonic/transcript/)
# ---------------------------------------------------------------------------

class Transcript:
    """Rolling Keccak-256 transcript (transcript/mod.rs:38-120): buffer
    starts as H(personalization); each commit absorbs H(bytes) into the
    running buffer; challenges hash the buffer with a repeat nonce and
    reduce to Fr by rejection-free truncation retry."""

    def __init__(self, personalization: bytes):
        self.buffer = keccak256(personalization)
        self.nonce = 0

    def commit_bytes(self, data: bytes) -> None:
        self.buffer = keccak256(self.buffer + keccak256(data))
        self.nonce = 0

    def commit_point(self, p: rc.Point) -> None:
        self.commit_bytes(rc.point_to_bytes(p, True))

    def commit_scalar(self, s: int) -> None:
        self.commit_bytes((s % R_MOD).to_bytes(32, "little"))

    def get_challenge_scalar(self) -> int:
        while True:
            h = keccak256(self.buffer + struct.pack(">I", self.nonce))
            self.nonce += 1
            v = int.from_bytes(h, "big") >> 2  # shave to < 2^254
            if v < R_MOD:
                return v


# ---------------------------------------------------------------------------
# public API re-exports (submodules; imported last to avoid cycles)
# ---------------------------------------------------------------------------

from .cs import LinearCombination as SonicLinearCombination  # noqa: E402
from .cs import Circuit as SonicCircuit  # noqa: E402
from .synthesis import (  # noqa: E402
    basic_synthesize,
    nonassigning_synthesize,
    permutation3_synthesize,
)
from .helped import (  # noqa: E402
    Batch,
    CircuitParameters,
    Parameters,
    Proof,
    SxyAdvice,
    VerifyingKey,
    generate_parameters,
    generate_parameters_on_srs,
    generate_parameters_on_srs_and_information,
    generate_random_parameters,
    generate_srs,
    get_circuit_parameters,
    get_circuit_parameters_for_succinct_sonic,
)
from .prover import (  # noqa: E402
    create_advice,
    create_advice_on_srs,
    create_proof,
    create_proof_on_srs,
)
from .verifier import (  # noqa: E402
    MultiVerifier,
    verify_aggregate,
    verify_aggregate_on_srs,
    verify_proofs,
    verify_proofs_on_srs,
)
from .helper import Aggregate, create_aggregate, create_aggregate_on_srs  # noqa: E402
from .adaptor import Adaptor, AdaptorCircuit  # noqa: E402
