"""SONIC "helped" protocol containers and batch-verification context.

Mirrors /root/reference/bellman/src/sonic/helped/{parameters.rs,batch.rs,
generator.rs}: Proof / SxyAdvice / VerifyingKey / Parameters with the same
byte formats (compressed G1 + big-endian Fr in proofs, uncompressed G2 +
u32-BE counts in keys), the probabilistic pairing `Batch`, and SRS /
parameter generation.
"""

from __future__ import annotations

import secrets
import struct
from dataclasses import dataclass

from ..refimpl import curve as rc
from ..refimpl.field import R_MOD
from ..refimpl.pairing import FQ12_ONE, fq12_mul, pairing
from . import SRS
from .synthesis import (
    NonassigningSynthesizer,
    Preprocess,
    nonassigning_synthesize,
)

NUM_BLINDINGS = 6  # parameters.rs:22


def _read_g1(data: bytes, off: int) -> tuple[rc.Point, int]:
    p = rc.point_from_bytes(data[off : off + 32], "g1", True)
    if p.is_zero():
        raise ValueError("point at infinity in proof")
    return p, off + 32


def _read_fr(data: bytes, off: int) -> tuple[int, int]:
    v = int.from_bytes(data[off : off + 32], "big")
    if v >= R_MOD:
        raise ValueError("Fr not in field")
    if v == 0:
        raise ValueError("field element is zero")
    return v, off + 32


@dataclass
class SxyAdvice:
    """parameters.rs:25-37."""

    s: rc.Point
    opening: rc.Point
    szy: int


@dataclass
class Proof:
    """parameters.rs:40-157."""

    r: rc.Point
    t: rc.Point
    rz: int
    rzy: int
    z_opening: rc.Point
    zy_opening: rc.Point

    def write(self) -> bytes:
        return b"".join(
            [
                rc.point_to_bytes(self.r, True),
                rc.point_to_bytes(self.t, True),
                self.rz.to_bytes(32, "big"),
                self.rzy.to_bytes(32, "big"),
                rc.point_to_bytes(self.z_opening, True),
                rc.point_to_bytes(self.zy_opening, True),
            ]
        )

    @classmethod
    def read(cls, data: bytes) -> "Proof":
        off = 0
        r, off = _read_g1(data, off)
        t, off = _read_g1(data, off)
        rz, off = _read_fr(data, off)
        rzy, off = _read_fr(data, off)
        z_opening, off = _read_g1(data, off)
        zy_opening, off = _read_g1(data, off)
        return cls(r, t, rz, rzy, z_opening, zy_opening)


@dataclass
class VerifyingKey:
    """parameters.rs:159-290."""

    alpha_x: rc.Point
    alpha: rc.Point
    neg_h: rc.Point
    neg_x_n_minus_d: rc.Point
    k_map: list[int]
    n: int
    q: int

    @classmethod
    def new(cls, circuit, srs: SRS, driver=nonassigning_synthesize) -> "VerifyingKey":
        pre = Preprocess()
        driver(pre, circuit)
        return cls(
            alpha_x=srs.h_positive_x_alpha[1],
            alpha=srs.h_positive_x_alpha[0],
            neg_h=srs.h_negative_x[0].neg(),
            neg_x_n_minus_d=srs.h_negative_x[srs.d - pre.n].neg(),
            k_map=pre.k_map,
            n=pre.n,
            q=pre.q,
        )

    def write(self) -> bytes:
        out = [
            rc.point_to_bytes(p, False)
            for p in (self.alpha_x, self.alpha, self.neg_h, self.neg_x_n_minus_d)
        ]
        out.append(struct.pack(">I", len(self.k_map)))
        out += [struct.pack(">I", k) for k in self.k_map]
        out.append(struct.pack(">II", self.n, self.q))
        return b"".join(out)

    @classmethod
    def read(cls, data: bytes) -> "VerifyingKey":
        off = 0
        pts = []
        for _ in range(4):
            pts.append(rc.point_from_bytes(data[off : off + 128], "g2", False))
            off += 128
        (k_len,) = struct.unpack_from(">I", data, off)
        off += 4
        k_map = list(struct.unpack_from(f">{k_len}I", data, off))
        off += 4 * k_len
        n, q = struct.unpack_from(">II", data, off)
        return cls(*pts, k_map, n, q)


@dataclass
class Parameters:
    """parameters.rs:302-381: vk + srs."""

    vk: VerifyingKey
    srs: SRS

    def write(self) -> bytes:
        return self.vk.write() + self.srs.write()

    @classmethod
    def read(cls, data: bytes, checked: bool = True) -> "Parameters":
        vk = VerifyingKey.read(data)
        vk_size = 4 * 128 + 4 + 4 * len(vk.k_map) + 8
        srs = SRS.read(data[vk_size:], checked)
        return cls(vk, srs)


@dataclass
class CircuitParameters:
    """generator.rs:77-86."""

    num_inputs: int
    num_aux: int
    num_constraints: int
    k_map: list[int]
    n: int
    q: int


class Batch:
    """Probabilistic Kate-opening batch (batch.rs:41-168).

    e(P', [alpha x] H) e([-z] P', [alpha] H) = e(P, H) e([-v] G, [alpha] H)
    accumulated over random linear combinations; check_all computes four
    MSMs and a 4-pairing product.
    """

    def __init__(self, srs: SRS = None, n: int = None, vk: VerifyingKey = None):
        if vk is not None:
            self.alpha_x_g2 = vk.alpha_x
            self.alpha_g2 = vk.alpha
            self.neg_h_g2 = vk.neg_h
            self.neg_x_n_minus_d_g2 = vk.neg_x_n_minus_d
            self.g = rc.G1_GEN
        else:
            self.alpha_x_g2 = srs.h_positive_x_alpha[1]
            self.alpha_g2 = srs.h_positive_x_alpha[0]
            self.neg_h_g2 = srs.h_negative_x[0].neg()
            self.neg_x_n_minus_d_g2 = srs.h_negative_x[srs.d - n].neg()
            self.g = srs.g_positive_x[0]
        self.alpha_x: list[tuple[rc.Point, int]] = []
        self.alpha: list[tuple[rc.Point, int]] = []
        self.neg_h: list[tuple[rc.Point, int]] = []
        self.neg_x_n_minus_d: list[tuple[rc.Point, int]] = []
        self.value = 0

    def add_opening(self, p: rc.Point, r: int, point: int) -> None:
        self.alpha_x.append((p, r % R_MOD))
        self.alpha.append((p, (-r * point) % R_MOD))

    def add_commitment(self, p: rc.Point, r: int) -> None:
        self.neg_h.append((p, r % R_MOD))

    def add_commitment_max_n(self, p: rc.Point, r: int) -> None:
        self.neg_x_n_minus_d.append((p, r % R_MOD))

    def add_opening_value(self, r: int, point: int) -> None:
        self.value = (self.value + r * point) % R_MOD

    def check_all(self) -> bool:
        from . import _msm

        # consumed-by-move in the reference (batch.rs check_all(mut self));
        # guard against accidental reuse in Python
        assert not getattr(self, "_consumed", False), "Batch already checked"
        self._consumed = True
        self.alpha.append((self.g, self.value))
        acc = FQ12_ONE
        for terms, g2 in (
            (self.alpha_x, self.alpha_x_g2),
            (self.alpha, self.alpha_g2),
            (self.neg_h, self.neg_h_g2),
            (self.neg_x_n_minus_d, self.neg_x_n_minus_d_g2),
        ):
            g1 = _msm([p for p, _ in terms], [s for _, s in terms])
            if not g1.is_zero():
                acc = fq12_mul(acc, pairing(g1, g2))
        return acc == FQ12_ONE


# ---------------------------------------------------------------------------
# generation (generator.rs)
# ---------------------------------------------------------------------------

def generate_srs(d: int, x: int = None, alpha: int = None) -> SRS:
    """generator.rs:403-456; random x/alpha unless pinned."""
    if x is None:
        x = secrets.randbelow(R_MOD - 2) + 2
    if alpha is None:
        alpha = secrets.randbelow(R_MOD - 2) + 2
    return SRS.new(d, x, alpha)


def get_circuit_parameters(circuit, adapt=True) -> CircuitParameters:
    """Counts inputs/aux/constraints + SONIC (n, q, k_map)
    (generator.rs:231-275). `circuit` is a bellman-style R1CS circuit when
    adapt=True, a native sonic circuit otherwise."""
    from .adaptor import AdaptorCircuit, CountingAdaptor

    pre = Preprocess()
    if adapt:
        counter = CountingAdaptor(NonassigningSynthesizer(pre))
        counter.alloc_one()
        circuit.synthesize(counter)
        return CircuitParameters(
            num_inputs=counter.num_inputs,
            num_aux=counter.num_aux,
            num_constraints=counter.num_constraints,
            k_map=pre.k_map,
            n=pre.n,
            q=pre.q,
        )
    nonassigning_synthesize(pre, circuit)
    return CircuitParameters(0, 0, 0, pre.k_map, pre.n, pre.q)


def get_circuit_parameters_for_succinct_sonic(circuit, adapt=True) -> CircuitParameters:
    """generator.rs:277-318: counts under the M=3 permutation synthesizer
    (the succinct protocol's gate counts differ - ephemeral wires)."""
    from .adaptor import AdaptorCircuit, CountingAdaptor
    from .synthesis import PermutationSynthesizer, permutation3_synthesize

    pre = Preprocess()
    if adapt:
        cs = PermutationSynthesizer(pre)
        counter = CountingAdaptor(cs)
        counter.alloc_one()
        circuit.synthesize(counter)
        return CircuitParameters(
            num_inputs=counter.num_inputs,
            num_aux=counter.num_aux,
            num_constraints=counter.num_constraints,
            k_map=pre.k_map,
            n=pre.n,
            q=pre.q,
        )
    permutation3_synthesize(pre, circuit)
    return CircuitParameters(0, 0, 0, pre.k_map, pre.n, pre.q)


def generate_parameters_on_srs_and_information(srs: SRS,
                                               info: CircuitParameters) -> Parameters:
    """generator.rs:349-401: trim the SRS to min_d = 4n + 2*NUM_BLINDINGS
    and build the verifying key from the counts."""
    min_d = 4 * info.n + 2 * NUM_BLINDINGS
    assert srs.d >= min_d, "SRS too small for the circuit"
    trimmed = SRS(
        d=min_d,
        g_negative_x=srs.g_negative_x[: min_d + 1],
        g_positive_x=srs.g_positive_x[: min_d + 1],
        h_negative_x=srs.h_negative_x[: min_d + 1],
        h_positive_x=srs.h_positive_x[: min_d + 1],
        g_negative_x_alpha=srs.g_negative_x_alpha[:min_d],
        g_positive_x_alpha=srs.g_positive_x_alpha[:min_d],
        h_negative_x_alpha=srs.h_negative_x_alpha[: min_d + 1],
        h_positive_x_alpha=srs.h_positive_x_alpha[: min_d + 1],
    )
    vk = VerifyingKey(
        alpha_x=trimmed.h_positive_x_alpha[1],
        alpha=trimmed.h_positive_x_alpha[0],
        neg_h=trimmed.h_negative_x[0].neg(),
        neg_x_n_minus_d=trimmed.h_negative_x[trimmed.d - info.n].neg(),
        k_map=info.k_map,
        n=info.n,
        q=info.q,
    )
    return Parameters(vk, trimmed)


def generate_parameters(circuit, x: int = None, alpha: int = None,
                        adapt=True) -> Parameters:
    """generator.rs:320-336: auto-sized srs (d = 4n + 2*NUM_BLINDINGS)."""
    info = get_circuit_parameters(circuit, adapt)
    srs = generate_srs(4 * info.n + 2 * NUM_BLINDINGS, x, alpha)
    return generate_parameters_on_srs_and_information(srs, info)


def generate_parameters_on_srs(circuit, srs: SRS, adapt=True) -> Parameters:
    """generator.rs:337-347."""
    info = get_circuit_parameters(circuit, adapt)
    return generate_parameters_on_srs_and_information(srs, info)


def generate_random_parameters(circuit, adapt=True) -> Parameters:
    """generator.rs:58-75 (OS-entropy x/alpha)."""
    return generate_parameters(circuit, adapt=adapt)
