"""Phase-2 circuit-specific Groth16 MPC: MPCParameters.

Reimplements /root/reference/phase2/src/parameters.rs:81-908 and
keypair.rs:23-115 with bit-identical file formats:

    .params file = bellman Parameters || cs_hash(64) || u32-BE count
                   || contributions (each: delta_after,s,s_delta uncompressed
                   G1; r_delta uncompressed G2; transcript 64B)

The per-contribution bulk work (delta^-1 applied to the H and L queries) runs
on the device backend; transcript hashing, keypairs and pairing-based ratio
checks run on the exact host layer.
"""

from __future__ import annotations

import hashlib
import io
import struct
from dataclasses import dataclass, field as dfield

from ..crypto.chacha import ChaChaRng
from ..groth16.containers import Parameters, VerifyingKey
from ..groth16.cs import KeypairAssembly, LinearCombination, PolynomialDegreeTooLarge, UnconstrainedVariable, Variable
from ..refimpl import curve as rc
from ..refimpl.field import R_MOD
from ..refimpl.pairing import pairing, same_ratio
from ..refimpl.sampling import hash_to_g2, rand_fr, rand_g1


@dataclass
class Phase2PublicKey:
    """phase2/src/keypair.rs:30-47."""

    delta_after: rc.Point
    s: rc.Point
    s_delta: rc.Point
    r_delta: rc.Point
    transcript: bytes  # 64 bytes

    def write(self) -> bytes:
        return (
            rc.point_to_bytes(self.delta_after, False)
            + rc.point_to_bytes(self.s, False)
            + rc.point_to_bytes(self.s_delta, False)
            + rc.point_to_bytes(self.r_delta, False)
            + self.transcript
        )

    @classmethod
    def read(cls, buf) -> "Phase2PublicKey":
        def rd(group):
            size = 64 if group == "g1" else 128
            p = rc.point_from_bytes(buf.read(size), group, False, check=True)
            if p.is_zero():
                raise ValueError("point at infinity in phase2 public key")
            return p

        delta_after = rd("g1")
        s = rd("g1")
        s_delta = rd("g1")
        r_delta = rd("g2")
        transcript = buf.read(64)
        assert len(transcript) == 64
        return cls(delta_after, s, s_delta, r_delta, transcript)

    def __eq__(self, o):
        return (
            isinstance(o, Phase2PublicKey)
            and self.delta_after == o.delta_after
            and self.s == o.s
            and self.s_delta == o.s_delta
            and self.r_delta == o.r_delta
            and self.transcript == o.transcript
        )

    def digest(self) -> bytes:
        return hashlib.blake2b(self.write()).digest()


@dataclass
class MPCParameters:
    params: Parameters
    cs_hash: bytes
    contributions: list[Phase2PublicKey] = dfield(default_factory=list)

    # ------------------------------------------------------------------
    @classmethod
    def new(cls, circuit, should_filter_points_at_infinity: bool, radix_path_for, backend=None) -> "MPCParameters":
        """parameters.rs:99-391. `circuit` has .synthesize(cs);
        `radix_path_for(exp)` -> path of phase1radix2m{exp}.

        With a device `backend`, the per-variable QAP evaluation runs as
        four segmented MSMs on the device (ops/segsum.py) instead of the
        host point-mul loop - bit-identical results, orders of magnitude
        faster for real circuits (reference hot path:
        /root/reference/phase2/src/parameters.rs:225-305)."""
        assembly = KeypairAssembly()
        assembly.alloc_input()  # the "one" variable
        circuit.synthesize(assembly)
        for i in range(assembly.num_inputs):
            assembly.enforce(
                None,
                LinearCombination([(Variable("input", i), 1)]),
                LinearCombination(),
                LinearCombination(),
            )

        m, exp = 1, 0
        while m < assembly.num_constraints:
            m *= 2
            exp += 1
            if exp > 28:
                raise PolynomialDegreeTooLarge()

        with open(radix_path_for(exp), "rb") as f:
            def rd(group):
                size = 64 if group == "g1" else 128
                p = rc.point_from_bytes(f.read(size), group, False, check=False)
                if p.is_zero():
                    raise ValueError("point at infinity in radix file")
                return p

            alpha = rd("g1")
            beta_g1 = rd("g1")
            beta_g2 = rd("g2")
            coeffs_g1 = [rd("g1") for _ in range(m)]
            coeffs_g2 = [rd("g2") for _ in range(m)]
            alpha_coeffs_g1 = [rd("g1") for _ in range(m)]
            beta_coeffs_g1 = [rd("g1") for _ in range(m)]
            h = [rd("g1") for _ in range(m - 1)]

        ninp, naux = assembly.num_inputs, assembly.num_aux

        def eval_section_host(at, bt, ct):
            n = len(at)
            a_g1 = [rc.point_zero("g1")] * n
            b_g1 = [rc.point_zero("g1")] * n
            b_g2 = [rc.point_zero("g2")] * n
            ext = [rc.point_zero("g1")] * n
            for i in range(n):
                for coeff, lag in at[i]:
                    a_g1[i] = a_g1[i].add(coeffs_g1[lag].mul(coeff))
                    ext[i] = ext[i].add(beta_coeffs_g1[lag].mul(coeff))
                for coeff, lag in bt[i]:
                    b_g1[i] = b_g1[i].add(coeffs_g1[lag].mul(coeff))
                    b_g2[i] = b_g2[i].add(coeffs_g2[lag].mul(coeff))
                    ext[i] = ext[i].add(alpha_coeffs_g1[lag].mul(coeff))
                for coeff, lag in ct[i]:
                    ext[i] = ext[i].add(coeffs_g1[lag].mul(coeff))
            return a_g1, b_g1, b_g2, ext

        def eval_section_device(at, bt, ct):
            from ..ops.segsum import segmented_msm

            n = len(at)

            def run(terms_per_var, basis, group):
                pts, scs, segs = [], [], []
                for i, terms in enumerate(terms_per_var):
                    for coeff, lag in terms:
                        pts.append(basis[lag])
                        scs.append(coeff)
                        segs.append(i)
                return segmented_msm(pts, scs, segs, n, group)

            a_g1 = run(at, coeffs_g1, "g1")
            b_g1 = run(bt, coeffs_g1, "g1")
            b_g2 = run(bt, coeffs_g2, "g2")
            # ext[i] = at.beta + bt.alpha + ct.coeffs - three basis vectors;
            # run each matrix separately and add the three segment sums
            e1 = run(at, beta_coeffs_g1, "g1")
            e2 = run(bt, alpha_coeffs_g1, "g1")
            e3 = run(ct, coeffs_g1, "g1")
            ext = [e1[i].add(e2[i]).add(e3[i]) for i in range(n)]
            return a_g1, b_g1, b_g2, ext

        eval_section = eval_section_host if backend is None else eval_section_device

        a_in, b1_in, b2_in, ic = eval_section(
            assembly.at_inputs, assembly.bt_inputs, assembly.ct_inputs
        )
        a_aux, b1_aux, b2_aux, l = eval_section(
            assembly.at_aux, assembly.bt_aux, assembly.ct_aux
        )

        if any(e.is_zero() for e in l):
            raise UnconstrainedVariable()

        a_g1 = a_in + a_aux
        b_g1 = b1_in + b1_aux
        b_g2 = b2_in + b2_aux

        vk = VerifyingKey(
            alpha_g1=alpha,
            beta_g1=beta_g1,
            beta_g2=beta_g2,
            gamma_g2=rc.G2_GEN,
            delta_g1=rc.G1_GEN,
            delta_g2=rc.G2_GEN,
            ic=ic,
        )
        if should_filter_points_at_infinity:
            a_g1 = [e for e in a_g1 if not e.is_zero()]
            b_g1 = [e for e in b_g1 if not e.is_zero()]
            b_g2 = [e for e in b_g2 if not e.is_zero()]
        params = Parameters(vk=vk, h=h, l=l, a=a_g1, b_g1=b_g1, b_g2=b_g2)

        cs_hash = hashlib.blake2b(params.write()).digest()
        return cls(params=params, cs_hash=cs_hash, contributions=[])

    # ------------------------------------------------------------------
    def keypair(self, rng: ChaChaRng) -> tuple[Phase2PublicKey, int]:
        """parameters.rs:860-908; returns (public key, delta)."""
        delta = rand_fr(rng)
        s = rand_g1(rng)
        s_delta = s.mul(delta)

        h = hashlib.blake2b()
        h.update(self.cs_hash)
        for pk in self.contributions:
            h.update(pk.write())
        h.update(rc.point_to_bytes(s, False))
        h.update(rc.point_to_bytes(s_delta, False))
        transcript = h.digest()

        r = hash_to_g2(transcript)
        r_delta = r.mul(delta)
        pub = Phase2PublicKey(
            delta_after=self.params.vk.delta_g1.mul(delta),
            s=s,
            s_delta=s_delta,
            r_delta=r_delta,
            transcript=transcript,
        )
        return pub, delta

    def contribute(self, rng: ChaChaRng, backend=None) -> bytes:
        """parameters.rs:414-521; applies delta^-1 to H and L on device."""
        pubkey, delta = self.keypair(rng)
        delta_inv = pow(delta, -1, R_MOD)

        self.params.l = _batch_exp(self.params.l, delta_inv, backend)
        self.params.h = _batch_exp(self.params.h, delta_inv, backend)
        self.params.vk.delta_g1 = self.params.vk.delta_g1.mul(delta)
        self.params.vk.delta_g2 = self.params.vk.delta_g2.mul(delta)
        self.contributions.append(pubkey)
        return pubkey.digest()

    # ------------------------------------------------------------------
    def verify(self, circuit, should_filter_points_at_infinity: bool, radix_path_for, backend=None) -> list[bytes]:
        """Full re-derivation verify (parameters.rs:529-658)."""
        initial = MPCParameters.new(
            circuit, should_filter_points_at_infinity, radix_path_for, backend=backend
        )
        _check_invariants(initial, self)

        sink = hashlib.blake2b()
        sink.update(initial.cs_hash)
        current_delta = rc.G1_GEN
        result = []
        for pubkey in self.contributions:
            our = sink.copy()
            our.update(rc.point_to_bytes(pubkey.s, False))
            our.update(rc.point_to_bytes(pubkey.s_delta, False))
            sink.update(pubkey.write())
            h = our.digest()
            if pubkey.transcript != h:
                raise ValueError("inconsistent transcript")
            r = hash_to_g2(h)
            if not same_ratio((pubkey.s, pubkey.s_delta), (r, pubkey.r_delta)):
                raise ValueError("invalid phase2 PoK")
            if not same_ratio((current_delta, pubkey.delta_after), (r, pubkey.r_delta)):
                raise ValueError("inconsistent delta change")
            current_delta = pubkey.delta_after
            result.append(pubkey.digest())

        if current_delta != self.params.vk.delta_g1:
            raise ValueError("inconsistent delta_g1")
        if not same_ratio((rc.G1_GEN, current_delta), (rc.G2_GEN, self.params.vk.delta_g2)):
            raise ValueError("inconsistent delta_g2")
        _check_hl_update(initial, self, self.params.vk.delta_g2, rc.G2_GEN, backend)
        return result

    # ------------------------------------------------------------------
    def write(self) -> bytes:
        out = bytearray(self.params.write())
        out += self.cs_hash
        out += struct.pack(">I", len(self.contributions))
        for pk in self.contributions:
            out += pk.write()
        return bytes(out)

    @classmethod
    def read(cls, data: bytes, disallow_points_at_infinity: bool = False, checked: bool = True) -> "MPCParameters":
        buf = io.BytesIO(data)
        params = Parameters.read(buf, disallow_points_at_infinity, checked)
        cs_hash = buf.read(64)
        (n,) = struct.unpack(">I", buf.read(4))
        contributions = [Phase2PublicKey.read(buf) for _ in range(n)]
        return cls(params=params, cs_hash=cs_hash, contributions=contributions)

    def __eq__(self, o):
        return (
            isinstance(o, MPCParameters)
            and self.params == o.params
            and self.cs_hash == o.cs_hash
            and self.contributions == o.contributions
        )


# ---------------------------------------------------------------------------

def _batch_exp(points: list[rc.Point], coeff: int, backend=None) -> list[rc.Point]:
    """All points raised to the same scalar (parameters.rs:424-470)."""
    if not points:
        return []
    if backend is None or getattr(backend, "name", None) == "exact":
        # host path (also for ExactBackend: its from_points returns plain
        # lists, not device PointSets - the CLI passes it when
        # PHASE2_TPU_BACKEND=exact)
        return [p.mul(coeff) for p in points]
    import jax
    import jax.numpy as jnp

    from ..curve import codecs as cd
    from ..curve import group as G
    from ..field import fp
    from ..ops.backend import _field_ops, _next_pow2, _pad_batch

    group = points[0].group
    ps = backend.from_points(points, group)
    target = _next_pow2(ps.n)
    padded = _pad_batch(ps.batch, group, target)
    sc = jnp.broadcast_to(jnp.asarray(fp.int_to_limbs(coeff % R_MOD)), (target, fp.NLIMBS))
    f = _field_ops(group)

    @jax.jit
    def k(b, s):
        return G.jac_normalize(f, G.batch_scalar_mul(f, b, s))

    out = k(padded, sc)
    return cd.batch_to_points(jax.tree.map(lambda a: a[: ps.n], out), group)


def _check_invariants(before: "MPCParameters", after: "MPCParameters"):
    """Shared invariant checks (parameters.rs:536-579 / 741-781)."""
    p, q = before.params, after.params
    if len(p.h) != len(q.h) or len(p.l) != len(q.l):
        raise ValueError("H/L length mismatch")
    if p.a != q.a or p.b_g1 != q.b_g1 or p.b_g2 != q.b_g2:
        raise ValueError("A/B queries changed")
    if (
        p.vk.alpha_g1 != q.vk.alpha_g1
        or p.vk.beta_g1 != q.vk.beta_g1
        or p.vk.beta_g2 != q.vk.beta_g2
        or p.vk.gamma_g2 != q.vk.gamma_g2
    ):
        raise ValueError("alpha/beta/gamma changed")
    if p.vk.ic != q.vk.ic:
        raise ValueError("IC changed")
    if before.cs_hash != after.cs_hash:
        raise ValueError("cs_hash changed")


def _merge_pairs(v1, v2, backend=None):
    """Random-linear-combination pair (phase2/src/utils.rs:59-105)."""
    import secrets

    assert len(v1) == len(v2)
    coeffs = [secrets.randbelow(R_MOD) for _ in range(len(v1))]
    if backend is None:
        from ..refimpl.backend import ExactBackend

        be = ExactBackend()
        return be.msm(v1, coeffs), be.msm(v2, coeffs)
    g = v1[0].group
    return (
        backend.msm(backend.from_points(v1, g), coeffs),
        backend.msm(backend.from_points(v2, g), coeffs),
    )


def _check_hl_update(before, after, delta_g2_num, delta_g2_den, backend=None):
    """H and L must be updated by delta^-1: same_ratio(merge_pairs(h_before,
    h_after), (delta_after_g2, delta_before_g2)) - 'reversed for inverse'."""
    for name, vb, va in (("h", before.params.h, after.params.h), ("l", before.params.l, after.params.l)):
        s, sx = _merge_pairs(vb, va, backend)
        if not same_ratio((s, sx), (delta_g2_num, delta_g2_den)):
            raise ValueError(f"{name} query not updated by delta^-1")


def verify_contribution(before: "MPCParameters", after: "MPCParameters", backend=None) -> bytes:
    """Single-step pairwise check (parameters.rs:726-854)."""
    if len(after.contributions) != len(before.contributions) + 1:
        raise ValueError("exactly one new contribution expected")
    if before.contributions != after.contributions[: len(before.contributions)]:
        raise ValueError("previous contributions changed")
    _check_invariants(before, after)

    sink = hashlib.blake2b()
    sink.update(before.cs_hash)
    for pk in before.contributions:
        sink.update(pk.write())
    pubkey = after.contributions[-1]
    sink.update(rc.point_to_bytes(pubkey.s, False))
    sink.update(rc.point_to_bytes(pubkey.s_delta, False))
    h = sink.digest()
    if pubkey.transcript != h:
        raise ValueError("inconsistent transcript")
    r = hash_to_g2(h)
    if not same_ratio((pubkey.s, pubkey.s_delta), (r, pubkey.r_delta)):
        raise ValueError("invalid phase2 PoK")
    if not same_ratio((before.params.vk.delta_g1, pubkey.delta_after), (r, pubkey.r_delta)):
        raise ValueError("inconsistent delta change")
    if pubkey.delta_after != after.params.vk.delta_g1:
        raise ValueError("inconsistent delta_g1")
    if not same_ratio((rc.G1_GEN, pubkey.delta_after), (rc.G2_GEN, after.params.vk.delta_g2)):
        raise ValueError("inconsistent delta_g2")
    _check_hl_update(before, after, after.params.vk.delta_g2, before.params.vk.delta_g2, backend)
    return pubkey.digest()


def contains_contribution(contributions: list[bytes], my_contribution: bytes) -> bool:
    return any(c == my_contribution for c in contributions)
