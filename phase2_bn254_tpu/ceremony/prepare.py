"""prepare_phase2 and reduce_powers: phase-1 -> phase-2 bridge.

prepare_phase2 (/root/reference/powersoftau/src/bin/prepare_phase2.rs:27-242):
deserializes a compressed response, converts tau-power point vectors into
Lagrange-basis vectors with per-degree inverse group NTTs, computes the
Groth16 H-query bases tau^(i+m) - tau^i, and writes one `phase1radix2m{m}`
file per degree m:

    alpha_g1[0] || beta_g1[0] || beta_g2
    || Lagrange G1 (2^m) || Lagrange G2 (2^m)
    || Lagrange alpha G1 (2^m) || Lagrange beta G1 (2^m)
    || H bases (2^m - 1)           (all uncompressed)

reduce_powers truncates a larger uncompressed challenge to a smaller power
with a `reduced_hash(old, new)` header (reduce_powers.rs:22-131). Note: the
reference binary passes reduced geometry to `deserialize` on the original
file, which mis-addresses every section after TauG1; we read the original
layout correctly instead.
"""

from __future__ import annotations

import os
from typing import BinaryIO

from ..crypto.hashing import calculate_hash, pretty_hash, reduced_hash
from ..refimpl import curve as rc
from .accumulator import _read_elements, _write_elements
from .params import CeremonyParams


def _read_region(fin: BinaryIO, params: CeremonyParams, kind: str, backend, compressed: bool, check: bool):
    """Decode a full element region in batch_size chunks."""
    group = "g2" if kind in ("tau_g2", "beta_g2") else "g1"
    total = params.element_count(kind)
    parts = []
    start = 0
    while start < total:
        size = min(params.batch_size, total - start)
        raw = _read_elements(fin, params, kind, start, size, compressed)
        parts.append(backend.decode(raw, group, size, compressed, check))
        start += size
    return backend.concat(parts) if len(parts) > 1 else parts[0]


def prepare_phase2(
    response_path: str,
    size: int,
    batch: int,
    backend,
    out_dir: str = ".",
    max_degree: int | None = None,
) -> list[str]:
    """Write phase1radix2m{m} files for m in 0..=size. Returns paths.

    Device backends run through the out-of-core path (ceremony/streaming.py):
    regions decoded chunk-wise into host RAM, inverse group NTTs streamed
    through the device one four-step matrix row at a time - domains beyond
    device HBM (2^24+) work on one chip. The exact backend keeps its direct
    in-memory path (it IS the parity oracle)."""
    if getattr(backend, "name", "") != "exact":
        return _prepare_phase2_streamed(
            response_path, size, batch, backend, out_dir, max_degree
        )
    params = CeremonyParams(size, batch)
    if os.path.getsize(response_path) != params.contribution_size:
        raise ValueError("response file has wrong size")

    with open(response_path, "rb") as fin:
        tau_g1 = _read_region(fin, params, "tau_g1", backend, True, True)
        tau_g2 = _read_region(fin, params, "tau_g2", backend, True, True)
        alpha_g1 = _read_region(fin, params, "alpha_g1", backend, True, True)
        beta_g1 = _read_region(fin, params, "beta_g1", backend, True, True)
        raw = _read_elements(fin, params, "beta_g2", 0, 1, True)
        beta_g2_pt = rc.point_from_bytes(raw, "g2", True)

    alpha0 = backend.first_point(alpha_g1)
    beta0 = backend.first_point(beta_g1)

    paths = []
    top = size if max_degree is None else max_degree
    for m in range(top + 1):
        degree = 1 << m
        name = os.path.join(out_dir, f"phase1radix2m{m}")
        lag_g1 = backend.group_intt(backend.slice(tau_g1, 0, degree))
        lag_g2 = backend.group_intt(backend.slice(tau_g2, 0, degree))
        lag_alpha = backend.group_intt(backend.slice(alpha_g1, 0, degree))
        lag_beta = backend.group_intt(backend.slice(beta_g1, 0, degree))
        with open(name, "wb") as w:
            w.write(rc.point_to_bytes(alpha0, False))
            w.write(rc.point_to_bytes(beta0, False))
            w.write(rc.point_to_bytes(beta_g2_pt, False))
            w.write(backend.encode_radix(lag_g1))
            w.write(backend.encode_radix(lag_g2))
            w.write(backend.encode_radix(lag_alpha))
            w.write(backend.encode_radix(lag_beta))
            if degree > 1:
                h = backend.sub_batches(
                    backend.slice(tau_g1, degree, 2 * degree - 1),
                    backend.slice(tau_g1, 0, degree - 1),
                )
                w.write(backend.encode_radix(h))
        paths.append(name)
        print(f"Created {name}")
    return paths


def _read_region_host(fin, params, kind, backend, compressed, check):
    """Decode a full element region chunk-wise into host RAM."""
    import numpy as np

    from .streaming import HostPoints, pointset_to_host

    group = "g2" if kind in ("tau_g2", "beta_g2") else "g1"
    total = params.element_count(kind)
    parts = []
    start = 0
    while start < total:
        size = min(params.batch_size, total - start)
        raw = _read_elements(fin, params, kind, start, size, compressed)
        parts.append(pointset_to_host(backend.decode(raw, group, size, compressed, check)))
        start += size
    return HostPoints(
        np.concatenate([p.x for p in parts]),
        np.concatenate([p.y for p in parts]),
        np.concatenate([p.inf for p in parts]),
        group,
    )


def _prepare_phase2_streamed(response_path, size, batch, backend, out_dir, max_degree):
    import numpy as np

    from ..curve import codecs
    from .streaming import HostPoints, encode_host, group_intt_streamed

    params = CeremonyParams(size, batch)
    if os.path.getsize(response_path) != params.contribution_size:
        raise ValueError("response file has wrong size")

    with open(response_path, "rb") as fin:
        tau_g1 = _read_region_host(fin, params, "tau_g1", backend, True, True)
        tau_g2 = _read_region_host(fin, params, "tau_g2", backend, True, True)
        alpha_g1 = _read_region_host(fin, params, "alpha_g1", backend, True, True)
        beta_g1 = _read_region_host(fin, params, "beta_g1", backend, True, True)
        raw = _read_elements(fin, params, "beta_g2", 0, 1, True)
        beta_g2_pt = rc.point_from_bytes(raw, "g2", True)

    def head_point(hp):
        return codecs.batch_to_points(hp.row(np.arange(1)), hp.group)[0]

    def slice_host(hp, start, stop):
        return HostPoints(hp.x[start:stop], hp.y[start:stop], hp.inf[start:stop], hp.group)

    alpha0 = head_point(alpha_g1)
    beta0 = head_point(beta_g1)

    paths = []
    top = size if max_degree is None else max_degree
    for m in range(top + 1):
        degree = 1 << m
        name = os.path.join(out_dir, f"phase1radix2m{m}")
        lag_g1 = group_intt_streamed(slice_host(tau_g1, 0, degree), m)
        lag_g2 = group_intt_streamed(slice_host(tau_g2, 0, degree), m)
        lag_alpha = group_intt_streamed(slice_host(alpha_g1, 0, degree), m)
        lag_beta = group_intt_streamed(slice_host(beta_g1, 0, degree), m)
        with open(name, "wb") as w:
            w.write(rc.point_to_bytes(alpha0, False))
            w.write(rc.point_to_bytes(beta0, False))
            w.write(rc.point_to_bytes(beta_g2_pt, False))
            w.write(encode_host(lag_g1))
            w.write(encode_host(lag_g2))
            w.write(encode_host(lag_alpha))
            w.write(encode_host(lag_beta))
            if degree > 1:
                # H bases tau^(i+degree) - tau^i, streamed in chunks
                for s in range(0, degree - 1, params.batch_size):
                    e = min(s + params.batch_size, degree - 1)
                    a = backend.from_batch(slice_host(tau_g1, degree + s, degree + e).row(np.arange(e - s)), "g1")
                    b = backend.from_batch(slice_host(tau_g1, s, e).row(np.arange(e - s)), "g1")
                    h = backend.sub_batches(a, b)
                    w.write(backend.encode_radix(h))
        paths.append(name)
        print(f"Created {name}")
    return paths


def reduce_powers(
    challenge_path: str,
    reduced_path: str,
    original_power: int,
    reduced_power: int,
    batch: int,
) -> bytes:
    """Truncate an uncompressed challenge to a smaller power (pure byte
    copying - element regions are prefixes)."""
    orig = CeremonyParams(original_power, batch)
    red = CeremonyParams(reduced_power, batch)
    if os.path.getsize(challenge_path) != orig.accumulator_size:
        raise ValueError("challenge file has wrong size")

    with open(challenge_path, "rb") as fin, open(reduced_path, "wb") as fout:
        fout.truncate(red.accumulator_size)
        fout.seek(0)
        fout.write(reduced_hash(original_power, reduced_power))
        for kind in ("tau_g1", "tau_g2", "alpha_g1", "beta_g1", "beta_g2"):
            raw = _read_elements(fin, orig, kind, 0, red.element_count(kind), False)
            _write_elements(fout, red, kind, 0, raw, False)

    h = calculate_hash(reduced_path)
    print("Reduced contribution hash:")
    print(pretty_hash(h))
    return h
