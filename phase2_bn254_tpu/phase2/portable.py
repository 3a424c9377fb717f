"""Portable (accelerator-free) phase-2 contribute - the analog of the
reference's WASM binding (/root/reference/phase2/src/lib.rs:26-88), which
exposes exactly one function to browser participants:

    contribute(params_bytes, entropy) -> updated params_bytes

Same semantics here: RNG = ChaCha seeded with the first 32 bytes of
Blake2b(entropy) as 8 big-endian u32 words (lib.rs:53-73), params read with
disallow_points_at_infinity=False, checked=True (lib.rs:75), contribution
applied, updated parameters serialized back. Runs entirely on the exact
host layer - no JAX import - so it works anywhere CPython does (the
"runs in a browser" portability story maps to "runs on any box" here).
"""

from __future__ import annotations

import hashlib


def contribute(params: bytes, entropy: bytes) -> tuple[bytes, bytes]:
    """Returns (updated_params_bytes, contribution_hash)."""
    from ..crypto.chacha import ChaChaRng
    from .mpc import MPCParameters

    digest = hashlib.blake2b(entropy).digest()
    rng = ChaChaRng.from_digest_be(digest)

    mp = MPCParameters.read(params, disallow_points_at_infinity=False, checked=True)
    h = mp.contribute(rng)
    return mp.write(), h
