"""BLS12-381 engine (exact host specification layer).

The reference ships BLS12-381 alongside BN256 in its `pairing` crate
(/root/reference/pairing/src/bls12_381/); the ceremony itself only uses
BN256. This package provides the same second engine: fields and towers
(field.py), the G1/G2 group law with the zcash codec conventions (curve.py),
and the optimal ate pairing (pairing.py), all validated against the
reference's in-tree serialized test vectors and the RELIC pairing
known-answer value. Device (JAX/Pallas) kernels for this engine reuse the
limb-generic machinery in phase2_bn254_tpu.field once parameterized for
6x64-bit moduli — see ROADMAP.md.
"""

from . import curve, field, pairing  # noqa: F401
