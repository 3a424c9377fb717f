"""BLS12-381 second-engine tests.

Byte parity is checked against the reference's in-tree serialized test
vectors (/root/reference/pairing/src/bls12_381/tests/*.dat — i*G for
i = 0..999 in each codec, consumed exactly like tests/mod.rs:57-80) and the
RELIC known-answer pairing value (tests/mod.rs:4-55).
"""

import os

import pytest

from phase2_bn254_tpu.bls12_381 import curve, field, pairing
from phase2_bn254_tpu.bls12_381.curve import (
    G1_GEN,
    G2_GEN,
    Point,
    g1_from_compressed,
    g1_from_uncompressed,
    g1_to_compressed,
    g1_to_uncompressed,
    g2_from_compressed,
    g2_from_uncompressed,
    g2_to_compressed,
    g2_to_uncompressed,
    point_zero,
)

VECTOR_DIR = "/root/reference/pairing/src/bls12_381/tests"

needs_vectors = pytest.mark.skipif(
    not os.path.isdir(VECTOR_DIR),
    reason="reference test vectors not mounted",
)


def _run_vectors(path, gen, size, encode, decode, subgroup_stride):
    with open(path, "rb") as f:
        expected = f.read()
    assert len(expected) == 1000 * size
    e = point_zero(gen.group)
    for i in range(1000):
        chunk = expected[i * size : (i + 1) * size]
        assert encode(e) == chunk, f"encoding mismatch at index {i}"
        # cheap decode every time; full subgroup-checked decode on a stride
        # (the subgroup check is a 255-bit scalar mul per point in this exact
        # host layer; the reference does it for all 1000 in native code)
        if i % subgroup_stride == 0:
            assert decode(chunk) == e
        else:
            assert decode(chunk, check=False) == e
        e = e.add(gen)


@needs_vectors
def test_g1_uncompressed_vectors():
    _run_vectors(
        os.path.join(VECTOR_DIR, "g1_uncompressed_valid_test_vectors.dat"),
        G1_GEN, 96, g1_to_uncompressed, g1_from_uncompressed, 100,
    )


@needs_vectors
def test_g1_compressed_vectors():
    _run_vectors(
        os.path.join(VECTOR_DIR, "g1_compressed_valid_test_vectors.dat"),
        G1_GEN, 48, g1_to_compressed, g1_from_compressed, 100,
    )


@needs_vectors
def test_g2_uncompressed_vectors():
    _run_vectors(
        os.path.join(VECTOR_DIR, "g2_uncompressed_valid_test_vectors.dat"),
        G2_GEN, 192, g2_to_uncompressed, g2_from_uncompressed, 250,
    )


@needs_vectors
def test_g2_compressed_vectors():
    _run_vectors(
        os.path.join(VECTOR_DIR, "g2_compressed_valid_test_vectors.dat"),
        G2_GEN, 96, g2_to_compressed, g2_from_compressed, 250,
    )


def test_generators_valid():
    for g in (G1_GEN, G2_GEN):
        assert g.is_on_curve()
        assert g.in_subgroup()
        assert g.mul(field.R_MOD).is_zero()


def test_group_law_consistency():
    p = G1_GEN.mul(123456789)
    q = G1_GEN.mul(987654321)
    assert p.add(q) == q.add(p)
    assert p.add(p) == p.double()
    assert p.add(p.neg()).is_zero()
    assert G1_GEN.mul(5).add(G1_GEN.mul(7)) == G1_GEN.mul(12)
    p2 = G2_GEN.mul(123456789)
    assert p2.add(p2) == p2.double()
    assert G2_GEN.mul(3).add(G2_GEN.mul(4)) == G2_GEN.mul(7)


def test_cofactor_clearing():
    # scaling a random curve point by the cofactor lands in the r-subgroup
    x = 5
    p = None
    while p is None:
        p = curve.get_point_from_x(x, False, "g1")
        x += 1
    cleared = p.scale_by_cofactor()
    assert cleared.is_on_curve()
    assert cleared.in_subgroup()


def test_codec_flag_corruption():
    p = G1_GEN.mul(42)
    unc = bytearray(g1_to_uncompressed(p))
    unc[0] |= 0x80  # compressed bit on uncompressed
    with pytest.raises(ValueError):
        g1_from_uncompressed(bytes(unc))
    comp = bytearray(g1_to_compressed(p))
    comp[0] &= 0x7F  # clear compressed bit
    with pytest.raises(ValueError):
        g1_from_compressed(bytes(comp))
    # malformed infinity: flag set but payload nonzero
    bad_inf = bytes([0xC0]) + bytes(46) + bytes([1])
    with pytest.raises(ValueError):
        g1_from_compressed(bad_inf)
    # coordinate >= q rejected
    too_big = bytearray(g1_to_compressed(p))
    too_big[0] |= 0x1F
    for i in range(1, 48):
        too_big[i] = 0xFF
    with pytest.raises(ValueError):
        g1_from_compressed(bytes(too_big))


def test_frobenius_coefficients_match_reference_table():
    # spot value decoded from fq.rs:109-120 (Montgomery form, R = 2^384)
    limbs = [0xCD03C9E48671F071, 0x5DAB22461FCDA5D2, 0x587042AFD3851B95,
             0x8EB60EBE01BACB9E, 0x03F97D6E83D050D2, 0x18F0206554638741]
    v = 0
    for i, l in enumerate(limbs):
        v |= l << (64 * i)
    v = (v * pow(1 << 384, -1, field.Q)) % field.Q
    coeff = field.FROBENIUS_COEFF_FQ6_C1[1]
    assert coeff.c0 == 0 and coeff.c1 == v


def test_fq2_sqrt_roundtrip():
    a = field.Fq2(1234567, 7654321)
    r = a.square().sqrt()
    assert r is not None and (r == a or r == -a)
    # xi = 1+u is a quadratic non-residue in Fq2 (that is why it can serve as
    # the sextic twist nonresidue): its sqrt must not exist
    assert field.XI.sqrt() is None


def test_pairing_relic_known_answer():
    """tests/mod.rs:4-55 — e(G1, G2) value confirmed against RELIC."""
    e = pairing.pairing(G1_GEN, G2_GEN)
    F2, F6, F12 = field.Fq2, field.Fq6, field.Fq12
    expected = F12(
        F6(
            F2(2819105605953691245277803056322684086884703000473961065716485506033588504203831029066448642358042597501014294104502,
               1323968232986996742571315206151405965104242542339680722164220900812303524334628370163366153839984196298685227734799),
            F2(2987335049721312504428602988447616328830341722376962214011674875969052835043875658579425548512925634040144704192135,
               3879723582452552452538684314479081967502111497413076598816163759028842927668327542875108457755966417881797966271311),
            F2(261508182517997003171385743374653339186059518494239543139839025878870012614975302676296704930880982238308326681253,
               231488992246460459663813598342448669854473942105054381511346786719005883340876032043606739070883099647773793170614),
        ),
        F6(
            F2(3993582095516422658773669068931361134188738159766715576187490305611759126554796569868053818105850661142222948198557,
               1074773511698422344502264006159859710502164045911412750831641680783012525555872467108249271286757399121183508900634),
            F2(2727588299083545686739024317998512740561167011046940249988557419323068809019137624943703910267790601287073339193943,
               493643299814437640914745677854369670041080344349607504656543355799077485536288866009245028091988146107059514546594),
            F2(734401332196641441839439105942623141234148957972407782257355060229193854324927417865401895596108124443575283868655,
               2348330098288556420918672502923664952620152483128593484301759394583320358354186482723629999370241674973832318248497),
        ),
    )
    assert e == expected


def test_pairing_bilinearity():
    e_ab = pairing.pairing(G1_GEN.mul(6), G2_GEN.mul(5))
    e_30 = pairing.pairing(G1_GEN, G2_GEN.mul(30))
    e_base = pairing.pairing(G1_GEN, G2_GEN)
    assert e_ab == e_30
    assert e_ab == e_base.pow(30)
    assert e_base != pairing.FQ12_ONE  # non-degenerate
    # infinity maps to one
    assert pairing.pairing(point_zero("g1"), G2_GEN) == pairing.FQ12_ONE


def test_same_ratio():
    s = 777
    a1, a2 = G1_GEN.mul(3), G1_GEN.mul(3 * s)
    b1, b2 = G2_GEN.mul(11), G2_GEN.mul(11 * s)
    assert pairing.same_ratio((a1, a2), (b1, b2))
    assert not pairing.same_ratio((a1, a2), (b1, b2.add(G2_GEN)))
