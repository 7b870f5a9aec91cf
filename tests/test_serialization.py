"""Point compression and pairing tests.

The G1 generator golden bytes match the reference's
(bls/bls_test.go:11-23, the standard ZCash-format generator encoding).
"""

import pytest

from kzg_tpu.curve import pairing, serialization
from kzg_tpu.field.constants import FR_MODULUS
from kzg_tpu.utils import host_ec

G1_GEN_COMPRESSED = (
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)


def test_g1_generator_golden_bytes():
    g = host_ec.g1_generator()
    assert serialization.compress_g1(g).hex() == G1_GEN_COMPRESSED
    assert serialization.decompress_g1(
        bytes.fromhex(G1_GEN_COMPRESSED)) == g


def test_g1_roundtrip_points():
    g = host_ec.g1_generator()
    for k in (2, 3, 12345, FR_MODULUS - 1):
        p = host_ec.g1_mul(g, k)
        assert serialization.decompress_g1(serialization.compress_g1(p)) == p


def test_g1_infinity_encoding():
    b = serialization.compress_g1(None)
    assert b[0] == 0xC0 and all(v == 0 for v in b[1:])
    assert serialization.decompress_g1(b) is None


def test_g2_roundtrip():
    g = host_ec.g2_generator()
    assert serialization.decompress_g2(serialization.compress_g2(g)) == g
    p = host_ec.g2_mul(g, 7777)
    assert serialization.decompress_g2(serialization.compress_g2(p)) == p
    assert serialization.decompress_g2(serialization.compress_g2(None)) is None


def test_g1_invalid_rejected():
    with pytest.raises(ValueError):
        serialization.decompress_g1(b"\x00" * 48)  # no compressed flag
    with pytest.raises(ValueError):
        serialization.decompress_g1(b"\xc0" + b"\x01" + b"\x00" * 46)


def _wrong_subgroup_g1():
    """An on-curve G1 point outside the r-order subgroup (the cofactor is
    ~2^125, so a random curve point is essentially never in G1)."""
    from kzg_tpu.field.constants import CURVE_B, FP_MODULUS

    P = FP_MODULUS
    for x in range(1, 100):
        y2 = (pow(x, 3, P) + CURVE_B) % P
        y = pow(y2, (P + 1) // 4, P)
        if y * y % P != y2:
            continue
        pt = (x, y)
        if host_ec.g1_mul(pt, FR_MODULUS) is not None:
            return pt
    raise AssertionError("no wrong-subgroup point found")


def test_g1_wrong_subgroup_rejected():
    """On-curve but wrong-subgroup encodings must be rejected
    (reference: kilic's FromCompressed validates, bls/bls_kilic.go:122-130)."""
    pt = _wrong_subgroup_g1()
    assert not serialization.g1_in_subgroup(pt)
    enc = serialization.compress_g1(pt)
    with pytest.raises(ValueError, match="subgroup"):
        serialization.decompress_g1(enc)
    # the generator itself still passes
    assert serialization.g1_in_subgroup(host_ec.g1_generator())


def test_g2_wrong_subgroup_rejected():
    from kzg_tpu.field.constants import FP_MODULUS
    from kzg_tpu.curve.serialization import _sqrt_fp2

    P = FP_MODULUS
    pt = None
    for xr in range(1, 60):
        x = (xr, 1)
        x0_3 = (x[0] * (x[0] * x[0] - 3 * x[1] * x[1])) % P
        x1_3 = (x[1] * (3 * x[0] * x[0] - x[1] * x[1])) % P
        y = _sqrt_fp2((x0_3 + 4) % P, (x1_3 + 4) % P)
        if y is None:
            continue
        cand = (x, y)
        if host_ec.g2_mul(cand, FR_MODULUS) is not None:
            pt = cand
            break
    assert pt is not None
    assert not serialization.g2_in_subgroup(pt)
    enc = serialization.compress_g2(pt)
    with pytest.raises(ValueError, match="subgroup"):
        serialization.decompress_g2(enc)
    assert serialization.g2_in_subgroup(host_ec.g2_generator())


def test_device_subgroup_check_matches_host():
    import jax.numpy as jnp

    from kzg_tpu.curve import g1 as g1m
    from kzg_tpu.field import fr

    good = g1m.mul(g1m.generator((2,)), jnp.asarray(fr.from_int([3, 19])))
    bad = g1m.from_affine_ints([_wrong_subgroup_g1()])
    import jax

    check = jax.jit(g1m.in_subgroup)
    assert [bool(v) for v in check(good)] == [True, True]
    assert [bool(v) for v in check(bad)] == [False]


def test_pairing_bilinearity():
    g1 = host_ec.g1_generator()
    g2 = host_ec.g2_generator()
    a, b = 5, 7
    # e(aG1, bG2) == e(abG1, G2)
    lhs = pairing.pairing(host_ec.g1_mul(g1, a), host_ec.g2_mul(g2, b))
    rhs = pairing.pairing(host_ec.g1_mul(g1, a * b), g2)
    assert lhs == rhs
    # and pairings_verify sees e(P,Q)e(-P,Q) == 1
    assert pairing.pairings_verify(
        host_ec.g1_mul(g1, a), g2, host_ec.g1_neg(host_ec.g1_mul(g1, a)), g2)
