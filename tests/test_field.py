"""Field-layer conformance tests.

Mirrors the reference's backend conformance suite (bls/bignum_test.go):
aliased-argument safety is free here (functional arrays), so we focus on
agreement with exact Python-int arithmetic, ValidFr boundaries, and the
roots-of-unity table (bls/globals.go:27-60)."""

import numpy as np
import pytest

from kzg_tpu.field import constants, fr, fp, limbs


RNG = np.random.default_rng(1234)


def rand_ints(n, mod):
    return [int.from_bytes(RNG.bytes(48), "little") % mod for _ in range(n)]


@pytest.mark.parametrize("field,mod", [(fr, constants.FR_MODULUS), (fp, constants.FP_MODULUS)])
def test_mul_matches_python_int(field, mod):
    a = rand_ints(64, mod)
    b = rand_ints(64, mod)
    av, bv = field.from_int(a), field.from_int(b)
    got = field.to_int(field.mul(av, bv))
    for x, y, g in zip(a, b, got):
        assert g == x * y % mod


@pytest.mark.parametrize("field,mod", [(fr, constants.FR_MODULUS), (fp, constants.FP_MODULUS)])
def test_add_sub_matches_python_int(field, mod):
    a = rand_ints(64, mod)
    b = rand_ints(64, mod)
    av, bv = field.from_int(a), field.from_int(b)
    got_add = field.to_int(field.add(av, bv))
    got_sub = field.to_int(field.sub(av, bv))
    for x, y, ga, gs in zip(a, b, got_add, got_sub):
        assert ga == (x + y) % mod
        assert gs == (x - y) % mod


def test_edge_values():
    mod = constants.FR_MODULUS
    edge = [0, 1, 2, mod - 1, mod - 2, (mod - 1) // 2, (1 << 255) % mod]
    av = fr.from_int(edge)
    assert list(fr.to_int(fr.add(av, av))) == [(x + x) % mod for x in edge]
    assert list(fr.to_int(fr.mul(av, av))) == [(x * x) % mod for x in edge]
    assert list(fr.to_int(fr.neg(av))) == [(-x) % mod for x in edge]


@pytest.mark.parametrize("field,mod", [(fr, constants.FR_MODULUS), (fp, constants.FP_MODULUS)])
def test_inv(field, mod):
    a = rand_ints(16, mod - 1)
    a = [x + 1 for x in a]  # nonzero
    got = field.to_int(field.inv(field.from_int(a)))
    for x, g in zip(a, got):
        assert g * x % mod == 1


@pytest.mark.parametrize("field,mod", [(fr, constants.FR_MODULUS), (fp, constants.FP_MODULUS)])
def test_batch_inv(field, mod):
    """Montgomery-trick batch inversion == Fermat inverse, with 0 -> 0
    (reference: BatchInvModFr, bls/globals.go:117-124)."""
    a = rand_ints(15, mod - 1)
    a = [x + 1 for x in a] + [0]  # include a zero lane
    arr = field.from_int(a)
    got = field.to_int(field.batch_inv(arr))
    for x, g in zip(a, got):
        assert g * x % mod == (1 if x else 0)
        assert (x != 0) or (g == 0)
    # leading batch dims flatten correctly
    import jax.numpy as jnp

    got2 = field.to_int(field.batch_inv(jnp.asarray(arr).reshape(4, 4, -1)))
    assert [int(v) for v in np.asarray(got2, dtype=object).reshape(-1)] == [
        int(v) for v in got
    ]


def test_div_is_modular():
    # parity with TestDivModFr (bls/bignum_test.go:73-89): division is field
    # division, not integer division
    a, b = 12345, 67890
    mod = constants.FR_MODULUS
    got = int(fr.to_int(fr.div(fr.from_int(a), fr.from_int(b)))[()])
    assert got * b % mod == a


def test_pow_static():
    mod = constants.FR_MODULUS
    a = rand_ints(8, mod)
    for e in [0, 1, 2, 3, 12345, mod - 2]:
        got = fr.to_int(fr.pow_static(fr.from_int(a), e))
        for x, g in zip(a, got):
            assert g == pow(x, e, mod)


def test_roots_of_unity_match_reference_table():
    # reference: bls/globals.go:27-60 (spot-check a few table entries)
    table = {
        1: 52435875175126190479447740508185965837690552500527637822603658699938581184512,
        2: 3465144826073652318776269530687742778270252468765361963008,
        12: 39033254847818212395286706435128746857159659164139250548781411570340225835782,
        31: 34070893824967080313820779135880760772780807222436853681508667398599787661631,
    }
    for k, expected in table.items():
        assert constants.fr_scale2_root_of_unity(k) == expected
    # each is a primitive 2^k-th root
    for k in (1, 2, 12):
        w = constants.fr_scale2_root_of_unity(k)
        assert pow(w, 1 << k, constants.FR_MODULUS) == 1
        assert pow(w, 1 << (k - 1), constants.FR_MODULUS) != 1


def test_valid_fr_boundaries():
    # parity with TestValidFr (bls/bignum_test.go:91-116)
    mod = constants.FR_MODULUS
    assert fr.valid_fr_bytes((mod - 1).to_bytes(32, "little"))
    assert not fr.valid_fr_bytes(mod.to_bytes(32, "little"))
    assert not fr.valid_fr_bytes((mod + 1).to_bytes(32, "little"))
    assert not fr.valid_fr_bytes(b"\xff" * 32)
    assert fr.valid_fr_bytes(b"\x00" * 32)
    assert fr.valid_fr_bytes(b"\xff" * 31 + b"\x00")  # bytes31 always valid


def test_bytes_roundtrip():
    mod = constants.FR_MODULUS
    for x in [0, 1, mod - 1, 1234567890123456789]:
        b = fr.to_bytes32_le(fr.from_int(x))
        assert int.from_bytes(b, "little") == x
        assert int(fr.to_int(fr.from_bytes32_le(b))[()]) == x
    assert fr.from_bytes32_le(mod.to_bytes(32, "little")) is None


def test_scalar_bits():
    x = 0b101101
    bits = np.asarray(fr.scalar_bits(fr.from_int(x)))
    assert bits.shape == (256,)
    got = sum(int(bits[i]) << i for i in range(256))
    assert got == x


def test_mont_roundtrip_and_eq():
    a = fr.from_int([5, 7, 5])
    assert bool(fr.eq(a[0], a[2]))
    assert not bool(fr.eq(a[0], a[1]))
    assert bool(fr.is_zero(fr.from_int(0)))
    assert not bool(fr.is_zero(fr.from_int(3)))
    assert bool(fr.is_one(fr.from_int(1)))


def test_limb_conversions():
    v = 0x1234_5678_9ABC_DEF0_1111_2222
    arr = limbs.int_to_limbs(v, 16)
    assert limbs.limbs_to_int(arr) == v
