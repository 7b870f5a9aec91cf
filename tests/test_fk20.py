"""FK20 amortized proof tests.

Mirrors the reference's cross-checking strategy: FK20 outputs are verified
with the independent pairing checks CheckProofSingle / CheckProofMulti
(fk20_single_test.go:28-43, fk20_multi_test.go:61-90).
"""

import jax.numpy as jnp

import oracle
from kzg_tpu.curve import g1
from kzg_tpu.field import fr
from kzg_tpu.fk20 import FK20MultiSettings, FK20SingleSettings

MOD = fr.SPEC.modulus
COEFFS = [1, 2, 3, 4, 7, 8, 9, 10]
N = 8
N2 = 16


def revbits(v, bits):
    return int(bin(v)[2:].zfill(bits)[::-1], 2) if bits else 0


def test_fk20_single_against_pairing_check(kzg_env):
    fs, ks = kzg_env
    fk = FK20SingleSettings(ks, N2)
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    commitment = ks.commit_to_poly(coeffs)
    proofs = fk.fk20_single(coeffs)
    assert proofs.x.shape[0] == N
    aff = g1.to_affine_ints(proofs)
    w = pow(7, (MOD - 1) // N, MOD)
    for i in (0, 5):
        pt = pow(w, i, MOD)
        y = oracle.eval_poly(COEFFS, pt)
        assert ks.check_proof_single(commitment, aff[i], pt, y)


def test_da_using_fk20_reverse_bit_order(kzg_env):
    fs, ks = kzg_env
    fk = FK20SingleSettings(ks, N2)
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    commitment = ks.commit_to_poly(coeffs)
    proofs = fk.da_using_fk20(coeffs)
    assert proofs.x.shape[0] == N2
    aff = g1.to_affine_ints(proofs)
    w2 = pow(7, (MOD - 1) // N2, MOD)
    i = 5
    pt = pow(w2, revbits(i, 4), MOD)
    y = oracle.eval_poly(COEFFS, pt)
    assert ks.check_proof_single(commitment, aff[i], pt, y)


def test_fk20_multi_against_pairing_check(kzg_env):
    fs, ks = kzg_env
    l = 2
    k = N // l
    fkm = FK20MultiSettings(ks, N2, l)
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    commitment = ks.commit_to_poly(coeffs)
    proofs = fkm.fk20_multi(coeffs)
    assert proofs.x.shape[0] == k
    aff = g1.to_affine_ints(proofs)
    wn = pow(7, (MOD - 1) // N, MOD)
    wl = pow(7, (MOD - 1) // l, MOD)
    j = 1
    x0 = pow(wn, j, MOD)
    ys = jnp.asarray(fr.from_int([
        oracle.eval_poly(COEFFS, x0 * pow(wl, t, MOD) % MOD)
        for t in range(l)
    ]))
    assert ks.check_proof_multi(commitment, aff[j], x0, ys)


def test_da_using_fk20_multi(kzg_env):
    fs, ks = kzg_env
    l = 2
    k2 = N2 // l
    fkm = FK20MultiSettings(ks, N2, l)
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    commitment = ks.commit_to_poly(coeffs)
    proofs = fkm.da_using_fk20_multi(coeffs)
    assert proofs.x.shape[0] == k2
    aff = g1.to_affine_ints(proofs)
    w2n = pow(7, (MOD - 1) // N2, MOD)
    wl = pow(7, (MOD - 1) // l, MOD)
    j = 3
    x0 = pow(w2n, revbits(j, (k2 - 1).bit_length()), MOD)
    ys = jnp.asarray(fr.from_int([
        oracle.eval_poly(COEFFS, x0 * pow(wl, t, MOD) % MOD)
        for t in range(l)
    ]))
    assert ks.check_proof_multi(commitment, aff[j], x0, ys)
