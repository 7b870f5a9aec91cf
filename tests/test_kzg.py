"""KZG commitment and proof tests.

Mirrors the reference's cross-check strategy (kzg_single_proofs_test.go,
kzg_multi_proofs_test.go): commitments computed two ways must agree, and
proofs must pass/fail the independent pairing check.
"""

import jax.numpy as jnp
import numpy as np

import oracle
from kzg_tpu.curve import g1
from kzg_tpu.field import fr
from kzg_tpu.ntt.fft_fr import fft

MOD = fr.SPEC.modulus
COEFFS = [1, 2, 3, 4, 7, 7, 7, 7, 13, 13, 13, 13, 13, 13, 13, 13]


def test_commit_coeffs_vs_eval(kzg_env):
    fs, ks = kzg_env
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    c1 = ks.commit_to_poly(coeffs)
    evals = fft(fs, coeffs)
    c2 = ks.commit_to_eval_poly(evals)
    assert bool(g1.eq(c1, c2))


def test_commit_matches_host_secret(kzg_env):
    from conftest import TEST_SECRET
    from kzg_tpu.utils import host_ec

    fs, ks = kzg_env
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    commitment = g1.to_affine_ints(ks.commit_to_poly(coeffs))
    ps = oracle.eval_poly(COEFFS, TEST_SECRET % MOD)
    assert commitment == host_ec.g1_mul(host_ec.g1_generator(), ps)


def test_proof_single_valid_and_invalid(kzg_env):
    fs, ks = kzg_env
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    commitment = ks.commit_to_poly(coeffs)
    x = 17
    y = oracle.eval_poly(COEFFS, x)
    proof = ks.compute_proof_single(coeffs, x)
    assert ks.check_proof_single(commitment, proof, x, y)
    assert not ks.check_proof_single(commitment, proof, x, (y + 1) % MOD)


def test_proof_single_methods_agree(kzg_env):
    fs, ks = kzg_env
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    p_auto = ks.compute_proof_single(coeffs, 17)
    p_serial = ks.compute_proof_single(coeffs, 17, method="serial")
    assert bool(g1.eq(p_auto, p_serial))


def test_proof_multi(kzg_env):
    fs, ks = kzg_env
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    commitment = ks.commit_to_poly(coeffs)
    x, m = 5, 4
    w = pow(7, (MOD - 1) // m, MOD)
    ys_int = [
        oracle.eval_poly(COEFFS, x * pow(w, i, MOD) % MOD) for i in range(m)
    ]
    proof = ks.compute_proof_multi(coeffs, x, m)
    ys = jnp.asarray(fr.from_int(ys_int))
    assert ks.check_proof_multi(commitment, proof, x, ys)
    ys_bad = jnp.asarray(
        fr.from_int([(v + 1) % MOD for v in ys_int]))
    assert not ks.check_proof_multi(commitment, proof, x, ys_bad)
