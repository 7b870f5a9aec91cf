"""Polynomial primitive tests vs the exact integer oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from kzg_tpu import poly
from kzg_tpu.field import fr
from kzg_tpu.ntt import FFTSettings

MOD = fr.SPEC.modulus
RNG = np.random.default_rng(11)


def rand_ints(n):
    return [int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62)) % MOD
            for _ in range(n)]


def test_eval_poly_horner_and_parallel():
    coeffs_int = rand_ints(13)
    xs_int = rand_ints(4)
    coeffs = jnp.asarray(fr.from_int(coeffs_int))
    xs = jnp.asarray(fr.from_int(xs_int))
    exp = [oracle.eval_poly(coeffs_int, x) for x in xs_int]
    got_h = [int(v) for v in fr.to_int(poly.eval_poly_at(coeffs, xs))]
    assert got_h == exp
    got_p = [
        int(fr.to_int(poly.eval_poly_at_parallel(coeffs, xs[i]))[()])
        for i in range(4)
    ]
    assert got_p == exp


def test_powers_of():
    x = 12345
    got = [int(v) for v in fr.to_int(
        poly.powers_of(jnp.asarray(fr.from_int(x)), 9))]
    assert got == [pow(x, i, MOD) for i in range(9)]


def test_sum_fr_odd_length():
    vals = rand_ints(7)
    got = int(fr.to_int(poly.sum_fr(jnp.asarray(fr.from_int(vals)), axis=0))[()])
    assert got == sum(vals) % MOD


def test_poly_lin_comb():
    polys_int = [rand_ints(8) for _ in range(3)]
    scalars_int = rand_ints(3)
    got = [int(v) for v in fr.to_int(poly.poly_lin_comb(
        jnp.asarray(fr.from_int(polys_int)),
        jnp.asarray(fr.from_int(scalars_int)),
    ))]
    exp = [
        sum(s * p[i] for s, p in zip(scalars_int, polys_int)) % MOD
        for i in range(8)
    ]
    assert got == exp


def test_poly_factor_div_exact():
    # p(x) = (x - z) * q(x) for random q: division must recover q exactly
    z = rand_ints(1)[0]
    q_int = rand_ints(9)
    # p = q * (x - z)
    p_int = [0] * 10
    for i, c in enumerate(q_int):
        p_int[i + 1] = (p_int[i + 1] + c) % MOD
        p_int[i] = (p_int[i] - c * z) % MOD
    got = [int(v) for v in fr.to_int(poly.poly_factor_div(
        jnp.asarray(fr.from_int(p_int)), jnp.asarray(fr.from_int(z))))]
    assert got == q_int


def test_poly_long_div_vs_oracle():
    a_int = rand_ints(12)
    b_int = rand_ints(4)
    got = [int(v) for v in fr.to_int(poly.poly_long_div(
        jnp.asarray(fr.from_int(a_int)), jnp.asarray(fr.from_int(b_int))))]
    # oracle long division
    rem = list(a_int)
    binv = pow(b_int[-1], -1, MOD)
    q = [0] * (len(a_int) - len(b_int) + 1)
    for step in range(len(q)):
        pos = len(a_int) - 1 - step
        qi = rem[pos] * binv % MOD
        q[pos - len(b_int) + 1] = qi
        for j in range(len(b_int)):
            rem[pos - len(b_int) + 1 + j] = (
                rem[pos - len(b_int) + 1 + j] - qi * b_int[j]
            ) % MOD
    assert got == q


def test_quotient_on_domain_matches_factor_div():
    fs = FFTSettings(5)
    coeffs_int = rand_ints(16)
    z = 987123  # not a 16th root of unity
    coeffs = jnp.asarray(fr.from_int(coeffs_int))
    zdev = jnp.asarray(fr.from_int(z))
    q1 = poly.poly_quotient_on_domain(fs, coeffs, zdev)
    # factor division of p - p(z) is exact
    y = oracle.eval_poly(coeffs_int, z)
    shifted = list(coeffs_int)
    shifted[0] = (shifted[0] - y) % MOD
    q2 = poly.poly_factor_div(
        jnp.asarray(fr.from_int(shifted)), zdev)
    assert [int(v) for v in fr.to_int(q1)] == [
        int(v) for v in fr.to_int(q2)]


def test_eval_poly_in_evaluation_form():
    fs = FFTSettings(4)
    coeffs_int = rand_ints(16)
    evals_int = oracle.fft(coeffs_int)
    domain_int = [pow(fs.root_of_unity_int, i, MOD) for i in range(16)]
    x = 777777
    got = int(fr.to_int(poly.eval_poly_in_evaluation_form(
        jnp.asarray(fr.from_int(evals_int)),
        jnp.asarray(fr.from_int(domain_int)),
        jnp.asarray(fr.from_int(x)),
        jnp.asarray(fr.from_int(pow(16, -1, MOD))),
    ))[()])
    assert got == oracle.eval_poly(coeffs_int, x)


def test_eval_poly_in_evaluation_form_on_domain_point():
    fs = FFTSettings(4)
    coeffs_int = rand_ints(16)
    evals_int = oracle.fft(coeffs_int)
    domain_int = [pow(fs.root_of_unity_int, i, MOD) for i in range(16)]
    got = int(fr.to_int(poly.eval_poly_in_evaluation_form(
        jnp.asarray(fr.from_int(evals_int)),
        jnp.asarray(fr.from_int(domain_int)),
        jnp.asarray(fr.from_int(domain_int[5])),
        jnp.asarray(fr.from_int(pow(16, -1, MOD))),
    ))[()])
    assert got == evals_int[5]
