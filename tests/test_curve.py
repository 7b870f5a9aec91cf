"""Curve group tests vs the exact host-side Jacobian oracle.

The aliasing/conformance role of the reference's backend micro-tests
(bls/bignum_test.go) is played here by differential testing against
utils.host_ec over exact Python integers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kzg_tpu.curve import g1, g2
from kzg_tpu.curve.msm import lin_comb_g1, sum_g1
from kzg_tpu.curve.weierstrass import JacobianPoint
from kzg_tpu.field import fr
from kzg_tpu.utils import host_ec

MOD = fr.SPEC.modulus
RNG = np.random.default_rng(33)


def rand_scalars(n):
    return [int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62)) % MOD
            for _ in range(n)]


def test_g1_add_double_vs_host():
    G = host_ec.g1_generator()
    ks = [1, 2, 3, 5, 8]
    pts = g1.mul(g1.generator((5,)), jnp.asarray(fr.from_int(ks)))
    # pairwise adds
    s = g1.add(
        JacobianPoint(pts.x[0:4], pts.y[0:4], pts.z[0:4]),
        JacobianPoint(pts.x[1:5], pts.y[1:5], pts.z[1:5]),
    )
    exp = [host_ec.g1_mul(G, ks[i] + ks[i + 1]) for i in range(4)]
    assert g1.to_affine_ints(s) == exp
    d = g1.double(pts)
    assert g1.to_affine_ints(d) == [host_ec.g1_mul(G, 2 * k) for k in ks]


def test_g1_add_edge_cases():
    G = host_ec.g1_generator()
    p = g1.generator((3,))
    q = JacobianPoint(
        *(jnp.stack([a, b, c]) for a, b, c in zip(
            g1.generator(), g1.neg(g1.generator()), g1.infinity()))
    )
    # P+P (double), P+(-P) (infinity), P+O (P)
    out = g1.add(p, q)
    affs = g1.to_affine_ints(out)
    assert affs[0] == host_ec.g1_mul(G, 2)
    assert affs[1] is None
    assert affs[2] == G


def test_g1_scalar_mul_edges():
    ks = [0, 1, MOD - 1, MOD - 2, 2**255 % MOD]
    pts = g1.mul(g1.generator((5,)), jnp.asarray(fr.from_int(ks)))
    G = host_ec.g1_generator()
    assert g1.to_affine_ints(pts) == [
        None if k == 0 else host_ec.g1_mul(G, k) for k in ks]


def test_g1_windowed_vs_ladder():
    ks = rand_scalars(4)
    sc = jnp.asarray(fr.from_int(ks))
    pts = g1.generator((4,))
    w = g1.ops.scalar_mul(pts, sc)
    l = g1.ops.scalar_mul_ladder(pts, sc)
    assert bool(jnp.all(g1.eq(w, l)))


def test_msm_vs_host():
    ks = rand_scalars(6)
    base = [2, 3, 4, 5, 6, 7]
    pts = g1.mul(g1.generator((6,)), jnp.asarray(fr.from_int(base)))
    msm = lin_comb_g1(pts, jnp.asarray(fr.from_int(ks)))
    total = sum(k * b for k, b in zip(ks, base)) % MOD
    assert g1.to_affine_ints(msm) == host_ec.g1_mul(
        host_ec.g1_generator(), total)
    s = sum_g1(pts)
    assert g1.to_affine_ints(s) == host_ec.g1_mul(
        host_ec.g1_generator(), sum(base))


def test_msm_edge_inputs():
    """Zero scalars and infinity points must drop out of the sum."""
    ks = [0, 5, 0, 7]
    base = [2, 9, 3, 1]
    pts = g1.mul(g1.generator((4,)), jnp.asarray(fr.from_int(base)))
    # make point 3 the infinity point
    inf = g1.infinity()
    pts = JacobianPoint(
        pts.x.at[3].set(jnp.asarray(inf.x)),
        pts.y.at[3].set(jnp.asarray(inf.y)),
        pts.z.at[3].set(jnp.asarray(inf.z)),
    )
    msm = lin_comb_g1(pts, jnp.asarray(fr.from_int(ks)))
    total = 5 * 9  # only index 1 contributes
    assert g1.to_affine_ints(msm) == host_ec.g1_mul(
        host_ec.g1_generator(), total)


def test_msm_batched_scalars():
    """Leading scalar batch dims = independent MSMs over shared points
    (the per-blob commitment layout, eth/helpers.go:165-175)."""
    base = [3, 1, 4, 1, 5, 9, 2, 6]
    pts = g1.mul(g1.generator((8,)), jnp.asarray(fr.from_int(base)))
    ks = np.asarray([rand_scalars(8), rand_scalars(8)])
    msm = lin_comb_g1(pts, jnp.asarray(fr.from_int(ks.tolist())))
    G = host_ec.g1_generator()
    exp = [
        host_ec.g1_mul(G, sum(int(k) * b for k, b in zip(row, base)) % MOD)
        for row in ks
    ]
    assert g1.to_affine_ints(msm) == exp


@pytest.mark.heavy
def test_msm_production_width():
    """2^12-point MSM (the eth commitment width) vs the exact host oracle
    (reference MultiExp sees this width in commit_bench_test.go:12-36)."""
    n = 1 << 12
    rng = np.random.default_rng(7)
    base = [int(rng.integers(1, 2**62)) for _ in range(n)]
    ks = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % MOD
          for _ in range(n)]
    G = host_ec.g1_generator()
    pts_aff = [host_ec.g1_mul(G, b) for b in base]
    pts = g1.from_affine_ints(pts_aff)
    msm = lin_comb_g1(pts, jnp.asarray(fr.from_int(ks)))
    total = sum(k * b for k, b in zip(ks, base)) % MOD
    assert g1.to_affine_ints(msm) == host_ec.g1_mul(G, total)


def test_g2_ops_vs_host():
    H = host_ec.g2_generator()
    ks = [2, 7, 11]
    pts = g2.mul(g2.generator((3,)), jnp.asarray(fr.from_int(ks)))
    assert g2.to_affine_ints(pts) == [host_ec.g2_mul(H, k) for k in ks]
    d = g2.double(pts)
    assert g2.to_affine_ints(d) == [host_ec.g2_mul(H, 2 * k) for k in ks]
    s = g2.add(pts, g2.neg(pts))
    assert g2.to_affine_ints(s) == [None, None, None]


def test_projective_eq():
    p = g1.mul(g1.generator((2,)), jnp.asarray(fr.from_int([5, 5])))
    # same point, different Z scaling after an add round-trip
    q = g1.add(p, g1.infinity((2,)))
    assert bool(jnp.all(g1.eq(p, q)))
    r = g1.mul(g1.generator((2,)), jnp.asarray(fr.from_int([5, 6])))
    assert [bool(v) for v in g1.eq(p, r)] == [True, False]
