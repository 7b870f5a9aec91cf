"""Differential tests: fused Pallas G1 engine vs the composed vector path.

Off-TPU the kernels run under the Pallas interpreter inside jit (CPU
correctness tier, mirroring the field-backend conformance suite in
test_field_backends.py). The ladder kernels are compile-heavy in
interpreter mode, so the fast tier keeps digit vectors short; the
full-width ladder and the 33-window GLV butterfly run in the heavy tier
(and on-chip via scripts/tpu_validate_g1.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kzg_tpu.field import fr, fp
from kzg_tpu.curve import g1, glv
from kzg_tpu.curve import pallas_g1 as pg
from kzg_tpu.curve.weierstrass import CurveOps, JacobianPoint

ops = CurveOps(fp, 1)


def _pts(n, seed=7):
    rng = np.random.default_rng(seed)
    ks = [int(x) for x in rng.integers(1, 2**60, n)]
    p = ops.scalar_mul(g1.generator((n,)), jnp.asarray(fr.SPEC.encode(ks)))
    return JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in p))


def _eq_all(a, b):
    return bool(np.asarray(jax.device_get(g1.eq(a, b))).all())


def test_glv_constants():
    """lambda is a cube root of unity mod r; beta the matching one mod p
    (phi(G) == lambda*G on the host oracle)."""
    from kzg_tpu.field.constants import FP_MODULUS, FR_MODULUS
    from kzg_tpu.utils import host_ec

    lam = pg.GLV_LAMBDA
    assert (lam * lam + lam + 1) % FR_MODULUS == 0
    beta = pg.GLV_BETA
    assert pow(beta, 3, FP_MODULUS) == 1 and beta != 1
    G = host_ec.g1_generator()
    lG = host_ec.g1_mul(G, lam)
    assert lG[1] == G[1]
    assert (beta * G[0]) % FP_MODULUS == lG[0]


def test_glv_decompose_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(50):
        k = int.from_bytes(rng.bytes(32), "little") % fr.SPEC.modulus
        k1, k2 = glv.decompose(k)
        assert 0 <= k1 < 2**128 and 0 <= k2 < 2**128
        assert k1 + glv.GLV_LAMBDA * k2 == k
        for half in (k1, k2):
            digs = glv.signed_digits(half)
            assert all(-8 <= d <= 8 for d in digs)
            assert sum(d * 16**j for j, d in enumerate(digs)) == half


def test_double_add_edge_cases():
    n = 8
    pts = _pts(n)
    assert _eq_all(ops.double(pts), pg.double_pallas(pts))
    q = JacobianPoint(pts.x[::-1], pts.y[::-1], pts.z[::-1])
    assert _eq_all(ops.add(pts, q), pg.add_pallas(pts, q))
    # P+P (doubling fallthrough), P+(-P) (infinity), P+O, O+P
    inf = g1.infinity((n - 3,))
    edge_q = JacobianPoint(
        jnp.concatenate([pts.x[:3], inf.x]),
        jnp.concatenate(
            [jnp.stack([pts.y[0], fp.neg(pts.y[1]), pts.y[2]]), inf.y]),
        jnp.concatenate([pts.z[:3], inf.z]),
    )
    assert _eq_all(ops.add(pts, edge_q), pg.add_pallas(pts, edge_q))
    assert _eq_all(ops.add(edge_q, pts), pg.add_pallas(edge_q, pts))


def test_scalar_mul_short_ladder():
    """8-window signed-digit ladder vs the vector path (covers negative
    digits, zero digits, and the table build)."""
    n = 8
    pts = _pts(n)
    rng = np.random.default_rng(11)
    sc_ints = [int(x) for x in rng.integers(0, 16**7 * 8, n)]
    sc_ints[0] = 0  # k = 0 -> infinity
    dig = np.stack(
        [glv.signed_digits(k, 8) for k in sc_ints]).astype(np.int32)
    m_ref = ops.scalar_mul(pts, jnp.asarray(fr.SPEC.encode(sc_ints)))
    m_pal = pg.scalar_mul_pallas(pts, jnp.asarray(dig))
    assert _eq_all(m_ref, m_pal)


@pytest.mark.heavy
def test_scalar_mul_full_width():
    n = 8
    pts = _pts(n)
    rng = np.random.default_rng(13)
    sc_ints = [
        int.from_bytes(rng.bytes(32), "little") % fr.SPEC.modulus
        for _ in range(n)
    ]
    sc = jnp.asarray(fr.SPEC.encode(sc_ints))
    m_ref = ops.scalar_mul(pts, sc)
    m_pal = pg.scalar_mul_pallas(pts, fr.scalar_windows_signed(sc))
    assert _eq_all(m_ref, m_pal)


@pytest.mark.heavy
def test_glv_butterfly():
    n = 8
    pts = _pts(n)
    q = JacobianPoint(pts.x[::-1], pts.y[::-1], pts.z[::-1])
    rng = np.random.default_rng(17)
    tws = [
        int.from_bytes(rng.bytes(32), "little") % fr.SPEC.modulus
        for _ in range(n)
    ]
    d1, d2 = glv.twiddle_digits(tws)
    t_ref = ops.scalar_mul(q, jnp.asarray(fr.SPEC.encode(tws)))
    lo_ref, hi_ref = ops.add(pts, t_ref), ops.sub(pts, t_ref)
    lo, hi = pg.butterfly_glv_pallas(
        pts, q, jnp.asarray(d1), jnp.asarray(d2))
    assert _eq_all(lo_ref, lo)
    assert _eq_all(hi_ref, hi)
