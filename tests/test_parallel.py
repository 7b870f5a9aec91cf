"""Sharded-path tests on the virtual 8-device CPU mesh.

The reference has no distributed code to mirror (SURVEY.md section 2);
these pin down that the explicit-collective implementations are
bit-identical to the single-device kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import oracle
from kzg_tpu.curve import g1
from kzg_tpu.curve.msm import lin_comb_g1
from kzg_tpu.curve.weierstrass import JacobianPoint
from kzg_tpu.field import fr
from kzg_tpu.ntt import FFTSettings
from kzg_tpu.parallel import (
    da_using_fk20_multi_sharded,
    fft_g1_sharded,
    fft_sharded,
    lin_comb_g1_sharded,
    make_mesh,
    reverse_bit_order_g1_sharded,
)

MOD = fr.SPEC.modulus


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8, axes=("elem",), shape=(8,))


def test_fft_sharded_matches_oracle(mesh8):
    fs = FFTSettings(8)
    n = 128
    rng = np.random.default_rng(5)
    vals_int = [int(rng.integers(0, 2**62)) % MOD for _ in range(n)]
    vals = jax.device_put(
        jnp.asarray(fr.from_int(vals_int)),
        NamedSharding(mesh8, P("elem", None)),
    )
    out = fft_sharded(fs, vals, mesh8)
    assert [int(v) for v in fr.to_int(out)] == oracle.fft(vals_int)
    back = fft_sharded(fs, out, mesh8, inverse=True)
    assert [int(v) for v in fr.to_int(back)] == vals_int


def test_fft_sharded_inverse_pallas_backend(mesh8):
    """Regression (round-5 ADVICE): the sharded local IFFT has length
    n/D but must scale by the GLOBAL 1/n; the pallas path used to
    re-derive 1/n_local from the block shape, making distributed inverse
    FFTs wrong by a factor of D. The scale is now a static parameter."""
    from kzg_tpu.field.backend import field_backend, set_field_backend

    fs = FFTSettings(8)
    n = 128
    rng = np.random.default_rng(17)
    vals_int = [int(rng.integers(0, 2**62)) % MOD for _ in range(n)]
    vals = jax.device_put(
        jnp.asarray(fr.from_int(vals_int)),
        NamedSharding(mesh8, P("elem", None)),
    )
    prev = field_backend()
    try:
        set_field_backend("pallas")
        out = fft_sharded(fs, vals, mesh8)
        back = fft_sharded(fs, out, mesh8, inverse=True)
    finally:
        set_field_backend("auto")
    assert [int(v) for v in fr.to_int(out)] == oracle.fft(vals_int)
    assert [int(v) for v in fr.to_int(back)] == vals_int


def test_fft_sharded_single_device_fallback():
    fs = FFTSettings(6)
    mesh1 = make_mesh(1, axes=("elem",), shape=(1,))
    vals_int = list(range(32))
    vals = jnp.asarray(fr.from_int(vals_int))
    out = fft_sharded(fs, vals, mesh1)
    assert [int(v) for v in fr.to_int(out)] == oracle.fft(vals_int)


def test_fft_sharded_rejects_small_local(mesh8):
    fs = FFTSettings(6)
    vals = jnp.asarray(fr.from_int(list(range(16))))  # local=2 < D=8
    with pytest.raises(ValueError):
        fft_sharded(fs, vals, mesh8)


def _sharded_points(mesh, n, seed):
    rng = np.random.default_rng(seed)
    base = [int(rng.integers(1, 2**62)) for _ in range(n)]
    pts = g1.mul(g1.generator((n,)), jnp.asarray(fr.from_int(base)))
    sharding = NamedSharding(mesh, P("elem", None))
    pts = JacobianPoint(*(jax.device_put(c, sharding) for c in pts))
    ks = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % MOD
          for _ in range(n)]
    sc = jax.device_put(jnp.asarray(fr.from_int(ks)), sharding)
    return pts, sc


def test_msm_sharded_matches_single_device(mesh8):
    pts, sc = _sharded_points(mesh8, 32, seed=11)
    out = lin_comb_g1_sharded(pts, sc, mesh8)
    ref = lin_comb_g1(
        JacobianPoint(*(jnp.asarray(c) for c in pts)), jnp.asarray(sc)
    )
    assert bool(g1.eq(out, ref))
    # canonical affine coordinates must agree bit-exactly (the Jacobian
    # representatives may differ: the sharded and single-device paths
    # group the adds differently since tree_reduce scan-folds its tail)
    ax, ay, ainf = g1.ops.to_affine(out)
    bx, by, binf = g1.ops.to_affine(ref)
    assert not bool(ainf) and not bool(binf)
    assert bool(jnp.array_equal(ax, bx)) and bool(jnp.array_equal(ay, by))


def test_msm_sharded_odd_local_count(mesh8):
    """Non-uniform case: local shard size 3 (odd) exercises the
    infinity-padding inside each shard's reduction tree."""
    pts, sc = _sharded_points(mesh8, 24, seed=12)
    out = lin_comb_g1_sharded(pts, sc, mesh8)
    ref = lin_comb_g1(
        JacobianPoint(*(jnp.asarray(c) for c in pts)), jnp.asarray(sc)
    )
    assert bool(g1.eq(out, ref))


def test_msm_sharded_rejects_indivisible(mesh8):
    pts, sc = _sharded_points(mesh8, 8, seed=13)
    bad = JacobianPoint(pts.x[:6], pts.y[:6], pts.z[:6])
    with pytest.raises(ValueError):
        lin_comb_g1_sharded(bad, sc[:6], mesh8)


def test_fft_g1_sharded_matches_single_device(mesh8):
    """Forward and inverse sharded G1 FFT vs the single-device path
    (bit-exact canonical coordinates via projective equality + affine)."""
    from kzg_tpu.curve.fft_g1 import fft_g1

    fs = FFTSettings(6)
    n = 64
    pts, _ = _sharded_points(mesh8, n, seed=21)
    out = fft_g1_sharded(fs, pts, mesh8)
    ref = fft_g1(fs, JacobianPoint(*(jnp.asarray(c) for c in pts)))
    assert bool(jnp.all(g1.eq(out, ref)))
    back = fft_g1_sharded(fs, out, mesh8, inverse=True)
    assert bool(jnp.all(g1.eq(back, JacobianPoint(
        *(jnp.asarray(c) for c in pts)))))


def test_reverse_bit_order_g1_sharded(mesh8):
    from kzg_tpu.curve.fft_g1 import reverse_bit_order_g1

    pts, _ = _sharded_points(mesh8, 64, seed=22)
    out = reverse_bit_order_g1_sharded(pts, mesh8)
    ref = reverse_bit_order_g1(
        JacobianPoint(*(jnp.asarray(c) for c in pts)))
    for a, b in zip(out, ref):
        assert bool(jnp.array_equal(jnp.asarray(a), b))


def test_fk20_sharded_matches_single_device(mesh8):
    """The whole sharded DAUsingFK20Multi pipeline vs one device."""
    from kzg_tpu.fk20.multi import FK20MultiSettings
    from kzg_tpu.kzg.setup import bench_kzg_settings

    n, l = 128, 4
    ks = bench_kzg_settings(n)
    fks = FK20MultiSettings(ks, 2 * n, l)
    rng = np.random.default_rng(23)
    poly = jnp.asarray(fr.from_int(
        [int(rng.integers(0, 2**62)) % MOD for _ in range(n)]))
    ref = fks.da_using_fk20_multi(poly)
    out = da_using_fk20_multi_sharded(fks, poly, mesh8)
    assert out.x.shape[0] == 2 * fks.k
    assert bool(jnp.all(g1.eq(out, ref)))


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert m.shape["elem"] * m.shape["data"] == 8
    m1 = make_mesh(4, axes=("elem",), shape=(4,))
    assert m1.shape["elem"] == 4
