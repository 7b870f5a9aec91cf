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
from kzg_tpu.field import fr
from kzg_tpu.ntt import FFTSettings
from kzg_tpu.parallel import fft_sharded, make_mesh

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


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert m.shape["elem"] * m.shape["data"] == 8
    m1 = make_mesh(4, axes=("elem",), shape=(4,))
    assert m1.shape["elem"] == 4
