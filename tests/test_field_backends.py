"""Differential tests between field backends (the analogue of the
reference's per-build-tag CI matrix, .github/workflows/test.yml:5-26).

The Pallas kernel runs in interpreter mode on CPU; on TPU the same kernel
compiles through Mosaic.
"""

import jax.numpy as jnp
import numpy as np

from kzg_tpu.field import fp, fr, limbs
from kzg_tpu.field.backend import field_backend, set_field_backend
from kzg_tpu.field.pallas_mul import mont_mul_pallas

MOD = fr.SPEC.modulus
MODP = fp.SPEC.modulus
RNG = np.random.default_rng(21)


def rand(mod, n):
    return [int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62))
            * int(RNG.integers(0, 2**62)) % mod for _ in range(n)]


def test_backend_registry():
    assert field_backend() in ("vector", "pallas")
    set_field_backend("pallas")
    assert field_backend() == "pallas"
    set_field_backend("vector")
    assert field_backend() == "vector"
    try:
        set_field_backend("nope")
        assert False
    except ValueError:
        pass


def test_pallas_vs_vector_fr():
    xs, ys = rand(MOD, 300), rand(MOD, 300)
    a = jnp.asarray(fr.from_int(xs))
    b = jnp.asarray(fr.from_int(ys))
    vec = limbs.mont_mul(fr.SPEC, a, b)
    pal = mont_mul_pallas(fr.SPEC, a, b, interpret=True)
    assert bool(jnp.all(vec == pal))
    exp = [x * y % MOD for x, y in zip(xs, ys)]
    assert [int(v) for v in fr.to_int(pal)] == exp


def test_pallas_vs_vector_fp():
    xs, ys = rand(MODP, 140), rand(MODP, 140)
    a = jnp.asarray(fp.from_int(xs))
    b = jnp.asarray(fp.from_int(ys))
    vec = limbs.mont_mul(fp.SPEC, a, b)
    pal = mont_mul_pallas(fp.SPEC, a, b, interpret=True)
    assert bool(jnp.all(vec == pal))


def test_pallas_edge_values():
    vals = [0, 1, 2, MOD - 1, MOD - 2, (MOD - 1) // 2]
    a = jnp.asarray(fr.from_int(vals))
    b = jnp.asarray(fr.from_int(list(reversed(vals))))
    pal = mont_mul_pallas(fr.SPEC, a, b, interpret=True)
    exp = [x * y % MOD for x, y in zip(vals, reversed(vals))]
    assert [int(v) for v in fr.to_int(pal)] == exp


def test_pallas_broadcast_and_odd_batch():
    xs = rand(MOD, 7)
    a = jnp.asarray(fr.from_int(xs))
    s = jnp.asarray(fr.from_int(12345))
    pal = mont_mul_pallas(fr.SPEC, a, s, interpret=True)
    assert [int(v) for v in fr.to_int(pal)] == [x * 12345 % MOD for x in xs]
