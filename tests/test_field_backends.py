"""Differential tests between field backends (the analogue of the
reference's per-build-tag CI matrix, .github/workflows/test.yml:5-26).

The Pallas kernels run in interpreter mode on CPU; on TPU the same
kernels compile through Mosaic (benchmarked in BENCH_TPU.md: ~21x the
vector path for mont_mul at 32k elements, bit-identical).
"""

import jax.numpy as jnp
import numpy as np

from kzg_tpu.field import fp, fr, limbs
from kzg_tpu.field.backend import field_backend, set_field_backend
from kzg_tpu.field.pallas_kernels import butterfly_pallas, mont_mul_pallas

MOD = fr.SPEC.modulus
MODP = fp.SPEC.modulus
RNG = np.random.default_rng(21)


def rand(mod, n):
    return [int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62))
            * int(RNG.integers(0, 2**62)) % mod for _ in range(n)]


def test_backend_registry():
    prev = field_backend()
    assert prev in ("vector", "pallas")
    set_field_backend("pallas")
    assert field_backend() == "pallas"
    set_field_backend("vector")
    assert field_backend() == "vector"
    try:
        set_field_backend("nope")
        assert False
    except ValueError:
        pass
    set_field_backend("auto")


def test_pallas_vs_vector_fr():
    xs, ys = rand(MOD, 300), rand(MOD, 300)
    a = jnp.asarray(fr.from_int(xs))
    b = jnp.asarray(fr.from_int(ys))
    vec = limbs.mont_mul(fr.SPEC, a, b)
    pal = mont_mul_pallas(fr.SPEC, a, b)
    assert bool(jnp.all(vec == pal))
    exp = [x * y % MOD for x, y in zip(xs, ys)]
    assert [int(v) for v in fr.to_int(pal)] == exp


def test_pallas_vs_vector_fp():
    xs, ys = rand(MODP, 140), rand(MODP, 140)
    a = jnp.asarray(fp.from_int(xs))
    b = jnp.asarray(fp.from_int(ys))
    vec = limbs.mont_mul(fp.SPEC, a, b)
    pal = mont_mul_pallas(fp.SPEC, a, b)
    assert bool(jnp.all(vec == pal))


def test_pallas_edge_values():
    vals = [0, 1, 2, MOD - 1, MOD - 2, (MOD - 1) // 2]
    a = jnp.asarray(fr.from_int(vals))
    b = jnp.asarray(fr.from_int(list(reversed(vals))))
    pal = mont_mul_pallas(fr.SPEC, a, b)
    exp = [x * y % MOD for x, y in zip(vals, reversed(vals))]
    assert [int(v) for v in fr.to_int(pal)] == exp


def test_pallas_broadcast_and_odd_batch():
    xs = rand(MOD, 7)
    a = jnp.asarray(fr.from_int(xs))
    s = jnp.asarray(fr.from_int(12345))
    pal = mont_mul_pallas(fr.SPEC, a, s)
    assert [int(v) for v in fr.to_int(pal)] == [x * 12345 % MOD for x in xs]


def test_pallas_butterfly():
    """Fused (a + tw*b, a - tw*b) matches the composed vector ops."""
    xs, ys, ts = rand(MOD, 200), rand(MOD, 200), rand(MOD, 200)
    a = jnp.asarray(fr.from_int(xs))
    b = jnp.asarray(fr.from_int(ys))
    tw = jnp.asarray(fr.from_int(ts))
    hi, lo = butterfly_pallas(fr.SPEC, a, b, tw)
    t = limbs.mont_mul(fr.SPEC, b, tw)
    assert bool(jnp.all(hi == limbs.add(fr.SPEC, a, t)))
    assert bool(jnp.all(lo == limbs.sub(fr.SPEC, a, t)))
    exp_hi = [(x + t_ * y) % MOD for x, y, t_ in zip(xs, ys, ts)]
    assert [int(v) for v in fr.to_int(hi)] == exp_hi


def test_pallas_das_extension_matches_vector():
    """The half-FFT extension pipeline (reference recursion,
    das_extension.go:7-66, as lazy DIF down-sweep + DIT up-sweep) must
    be bit-identical to the algebraic IFFT+FFT vector path. Sizes cover
    the reduce_hi boundary (n=64: 6 down levels)."""
    from kzg_tpu.ntt import FFTSettings
    from kzg_tpu.ntt.das import _das_core

    for s, ms in ((3, 4), (6, 8)):
        fs = FFTSettings(ms)
        vals = jnp.asarray(fr.from_int(rand(MOD, 1 << s)))
        prev = field_backend()
        try:
            set_field_backend("vector")
            ref = _das_core.__wrapped__(
                vals, fs.expanded_roots_of_unity,
                fs.reverse_roots_of_unity, max_width=fs.max_width,
                interleave=False)
            set_field_backend("pallas")
            out = _das_core.__wrapped__(
                vals, fs.expanded_roots_of_unity,
                fs.reverse_roots_of_unity, max_width=fs.max_width,
                interleave=False)
        finally:
            set_field_backend("auto")
        assert bool(jnp.all(ref == out))


def test_pallas_fft_matches_vector():
    """Whole-FFT differential: the pallas butterfly path must be
    bit-identical to the vector path (trace each fresh per backend)."""
    from kzg_tpu.ntt import FFTSettings
    from kzg_tpu.ntt.fft_fr import _fft_core

    fs = FFTSettings(6)
    vals_int = rand(MOD, 64)
    vals = jnp.asarray(fr.from_int(vals_int))
    prev = field_backend()
    try:
        set_field_backend("vector")
        ref = _fft_core.__wrapped__(
            vals, fs.expanded_roots_of_unity, None, max_width=fs.max_width)
        set_field_backend("pallas")
        out = _fft_core.__wrapped__(
            vals, fs.expanded_roots_of_unity, None, max_width=fs.max_width)
    finally:
        set_field_backend("auto" if prev == "vector" else prev)
        set_field_backend("auto")
    assert bool(jnp.all(ref == out))
