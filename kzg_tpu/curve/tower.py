"""Device Fp6/Fp12 tower arithmetic, batched over leading axes.

TPU-native stage of the pairing (SURVEY §7 step 8: "first a host-side
check, then TPU-native"). Layout extends fp2's stacked components:

    Fp2  uint32[..., 2, 24]      (kzg_tpu.curve.fp2)
    Fp6  uint32[..., 3, 2, 24]   c0 + c1 v + c2 v^2,  v^3 = xi = u+1
    Fp12 uint32[..., 2, 3, 2, 24]  c0 + c1 w,         w^2 = v

Formulas mirror the exact host oracle (curve/pairing.py F2/F6/F12) term
for term, so device results are bit-comparable after decode; inversions
route through fp.batch_inv (Montgomery trick) so a batch of N towers
costs one Fermat ladder, not N.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import fp
from . import fp2

# ---------------------------------------------------------------------------
# Fp2 helpers beyond the fp2 module
# ---------------------------------------------------------------------------


def f2_mul_xi(a):
    """(a + bu) * (1 + u) = (a - b) + (a + b) u."""
    a0, a1 = fp2.c0(a), fp2.c1(a)
    return fp2.make(fp.sub(a0, a1), fp.add(a0, a1))


def f2_conj(a):
    return fp2.make(fp2.c0(a), fp.neg(fp2.c1(a)))


# ---------------------------------------------------------------------------
# Fp6
# ---------------------------------------------------------------------------


def f6_make(c0, c1, c2):
    return jnp.stack([c0, c1, c2], axis=-3)


def f6_c(a, i):
    return a[..., i, :, :]


def f6_add(a, b):
    # component-wise: one fp.add over the whole stacked array
    return fp.add(a, b)


def f6_sub(a, b):
    return fp.sub(a, b)


def f6_neg(a):
    return fp.neg(a)


def f6_mul(a, b):
    """Toom-style 6-multiplication form, mirroring pairing.F6.__mul__ —
    all six Fp2 products issued as ONE stacked fp2.mul, and the
    assembly adds/subs stacked into one instance per op kind (every fp
    op instance lowers to ~32 KB of carry/compare HLO, so instance
    count — not element count — is what compile time buys)."""
    a, b = jnp.broadcast_arrays(a, b)
    a0, a1, a2 = (f6_c(a, i) for i in range(3))
    b0, b1, b2 = (f6_c(b, i) for i in range(3))
    # cross-sum operands: one stacked add for both sides
    sums = fp2.add(
        jnp.stack([a1, a0, a0, b1, b0, b0], axis=0),
        jnp.stack([a2, a1, a2, b2, b1, b2], axis=0))
    xs = jnp.stack([a0, a1, a2], axis=0)
    ys = jnp.stack([b0, b1, b2], axis=0)
    t = fp2.mul(jnp.concatenate([xs, sums[:3]], axis=0),
                jnp.concatenate([ys, sums[3:]], axis=0))
    t0, t1, t2, m12, m01, m02 = (t[i] for i in range(6))
    # pair sums, then cross - sum, one stacked instance each
    ps = fp2.add(jnp.stack([t1, t0, t0], axis=0),
                 jnp.stack([t2, t1, t2], axis=0))
    d = fp2.sub(jnp.stack([m12, m01, m02], axis=0), ps)
    xi = f2_mul_xi(jnp.stack([d[0], t2], axis=0))
    out = fp2.add(jnp.stack([xi[0], d[1], d[2]], axis=0),
                  jnp.stack([t0, xi[1], t1], axis=0))
    return f6_make(out[0], out[1], out[2])


def f6_sqr(a):
    return f6_mul(a, a)


def f6_mul_v(a):
    """(c0, c1, c2) -> (xi*c2, c0, c1)."""
    return f6_make(f2_mul_xi(f6_c(a, 2)), f6_c(a, 0), f6_c(a, 1))


def f6_inv(a):
    """pairing.F6.inv with the single Fp division batched."""
    a0, a1, a2 = (f6_c(a, i) for i in range(3))
    t0 = fp2.sub(fp2.sqr(a0), f2_mul_xi(fp2.mul(a1, a2)))
    t1 = fp2.sub(f2_mul_xi(fp2.sqr(a2)), fp2.mul(a0, a1))
    t2 = fp2.sub(fp2.sqr(a1), fp2.mul(a0, a2))
    denom = fp2.add(
        fp2.mul(a0, t0),
        f2_mul_xi(fp2.add(fp2.mul(a2, t1), fp2.mul(a1, t2))))
    dinv = fp2.batch_inv(denom)
    return f6_make(fp2.mul(t0, dinv), fp2.mul(t1, dinv), fp2.mul(t2, dinv))


# ---------------------------------------------------------------------------
# Fp12
# ---------------------------------------------------------------------------


def f12_make(c0, c1):
    return jnp.stack([c0, c1], axis=-4)


def f12_c(a, i):
    return a[..., i, :, :, :]


def f12_add(a, b):
    return fp.add(a, b)


def f12_sub(a, b):
    return fp.sub(a, b)


def f12_neg(a):
    return fp.neg(a)


def f12_mul(a, b):
    """Karatsuba over Fp6 with the three Fp6 products stacked into ONE
    f6_mul call (so a whole Fp12 multiply is a single 54-products-wide
    mont-mul instance)."""
    a, b = jnp.broadcast_arrays(a, b)
    a0, a1 = f12_c(a, 0), f12_c(a, 1)
    b0, b1 = f12_c(b, 0), f12_c(b, 1)
    xs = jnp.stack([a0, a1, f6_add(a0, a1)], axis=0)
    ys = jnp.stack([b0, b1, f6_add(b0, b1)], axis=0)
    t = f6_mul(xs, ys)
    t0, t1, tm = t[0], t[1], t[2]
    c0 = f6_add(t0, f6_mul_v(t1))
    c1 = f6_sub(tm, f6_add(t0, t1))
    return f12_make(c0, c1)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_conj(a):
    """Conjugation over Fp6 = the p^6 Frobenius."""
    return f12_make(f12_c(a, 0), f6_neg(f12_c(a, 1)))


def f12_inv(a):
    a0, a1 = f12_c(a, 0), f12_c(a, 1)
    denom = f6_inv(f6_sub(f6_mul(a0, a0), f6_mul_v(f6_mul(a1, a1))))
    return f12_make(f6_mul(a0, denom), f6_neg(f6_mul(a1, denom)))


def f12_select(mask, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    mask = jnp.broadcast_to(mask, a.shape[:-4])
    return jnp.where(mask[..., None, None, None, None], a, b)


def f12_eq(a, b):
    flat_eq = jnp.all(
        jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
        == jnp.broadcast_to(b, jnp.broadcast_shapes(a.shape, b.shape)),
        axis=(-1, -2, -3, -4))
    return flat_eq


def f12_is_zero(a):
    return jnp.all(a == 0, axis=(-1, -2, -3, -4))


def f12_zero_like(a):
    return jnp.zeros_like(a)


_ONE_NP = None


def f12_one(shape=()):
    """Fp12 one as a device-ready array of the given batch shape."""
    global _ONE_NP
    if _ONE_NP is None:
        one = np.zeros((2, 3, 2, fp.N_LIMBS), dtype=np.uint32)
        one[0, 0, 0] = np.asarray(fp.from_int(1))
        _ONE_NP = one
    return jnp.broadcast_to(
        jnp.asarray(_ONE_NP), tuple(shape) + (2, 3, 2, fp.N_LIMBS))


def f12_one_like(a):
    return f12_one(a.shape[:-4])


def f12_is_one(a):
    return f12_eq(a, f12_one_like(a))


_SMALL_CACHE = {}


def f12_from_small(v: int):
    """Fp12 scalar constant from a small host int (device-ready, cached
    host-side)."""
    if v not in _SMALL_CACHE:
        arr = np.zeros((2, 3, 2, fp.N_LIMBS), dtype=np.uint32)
        arr[0, 0, 0] = np.asarray(fp.from_int(v))
        _SMALL_CACHE[v] = arr
    return jnp.asarray(_SMALL_CACHE[v])


def f12_from_int(vals) -> np.ndarray:
    """Host: nested int structure [[ [ (c0,c1) x3 ] x2 ]] per element ->
    limb array. vals indexed [w][v][u] as python ints; accepts the
    oracle's F12 objects too."""
    from .pairing import F12

    def decompose(x):
        if isinstance(x, F12):
            return [[[c.a, c.b] for c in (s.c0, s.c1, s.c2)]
                    for s in (x.c0, x.c1)]
        return x

    arr = np.asarray(
        [decompose(v) for v in vals]
        if isinstance(vals, (list, tuple)) else decompose(vals),
        dtype=object)
    return fp.from_int(arr)


def f12_to_oracle(a):
    """Device/host limb array (no batch) -> oracle F12 (for tests)."""
    from .pairing import F2, F6, F12

    ints = fp.to_int(a)

    def f2(v):
        return F2(int(v[0]), int(v[1]))

    def f6(v):
        return F6(f2(v[0]), f2(v[1]), f2(v[2]))

    return F12(f6(ints[0]), f6(ints[1]))


# ---------------------------------------------------------------------------
# scan-ladder exponentiation (static exponent)
# ---------------------------------------------------------------------------


def f12_pow_static(a, e: int):
    """a^e by a left-to-right square-multiply lax.scan over the static
    bit pattern of e (traces one sqr+mul body; e's bits ride as a
    constant bool vector). e > 0."""
    from jax import lax

    assert e > 0
    bits = np.array([b == "1" for b in bin(e)[3:]], dtype=bool)
    if bits.size == 0:
        return a

    def body(acc, bit):
        acc = f12_sqr(acc)
        return f12_select(bit, f12_mul(acc, a), acc), None

    out, _ = lax.scan(body, a, jnp.asarray(bits))
    return out
