"""Fp2 = Fp[u]/(u^2+1) as batched limb arrays.

An Fp2 batch is uint32[..., 2, 24]: component axis (c0, c1) then Fp limbs.
Exposes the same duck-typed field-op surface as kzg_tpu.field.fp so the
generic Weierstrass engine works over either.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import fp


def make(c0, c1):
    return jnp.stack([c0, c1], axis=-2)


def c0(a):
    return a[..., 0, :]


def c1(a):
    return a[..., 1, :]


def add(a, b):
    # component-wise: ONE fp.add over the stacked (..., 2, 24) array
    # (fp ops treat every leading axis as batch)
    return fp.add(a, b)


def sub(a, b):
    return fp.sub(a, b)


def neg(a):
    return fp.neg(a)


def mul(a, b):
    """Karatsuba: 3 Fp multiplies, issued as ONE stacked mont-mul.

    Stacking matters twice on TPU: the three products run as one wide
    batch (full vector-unit occupancy even for small tower batches), and
    the multiply lowers to a single mont-mul instance instead of three —
    the Fp12 pairing tower composes these, so an Fp12 multiply becomes
    ONE 54-products-wide mont-mul (without this, the Miller-loop scan
    body lowered to ~100 MB of HLO and never finished compiling)."""
    a, b = jnp.broadcast_arrays(a, b)
    a0, a1, b0, b1 = c0(a), c1(a), c0(b), c1(b)
    x = jnp.stack([a0, a1, fp.add(a0, a1)], axis=0)
    y = jnp.stack([b0, b1, fp.add(b0, b1)], axis=0)
    t = fp.mul(x, y)
    t0, t1, t2 = t[0], t[1], t[2]
    return jnp.stack(
        [fp.sub(t0, t1), fp.sub(t2, fp.add(t0, t1))], axis=-2
    )


def sqr(a):
    a0, a1 = c0(a), c1(a)
    x = jnp.stack([fp.add(a0, a1), a0], axis=0)
    y = jnp.stack([fp.sub(a0, a1), a1], axis=0)
    t = fp.mul(x, y)
    t0, t1 = t[0], t[1]  # a0^2 - a1^2, a0*a1
    return jnp.stack([t0, fp.add(t1, t1)], axis=-2)


def inv(a):
    a0, a1 = c0(a), c1(a)
    norm = fp.add(fp.sqr(a0), fp.sqr(a1))
    ninv = fp.inv(norm)
    return jnp.stack([fp.mul(a0, ninv), fp.neg(fp.mul(a1, ninv))], axis=-2)


def batch_inv(a):
    """Norm-based inverse with the base-field Montgomery-trick batch
    inversion doing the single Fp division per element."""
    a0, a1 = c0(a), c1(a)
    norm = fp.add(fp.sqr(a0), fp.sqr(a1))
    ninv = fp.batch_inv(norm)
    return jnp.stack([fp.mul(a0, ninv), fp.neg(fp.mul(a1, ninv))], axis=-2)


def eq(a, b):
    return jnp.logical_and(fp.eq(c0(a), c0(b)), fp.eq(c1(a), c1(b)))


def is_zero(a):
    return jnp.logical_and(fp.is_zero(c0(a)), fp.is_zero(c1(a)))


def select(mask, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    mask = jnp.broadcast_to(mask, a.shape[:-2])
    return jnp.where(mask[..., None, None], a, b)


def zero_like(a):
    return jnp.zeros_like(a)


def one_like(a):
    one = make(jnp.asarray(fp.ONE), jnp.asarray(fp.ZERO))
    return jnp.broadcast_to(one, a.shape)


def from_int(pairs) -> np.ndarray:
    """[(c0, c1), ...] python ints -> Montgomery limb array (host)."""
    arr = np.asarray(pairs, dtype=object)
    return fp.from_int(arr)


def to_int(a):
    """-> object array of (c0, c1) int pairs (host)."""
    return fp.to_int(a)
