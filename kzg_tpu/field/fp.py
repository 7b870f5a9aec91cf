"""The BLS12-381 base field Fp (381-bit) as batched limb arrays.

The reference gets Fp arithmetic for free from its dependencies (kilic's
Go+asm / herumi's C++ mcl); here it is the same limb engine as Fr with
24 x 16-bit limbs (R = 2^384). Montgomery form everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import limbs
from .constants import FP_MODULUS
from .limbs import FieldSpec

SPEC = FieldSpec(name="Fp", modulus=FP_MODULUS, n_limbs=24)
N_LIMBS = SPEC.n_limbs

ZERO = SPEC.encode(0)
ONE = SPEC.encode(1)


def add(a, b):
    return limbs.add(SPEC, a, b)


def sub(a, b):
    return limbs.sub(SPEC, a, b)


def neg(a):
    return limbs.neg(SPEC, a)


def mul(a, b):
    return limbs.mont_mul(SPEC, a, b)


def sqr(a):
    return limbs.mont_mul(SPEC, a, a)


def inv(a):
    return limbs.inv(SPEC, a)


def batch_inv(a):
    """Montgomery-trick batch inversion (see limbs.batch_inv)."""
    return limbs.batch_inv(SPEC, a)


def pow_static(a, e: int):
    return limbs.pow_static(SPEC, a, e)


def eq(a, b):
    return limbs.eq(a, b)


def is_zero(a):
    return limbs.is_zero(a)


def select(mask, a, b):
    return limbs.select(mask, a, b)


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (N_LIMBS,), dtype=jnp.uint32)


def zero_like(a):
    return jnp.zeros_like(a)


def one_like(a):
    return jnp.broadcast_to(jnp.asarray(ONE), a.shape)


def from_int(values) -> np.ndarray:
    return SPEC.encode(values)


def to_int(arr) -> np.ndarray:
    return SPEC.decode(arr)


def from_int_batch(ints):
    """Iterable of N Python ints -> Montgomery uint32[N, 24] with one
    device multiply (vectorized encode: the per-element Python limb loop
    of SPEC.encode is too slow at trusted-setup width)."""
    buf = b"".join((int(v) % SPEC.modulus).to_bytes(48, "little")
                   for v in ints)
    raw = (np.frombuffer(buf, dtype="<u2")
           .reshape(-1, N_LIMBS).astype(np.uint32))
    r2 = jnp.asarray(SPEC.r2_limbs)
    return limbs.mont_mul(SPEC, jnp.asarray(raw), r2)


def to_int_batch(arr):
    """Montgomery uint32[..., 24] -> flat list of canonical Python ints
    (vectorized decode)."""
    import jax

    canon = np.ascontiguousarray(
        np.asarray(
            jax.device_get(limbs.from_mont(SPEC, arr)), dtype=np.uint32
        ).reshape(-1, N_LIMBS).astype("<u2")
    )
    rows = canon.view(np.uint8).reshape(-1, 2 * N_LIMBS)
    return [int.from_bytes(r.tobytes(), "little") for r in rows]
