"""Reverse-bit-order utilities.

The reference permutes in place with a swap callback and a byte lookup table
(reverse_bit_order.go:55-101); on TPU the whole permutation is one
precomputed gather index vector applied with jnp.take.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def bit_reversal_indices(n: int) -> np.ndarray:
    """Index vector p with p[i] = bit-reverse of i over log2(n) bits."""
    if n & (n - 1) != 0 or n == 0:
        raise ValueError("length must be a power of two")
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out.astype(np.int32)


def reverse_bits_limited(length: int, value: int) -> int:
    """reference: reverseBitsLimited (reverse_bit_order.go:81-84)."""
    bits = max(length.bit_length() - 1, 0)
    out = 0
    for b in range(bits):
        out |= ((value >> b) & 1) << (bits - 1 - b)
    return out


def brp_permute(x, axis: int = -2):
    """Bit-reversal permutation along `axis` via reshape/transpose (no
    gather): viewing the axis as log2(n) binary dimensions and reversing
    their order IS the bit-reversal permutation (TPU gathers are slow)."""
    n = x.shape[axis]
    if n <= 2:
        return x
    bits = n.bit_length() - 1
    axis = axis % x.ndim
    lead = x.shape[:axis]
    y = x.reshape(lead + (2,) * bits + x.shape[axis + 1:])
    la = len(lead)
    perm = (tuple(range(la))
            + tuple(la + bits - 1 - i for i in range(bits))
            + tuple(range(la + bits, y.ndim)))
    return y.transpose(perm).reshape(x.shape)


def reverse_bit_order(arr, axis: int = -2):
    """Permute an array into reverse-bit order along `axis`.

    For field-element batches the element axis is -2 (the last axis is
    limbs); for G1 point structs apply per coordinate.
    """
    return brp_permute(arr, axis=axis)
