"""Fixed-limb modular arithmetic vectorized over the batch axis.

This is the TPU-native replacement for the reference's CPU bignum backends
(reference: bls/bignum_kilic.go and the kilic/bls12-381 Go+asm library): a
field element batch is a `uint32[..., L]` array of L little-endian 16-bit
limbs, and every operation is a short static sequence of VPU-friendly int32
vector ops over the whole batch.

Why 16-bit limbs in uint32 storage:
  * a 16x16 product fits exactly in uint32 (no 64-bit ints on TPU),
  * schoolbook column sums of <= 2L lo/hi halves stay < 2^23 << 2^32, so no
    intermediate carry propagation is needed inside the Montgomery loop,
  * carry/borrow chains become length-L `lax.scan`s over the limb axis.

All values on device live in Montgomery form (R = 2^(16L)), mirroring the
reference's "mont-red form everywhere" policy (bls/bignum_kilic.go:21-23).
Montgomery representation is kept fully reduced (< modulus), so equality is
plain limb equality.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
U32 = jnp.uint32


def int_to_limbs(value: int, n_limbs: int) -> np.ndarray:
    """Python int -> little-endian 16-bit limb vector (host)."""
    if value < 0:
        raise ValueError("negative")
    out = np.zeros(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = value & LIMB_MASK
        value >>= LIMB_BITS
    if value:
        raise ValueError("value does not fit in limbs")
    return out


def limbs_to_int(limbs) -> int:
    """Little-endian 16-bit limb vector -> Python int (host)."""
    arr = np.asarray(limbs, dtype=np.uint64)
    acc = 0
    for i in range(arr.shape[-1] - 1, -1, -1):
        acc = (acc << LIMB_BITS) | int(arr[..., i])
    return acc


@dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field in limb representation."""

    name: str
    modulus: int
    n_limbs: int

    @functools.cached_property
    def mont_bits(self) -> int:
        return self.n_limbs * LIMB_BITS

    @functools.cached_property
    def r(self) -> int:
        return 1 << self.mont_bits

    @functools.cached_property
    def r_inv(self) -> int:
        return pow(self.r, -1, self.modulus)

    @functools.cached_property
    def n0(self) -> int:
        """-modulus^-1 mod 2^16 (the Montgomery digit constant)."""
        return (-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @functools.cached_property
    def mod_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.n_limbs)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        """R^2 mod m, used to enter Montgomery form."""
        return int_to_limbs(self.r * self.r % self.modulus, self.n_limbs)

    @functools.cached_property
    def one_canonical(self) -> np.ndarray:
        """Limbs of integer 1 (multiplying by it performs plain REDC)."""
        return int_to_limbs(1, self.n_limbs)

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        """Montgomery form of 1, i.e. R mod m."""
        return int_to_limbs(self.r % self.modulus, self.n_limbs)

    @functools.cached_property
    def zero(self) -> np.ndarray:
        return np.zeros(self.n_limbs, dtype=np.uint32)

    # ---- host-side conversions ----
    def to_mont_int(self, x: int) -> int:
        return (x % self.modulus) * self.r % self.modulus

    def from_mont_int(self, x: int) -> int:
        return x * self.r_inv % self.modulus

    def encode(self, values) -> np.ndarray:
        """Python int / nested list of ints -> Montgomery limb array (host)."""
        arr = np.asarray(values, dtype=object)
        out = np.empty(arr.shape + (self.n_limbs,), dtype=np.uint32)
        for idx in np.ndindex(arr.shape):
            out[idx] = int_to_limbs(self.to_mont_int(int(arr[idx])), self.n_limbs)
        if arr.shape == ():
            return out.reshape(self.n_limbs)
        return out

    def decode(self, limbs) -> np.ndarray:
        """Montgomery limb array -> array of Python ints (host)."""
        arr = np.asarray(jax.device_get(limbs))
        shape = arr.shape[:-1]
        out = np.empty(shape, dtype=object)
        for idx in np.ndindex(shape):
            out[idx] = self.from_mont_int(limbs_to_int(arr[idx]))
        return out


def _bcast(a, b):
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    L = a.shape[-1]
    return (
        jnp.broadcast_to(a, shape + (L,)),
        jnp.broadcast_to(b, shape + (L,)),
    )


def carry_fold(cols):
    """Propagate carries over the limb axis.

    cols: uint32[..., K] with entries < 2^32. Returns (limbs, carry_out) where
    limbs[..., k] < 2^16 and carry_out is whatever spills past the top limb.
    """
    v = jnp.moveaxis(cols, -1, 0)

    def step(carry, col):
        t = col + carry
        return t >> LIMB_BITS, t & LIMB_MASK

    carry_out, out = lax.scan(step, jnp.zeros_like(v[0]), v)
    return jnp.moveaxis(out, 0, -1), carry_out


def sub_borrow(a, b):
    """Limbwise a - b with borrow chain; limbs must be canonical (< 2^16).

    Returns (diff limbs, borrow_out in {0,1}).
    """
    av = jnp.moveaxis(a, -1, 0)
    bv = jnp.moveaxis(b, -1, 0)

    def step(borrow, ab):
        ai, bi = ab
        t = ai - bi - borrow  # uint32 wraparound when negative
        return t >> 31, t & LIMB_MASK

    borrow_out, out = lax.scan(step, jnp.zeros_like(av[0]), (av, bv))
    return jnp.moveaxis(out, 0, -1), borrow_out


def _cond_sub_mod(spec: FieldSpec, x):
    """x < 2m with canonical limbs -> x mod m."""
    mod = jnp.asarray(spec.mod_limbs, dtype=U32)
    d, borrow = sub_borrow(x, jnp.broadcast_to(mod, x.shape))
    return jnp.where((borrow == 0)[..., None], d, x)


def add(spec: FieldSpec, a, b):
    """(a + b) mod m. Works in any (consistent) domain; Montgomery-closed."""
    a, b = _bcast(a, b)
    s, _ = carry_fold(a + b)  # inputs < m and 2m < 2^(16L): no top carry
    return _cond_sub_mod(spec, s)


def sub(spec: FieldSpec, a, b):
    """(a - b) mod m."""
    a, b = _bcast(a, b)
    d, borrow = sub_borrow(a, b)
    mod = jnp.broadcast_to(jnp.asarray(spec.mod_limbs, dtype=U32), d.shape)
    dm, _ = carry_fold(d + mod)
    return jnp.where((borrow == 1)[..., None], dm, d)


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product REDC(a*b): (a * b * R^-1) mod m.

    Schoolbook full product with lo/hi-split column accumulation, then
    digit-serial REDC. All intermediate column values stay < 2^23, so a
    single uint32 accumulator per column suffices (no 64-bit arithmetic).
    """
    a, b = _bcast(a, b)
    L = spec.n_limbs
    batch = a.shape[:-1]
    mod = jnp.asarray(spec.mod_limbs, dtype=U32)
    n0 = jnp.uint32(spec.n0)

    # --- full product into 2L columns ---
    cols = jnp.zeros(batch + (2 * L,), dtype=U32)
    for i in range(L):
        p = a[..., i : i + 1] * b  # (..., L), each < 2^32 exactly
        cols = cols.at[..., i : i + L].add(p & LIMB_MASK)
        cols = cols.at[..., i + 1 : i + L + 1].add(p >> LIMB_BITS)

    # --- digit-serial Montgomery reduction ---
    t = cols
    for i in range(L):
        m = (t[..., i] * n0) & LIMB_MASK  # exact mod 2^16 despite high bits
        p = m[..., None] * mod
        t = t.at[..., i : i + L].add(p & LIMB_MASK)
        t = t.at[..., i + 1 : i + L + 1].add(p >> LIMB_BITS)
        # position i is now == 0 (mod 2^16); fold its carry upward and drop it
        t = t.at[..., i + 1].add(t[..., i] >> LIMB_BITS)

    res, _ = carry_fold(t[..., L:])  # true value < 2m < 2^(16L)
    return _cond_sub_mod(spec, res)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.r2_limbs, dtype=U32))


def from_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.one_canonical, dtype=U32))


def pow_static(spec: FieldSpec, a, exponent: int):
    """a^exponent with a static Python-int exponent (square-and-multiply).

    `a` is in Montgomery form; the result stays in Montgomery form. Uses a
    `fori_loop` over a constant bit table so the jaxpr stays small.
    """
    if exponent == 0:
        return jnp.broadcast_to(
            jnp.asarray(spec.one_mont, dtype=U32), a.shape
        )
    nbits = exponent.bit_length()
    # MSB-first bit table as a small constant array.
    bits = jnp.asarray(
        [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=U32
    )

    def body(i, acc):
        acc = mont_mul(spec, acc, acc)
        with_mul = mont_mul(spec, acc, a)
        return jnp.where((bits[i] == 1), with_mul, acc)

    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, dtype=U32), a.shape)
    # first iteration squares one (no-op) then multiplies by a when bit set
    return lax.fori_loop(0, nbits, body, one)


def inv(spec: FieldSpec, a):
    """Modular inverse by Fermat: a^(m-2), fully batch-parallel.

    This replaces both InvModFr and BatchInvModFr of the reference
    (bls/bignum_kilic.go:113-119): on TPU the Fermat ladder vectorizes over
    the batch for free, while the Montgomery batch-inversion trick would
    serialize it.
    """
    return pow_static(spec, a, spec.modulus - 2)


def eq(a, b) -> jnp.ndarray:
    """Elementwise field equality -> bool[...]. Representation is canonical."""
    a, b = _bcast(a, b)
    return jnp.all(a == b, axis=-1)


def is_zero(a) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def select(mask, a, b):
    """where(mask, a, b) with mask shaped like the batch."""
    a, b = _bcast(a, b)
    mask = jnp.broadcast_to(mask, a.shape[:-1])
    return jnp.where(mask[..., None], a, b)
