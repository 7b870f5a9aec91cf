"""The BLS12-381 scalar field Fr as batched limb arrays.

API parity with the reference's bls facade (bls/bignum_kilic.go:25-132):
add/sub/mul/div/inv/batch_inv/exp/eq/zero-checks plus 32-byte little-endian
(de)serialization with the ValidFr range check (bls/bignum_all.go:12-35).

An "Fr batch" is a uint32[..., 16] array of 16-bit limbs in Montgomery form
(R = 2^256), always fully reduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from .constants import FR_MODULUS
from .limbs import FieldSpec

SPEC = FieldSpec(name="Fr", modulus=FR_MODULUS, n_limbs=16)
N_LIMBS = SPEC.n_limbs

# ---- module-level constants (host numpy, Montgomery form) ----
ZERO = SPEC.encode(0)
ONE = SPEC.encode(1)
TWO = SPEC.encode(2)
MODULUS_MINUS1 = SPEC.encode(FR_MODULUS - 1)
MODULUS_MINUS2 = SPEC.encode(FR_MODULUS - 2)
INVERSE_TWO = SPEC.encode(pow(2, -1, FR_MODULUS))


# ---- device ops (traceable; jit at the call-site granularity you need) ----
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
    """Montgomery-trick batch inversion (BatchInvModFr parity): log-depth
    prefix/suffix scans + one Fermat ladder, 0 -> 0 semantics preserved.
    ~20x shallower sequential depth than the per-lane ladder of `inv`."""
    return limbs.batch_inv(SPEC, a)


def div(a, b):
    return mul(a, inv(b))


def pow_static(a, e: int):
    return limbs.pow_static(SPEC, a, e)


def eq(a, b):
    return limbs.eq(a, b)


def is_zero(a):
    return limbs.is_zero(a)


def is_one(a):
    return limbs.eq(a, jnp.asarray(ONE))


def select(mask, a, b):
    return limbs.select(mask, a, b)


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (N_LIMBS,), dtype=jnp.uint32)


def scalar_windows(a_mont):
    """Canonical 4-bit window decomposition of Montgomery-form scalars.

    Returns uint32[..., 64] with window i = (a >> 4i) & 0xF (LSB-first).
    Feeds the curve layer's fixed-window scalar multiplication.
    """
    canon = limbs.from_mont(SPEC, a_mont)  # (..., 16) canonical limbs
    shifts = jnp.asarray([0, 4, 8, 12], dtype=jnp.uint32)
    wins = (canon[..., :, None] >> shifts) & 0xF  # (..., 16, 4)
    return wins.reshape(canon.shape[:-1] + (64,))


# bias for signed-window recoding: 63 low nibbles of 8 (top nibble 0)
_SIGNED_WINDOW_BIAS = int("8" * 63, 16)


def scalar_windows_signed(a_mont):
    """Signed 4-bit window decomposition of Montgomery-form scalars.

    Returns int32[..., 64] digits s (LSB-first) with
    sum_j s_j * 16^j == a (canonical), s_j in [-8, 7] for j < 63 and
    s_63 in [0, 8].

    Branch-free bias trick: adding 0x0888...8 (63 eights) to the canonical
    scalar shifts every low window's digit by +8 with the carries folded in,
    so s_j = d'_j - 8; the top window absorbs the final carry (a < 2^255
    keeps the biased sum below 2^256, so no overflow). Feeds the
    shared-table MSM (curve/msm.py) and halves its select-table size vs
    unsigned 4-bit windows (negation of a curve point is one field neg).
    """
    canon = limbs.from_mont(SPEC, a_mont)  # (..., 16) canonical limbs
    bias = jnp.asarray(limbs.int_to_limbs(_SIGNED_WINDOW_BIAS, N_LIMBS))
    biased, _ = limbs.carry_fold(canon + bias)
    shifts = jnp.asarray([0, 4, 8, 12], dtype=jnp.uint32)
    wins = ((biased[..., :, None] >> shifts) & 0xF).reshape(
        canon.shape[:-1] + (64,)
    ).astype(jnp.int32)
    return jnp.concatenate([wins[..., :63] - 8, wins[..., 63:]], axis=-1)


def scalar_bits(a_mont):
    """Canonical bit decomposition of Montgomery-form scalars.

    Returns uint32[..., 256] with bit i = (a >> i) & 1. Used by the curve
    layer for double-and-add (the reference normalizes Fr out of Montgomery
    form before G1 multiplication the same way, bls/bls_kilic.go:41-45).
    """
    canon = limbs.from_mont(SPEC, a_mont)  # (..., 16) canonical limbs
    shifts = jnp.arange(limbs.LIMB_BITS, dtype=jnp.uint32)
    bits = (canon[..., :, None] >> shifts) & 1  # (..., 16, 16)
    return bits.reshape(canon.shape[:-1] + (256,))


# ---- host conversions ----
def from_int(values) -> np.ndarray:
    """Python int (or nested lists) -> Montgomery limb array."""
    return SPEC.encode(values)


def to_int(arr) -> np.ndarray:
    """Montgomery limb array -> object array of Python ints."""
    return SPEC.decode(arr)


def from_u64(values) -> np.ndarray:
    """Parity with bls.AsFr (u64 -> Fr)."""
    return SPEC.encode(values)


def random(shape=(), seed=None) -> np.ndarray:
    """Uniform random field elements (host RNG), Montgomery limb array."""
    rng = np.random.default_rng(seed)
    flat = int(np.prod(shape)) if shape else 1
    vals = [rng.integers(0, 1 << 63, size=5).tolist() for _ in range(flat)]
    ints = [
        (v[0] + (v[1] << 63) + (v[2] << 126) + (v[3] << 189) + (v[4] << 252))
        % FR_MODULUS
        for v in vals
    ]
    out = SPEC.encode(np.asarray(ints, dtype=object).reshape(shape or (1,)))
    return out if shape else out[0]


def valid_fr_bytes(b32: bytes) -> bool:
    """ValidFr range check on 32-byte little-endian input
    (reference: bls/bignum_all.go:12-35)."""
    if len(b32) != 32:
        raise ValueError("need exactly 32 bytes")
    return int.from_bytes(b32, "little") < FR_MODULUS


def from_bytes32_le(b32: bytes):
    """FrFrom32 parity: little-endian 32 bytes -> Fr, None if out of range."""
    if not valid_fr_bytes(b32):
        return None
    return SPEC.encode(int.from_bytes(b32, "little"))


def to_bytes32_le(fr_limb) -> bytes:
    """FrTo32 parity: Fr -> canonical little-endian 32 bytes."""
    return int(SPEC.decode(np.asarray(fr_limb))[()]).to_bytes(32, "little")


def valid_bytes32_batch(data) -> np.ndarray:
    """Vectorized ValidFr over N 32-byte LE chunks.

    data: bytes of length N*32 (or uint8 array). Returns bool[N].
    """
    buf = np.frombuffer(bytes(data), dtype="<u2").reshape(-1, N_LIMBS)
    mod = SPEC.mod_limbs.astype(np.uint16)
    diff = buf != mod[None, :]
    any_diff = diff.any(axis=1)
    # most significant differing limb decides the comparison
    idx = (N_LIMBS - 1) - np.argmax(diff[:, ::-1], axis=1)
    rows = np.arange(buf.shape[0])
    less = buf[rows, idx] < mod[idx]
    return np.where(any_diff, less, False)  # equal to modulus -> invalid


def from_bytes32_batch(data):
    """N*32 little-endian bytes -> (Montgomery device array uint32[N, 16],
    valid bool[N]). Invalid rows are returned as-is mod nothing — callers
    must check the mask (the eth layer rejects whole blobs on any invalid
    element, eth/helpers.go:264-273)."""
    import jax.numpy as jnp

    buf = (
        np.frombuffer(bytes(data), dtype="<u2")
        .reshape(-1, N_LIMBS)
        .astype(np.uint32)
    )
    valid = valid_bytes32_batch(data)
    r2 = jnp.asarray(SPEC.r2_limbs)
    mont = limbs.mont_mul(SPEC, jnp.asarray(buf), r2)
    return mont, valid


def to_bytes32_batch(arr) -> np.ndarray:
    """Montgomery device array uint32[..., 16] -> uint8[..., 32] canonical
    little-endian bytes (vectorized FrTo32)."""
    canon = np.asarray(
        jax.device_get(limbs.from_mont(SPEC, arr)), dtype=np.uint32
    )
    u16 = np.ascontiguousarray(canon.astype("<u2"))
    return u16.view(np.uint8).reshape(canon.shape[:-1] + (32,))


# jitted standalone versions for direct use
jit_add = jax.jit(add)
jit_sub = jax.jit(sub)
jit_mul = jax.jit(mul)
jit_inv = jax.jit(inv)
