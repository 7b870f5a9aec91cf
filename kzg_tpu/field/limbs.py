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
    def nprime(self) -> int:
        """-modulus^-1 mod R (full-word Montgomery constant)."""
        return (-pow(self.modulus, -1, self.r)) % self.r

    @functools.cached_property
    def nprime_limbs(self) -> np.ndarray:
        return int_to_limbs(self.nprime, self.n_limbs)

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


def _shift_up(carry, d: int = 1):
    """Move per-limb carries d limb positions up; the top carries drop
    (i.e. arithmetic mod 2^(16L)), matching Montgomery's mod-R semantics."""
    if d >= carry.shape[-1]:
        return jnp.zeros_like(carry)
    return jnp.concatenate(
        [jnp.zeros_like(carry[..., :d]), carry[..., :-d]], axis=-1
    )


def carry_fold(cols):
    """Redundant columns -> canonical limbs (< 2^16), mod 2^(16L).

    cols: uint32[..., K] with entries < 2^32 encoding value
    sum_k cols[k]*2^(16k). Fully static resolution — no data-dependent
    while_loop (a while per fold forced a loop barrier XLA cannot fuse
    across and dominated both compile and run time): two carry-save
    folding steps bring every limb to <= 2^16 with carries in {0,1};
    the remaining ripple is a boolean carry chain resolved by a
    log2(K)-step Kogge-Stone lookahead (generate = limb overflowed,
    propagate = limb saturated at 0xFFFF). ~12 cheap vector ops total.
    Returns (limbs, 0) — the legacy carry-out slot is retired; overflow
    past the top limb is dropped by construction.
    """
    v = (cols & LIMB_MASK) + _shift_up(cols >> LIMB_BITS)  # <= 2^17 - 2
    v = (v & LIMB_MASK) + _shift_up(v >> LIMB_BITS)        # <= 2^16
    g = v >> LIMB_BITS                       # {0,1}: generates a carry
    p = (v == LIMB_MASK).astype(U32)         # saturated: propagates
    d = 1
    while d < v.shape[-1]:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    # g[i] is now the carry out of the prefix [0..i]; carry into i is g[i-1]
    out = (v + _shift_up(g, 1)) & LIMB_MASK
    return out, jnp.zeros_like(out[..., 0])


def geq(a, b):
    """Vectorized canonical-limb comparison a >= b -> bool[...].

    Unrolled most-significant-differing-limb compare: L cheap vector ops,
    no gathers (TPU gathers are slow).
    """
    L = a.shape[-1]
    greater = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
    equal = jnp.ones(a.shape[:-1], dtype=jnp.bool_)
    for i in range(L - 1, -1, -1):
        ai = a[..., i]
        bi = b[..., i]
        greater = greater | (equal & (ai > bi))
        equal = equal & (ai == bi)
    return greater | equal


def _add_one_at_limb0(cols, inc):
    """cols[..., 0] += inc (uint32[...] in {0,1}) without a scatter."""
    pad = jnp.zeros(cols.shape[:-1] + (cols.shape[-1] - 1,), dtype=U32)
    return cols + jnp.concatenate([inc[..., None], pad], axis=-1)


def sub_borrow(a, b):
    """Limbwise a - b (canonical limbs). Returns (diff mod 2^(16L) limbs,
    borrow_out in {0,1}). Borrow-free form: a - b == a + ~b + 1 (mod R)
    with ~b the per-limb complement (LIMB_MASK - b, never negative), so
    one unsigned carry_fold resolves everything statically."""
    borrow = (~geq(a, b)).astype(U32)
    cols = _add_one_at_limb0(a + (LIMB_MASK - b), jnp.ones_like(borrow))
    out, _ = carry_fold(cols)
    return out, borrow


def _cond_sub_mod(spec: FieldSpec, x):
    """x < 2m with canonical limbs -> x mod m.

    Subtraction by complement addition: x - m == x + ~m + 1 (mod R); the
    overflow past the top limb is exactly the R that carry_fold drops."""
    mod = jnp.asarray(spec.mod_limbs, dtype=U32)
    need = geq(x, jnp.broadcast_to(mod, x.shape))
    mnot = LIMB_MASK - mod
    cols = x + jnp.where(need[..., None], mnot, jnp.zeros_like(mnot))
    cols = _add_one_at_limb0(cols, need.astype(U32))
    out, _ = carry_fold(cols)
    return out


def add(spec: FieldSpec, a, b):
    """(a + b) mod m. Works in any (consistent) domain; Montgomery-closed."""
    a, b = _bcast(a, b)
    s, _ = carry_fold(a + b)  # inputs < m and 2m < 2^(16L): no top carry
    return _cond_sub_mod(spec, s)


def sub(spec: FieldSpec, a, b):
    """(a - b) mod m, by complement addition (see _cond_sub_mod): when
    a < b the modulus is folded into the same carry pass."""
    a, b = _bcast(a, b)
    lt = ~geq(a, b)  # a < b: add the modulus back
    mod = jnp.asarray(spec.mod_limbs, dtype=U32)
    cols = a + (LIMB_MASK - b) + jnp.where(
        lt[..., None], jnp.broadcast_to(mod, a.shape), jnp.zeros_like(a)
    )
    cols = _add_one_at_limb0(cols, jnp.ones(a.shape[:-1], dtype=U32))
    out, _ = carry_fold(cols)
    return out


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def _skew_sum(rows, L: int, lead: int):
    """Sum row i of (..., L, L) shifted right by (i + lead) limbs, into
    (..., 2L) columns, with NO gathers and NO per-row op chains.

    The skew is a single pad + reshape: padding each row to width 2L+1
    and reinterpreting the flat buffer with stride 2L places row i at
    column offset i (each row "loses" one position per step of the
    stride mismatch) — the classic diagonal-alignment reshape. One
    reduce-sum down the row axis then yields the column sums. Three
    tensor ops total; the previous per-row shifted pad-add chain (2L
    pads + 2L adds) built a dense dependency DAG that sent XLA's fusion
    pass superlinear (~4s compile per field multiply on CPU, which made
    every curve-level program minutes-to-hours to compile)."""
    W = 2 * L + 1
    bdims = rows.ndim - 2
    padded = jnp.pad(rows, [(0, 0)] * bdims + [(0, 0), (lead, W - L - lead)])
    flat = padded.reshape(padded.shape[:-2] + (L * W,))[..., : 2 * L * L]
    return flat.reshape(flat.shape[:-1] + (L, 2 * L)).sum(
        axis=-2, dtype=U32
    )


def _product_cols(a, b, out_limbs: int | None = None):
    """Column sums of the full product of two canonical limb vectors.

    a, b: uint32[..., L] with limbs < 2^16. Returns uint32[..., 2L] (or the
    first `out_limbs` columns) with column k = sum_{i+j=k} a_i*b_j split
    into carry-save lo/hi halves; every column sums <= L terms < 2^16, so
    entries stay < 2^21 and no intermediate carry propagation is needed.
    One batched outer product + two skew-reshape reductions — plain
    vector/reduce work, no gathers or scatters (both are slow on TPU).
    """
    L = a.shape[-1]
    out = 2 * L if out_limbs is None else out_limbs
    p = a[..., :, None] * b[..., None, :]  # (..., L, L), exact in uint32
    cols = _skew_sum(p & LIMB_MASK, L, 0) + _skew_sum(p >> LIMB_BITS, L, 1)
    return cols[..., :out]


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product REDC(a*b): (a * b * R^-1) mod m.

    Full-word Montgomery reduction (all-parallel, no digit-serial loop):
        T = a*b;  q = (T mod R) * n' mod R;  res = (T + q*m) / R
    with n' = -m^-1 mod R. Each product uses the carry-save column kernel
    (_product_cols); the only sequential pieces are the short carry-fold
    scans over the limb axis.

    Dispatches to the fused Pallas TPU kernel when the "pallas" field
    backend is selected (kzg_tpu.field.backend).
    """
    from .backend import field_backend

    if field_backend() == "pallas":
        # fused VMEM-resident kernel, ~21x the vector path on TPU at
        # throughput sizes (off-TPU it runs in the Pallas interpreter
        # for testing). Even for sub-tile batches one kernel launch
        # beats the vector path's ~30-op XLA chain, so everything
        # routes here; deep sequential chains of tiny muls (scalar-mul
        # ladders at small point counts) gain the most.
        from .pallas_kernels import mont_mul_pallas

        return mont_mul_pallas(spec, a, b)
    a, b = _bcast(a, b)
    L = spec.n_limbs
    mod = jnp.asarray(spec.mod_limbs, dtype=U32)
    nprime = jnp.asarray(spec.nprime_limbs, dtype=U32)

    t, _ = carry_fold(_product_cols(a, b))  # canonical 2L limbs, T < R^2
    q_cols = _product_cols(t[..., :L], jnp.broadcast_to(nprime, a.shape),
                           out_limbs=L)
    q, _ = carry_fold(q_cols)  # (T mod R) * n' mod R, canonical L limbs
    qm, _ = carry_fold(_product_cols(q, jnp.broadcast_to(mod, a.shape)))
    # T + q*m is divisible by R and < 2mR < R^2: drop the low (zero) limbs.
    s, _ = carry_fold(t + qm)  # columns < 2^17: safe to add then fold
    res = s[..., L:]
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

    The ladder is ~500 sequential multiplies; each vectorizes over the
    batch, but the sequential depth dominates once the per-step work is
    small. Prefer `batch_inv` for N-element inversions on a hot path.
    """
    return pow_static(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a):
    """Montgomery-trick batch inversion over all leading axes of
    uint32[..., L] (reference: BatchInvModFr, bls/globals.go:117-124).

    Two log-depth `associative_scan` prefix/suffix products plus ONE
    single-element Fermat ladder replace the per-lane 500-deep ladder of
    `inv` — ~25 batched multiplies of sequential depth instead of ~500,
    the difference between 148ms and ~2ms for the recovery division at
    scale 12. Keeps Fermat's 0 -> 0 semantics (zero lanes are masked out
    of the product so they cannot poison the batch, unlike the
    reference's multiInv which would)."""
    from jax import lax

    L = a.shape[-1]
    lead = a.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    if n <= 1:
        return inv(spec, a)
    flat = a.reshape(n, L)
    one = jnp.asarray(spec.encode(1), dtype=U32)
    zero_mask = jnp.all(flat == 0, axis=-1)
    safe = jnp.where(zero_mask[:, None], one, flat)

    def mulf(x, y):
        return mont_mul(spec, x, y)

    prefix = lax.associative_scan(mulf, safe, axis=0)
    suffix = lax.associative_scan(mulf, safe, axis=0, reverse=True)
    total_inv = inv(spec, prefix[-1])
    ex_prefix = jnp.concatenate([one[None], prefix[:-1]], axis=0)
    ex_suffix = jnp.concatenate([suffix[1:], one[None]], axis=0)
    out = mulf(mulf(ex_prefix, ex_suffix), total_inv)
    out = jnp.where(zero_mask[:, None], jnp.zeros_like(out), out)
    return out.reshape(a.shape)


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
