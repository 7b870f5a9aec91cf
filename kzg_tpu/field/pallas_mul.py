"""Fused Pallas TPU kernel for Montgomery multiplication.

One kernel runs the whole pipeline — schoolbook column products, carry
normalization, full-word REDC, conditional subtraction — on VMEM-resident
tiles, so the only HBM traffic is the two inputs and one output (the
XLA "vector" engine materializes the (batch, L, L) outer product and the
intermediate column arrays between fused regions).

Layout: the (batch, L) limb arrays are retiled to (G, L, 128) so the
batch rides the 128-wide lane dimension and limbs ride sublanes; all
limb-axis shifts in the kernel are static pads/slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMB_BITS, LIMB_MASK, FieldSpec

LANES = 128


def _fold_u(cols):
    """Unsigned carry normalization along the sublane (limb) axis."""
    def has_carry(v):
        return jnp.any(v >> LIMB_BITS)

    def step(v):
        carry = v >> LIMB_BITS
        shifted = jnp.pad(carry, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        return (v & LIMB_MASK) + shifted

    return lax.while_loop(has_carry, step, cols)


def _fold_s(v):
    """Signed (int32) normalization; total value must be non-negative."""
    def has_carry(x):
        return jnp.any(x >> LIMB_BITS)

    def step(x):
        carry = x >> LIMB_BITS  # arithmetic shift: borrows propagate
        shifted = jnp.pad(carry, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        return (x & LIMB_MASK) + shifted

    return lax.while_loop(has_carry, step, v).astype(jnp.uint32)


def _shift_add(cols, val, start, out_limbs):
    """cols += val placed at limb offset `start` (static pad + add: plain
    vector ops, no scatter)."""
    n = min(val.shape[1], out_limbs - start)
    if n <= 0:
        return cols
    padded = jnp.pad(
        val[:, :n, :], ((0, 0), (start, out_limbs - start - n), (0, 0))
    )
    return cols + padded


def _product(a, b, L, out_limbs):
    """Column sums of the full product; a, b: (bs, L, 128) canonical."""
    bs = a.shape[0]
    cols = jnp.zeros((bs, out_limbs, LANES), dtype=jnp.uint32)
    for i in range(L):
        p = a[:, i:i + 1, :] * b  # (bs, L, 128), exact in uint32
        cols = _shift_add(cols, p & LIMB_MASK, i, out_limbs)
        cols = _shift_add(cols, p >> LIMB_BITS, i + 1, out_limbs)
    return cols


def _make_kernel(spec: FieldSpec):
    L = spec.n_limbs

    def kernel(a_ref, b_ref, mod_ref, npr_ref, out_ref):
        a = a_ref[:]
        b = b_ref[:]
        bs = a.shape[0]
        modb = jnp.broadcast_to(mod_ref[:][None], (bs, L, LANES))
        nprb = jnp.broadcast_to(npr_ref[:][None], (bs, L, LANES))

        t = _fold_u(_product(a, b, L, 2 * L))          # canonical 2L
        q = _fold_u(_product(t[:, :L, :], nprb, L, L))  # (T mod R)*n' mod R
        qm = _fold_u(_product(q, modb, L, 2 * L))       # q*m canonical
        s = _fold_u(t + qm)
        res = s[:, L:, :]                              # (T + qm)/R < 2m

        # res >= m ?  (most significant differing limb decides)
        greater = jnp.zeros((bs, LANES), dtype=jnp.bool_)
        equal = jnp.ones((bs, LANES), dtype=jnp.bool_)
        for i in range(L - 1, -1, -1):
            ri = res[:, i, :]
            mi = modb[:, i, :]
            greater = greater | (equal & (ri > mi))
            equal = equal & (ri == mi)
        geq = greater | equal
        d = res.astype(jnp.int32) - jnp.where(
            geq[:, None, :], modb, jnp.zeros_like(modb)
        ).astype(jnp.int32)
        out_ref[:] = _fold_s(d)

    return kernel


@functools.lru_cache(maxsize=None)
def _pallas_fn(spec: FieldSpec, G: int, bs: int, interpret: bool = False):
    kernel = _make_kernel(spec)
    L = spec.n_limbs
    return pl.pallas_call(
        kernel,
        grid=(G // bs,),
        in_specs=[
            pl.BlockSpec((bs, L, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, L, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, L, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, L, LANES), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _const_tiles(spec: FieldSpec):
    mod = np.broadcast_to(
        spec.mod_limbs.astype(np.uint32)[:, None], (spec.n_limbs, LANES)
    ).copy()
    npr = np.broadcast_to(
        spec.nprime_limbs.astype(np.uint32)[:, None], (spec.n_limbs, LANES)
    ).copy()
    return jnp.asarray(mod), jnp.asarray(npr)


def mont_mul_pallas(spec: FieldSpec, a, b, interpret: bool = False):
    """Drop-in replacement for limbs.mont_mul via the fused kernel.

    a, b: uint32[..., L] canonical Montgomery limbs (broadcastable).
    """
    L = spec.n_limbs
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (L,)).reshape(-1, L)
    b = jnp.broadcast_to(b, shape + (L,)).reshape(-1, L)
    B = a.shape[0]
    bs = 8
    tile = LANES * bs
    P = -(-B // tile) * tile
    if P != B:
        pad = [(0, P - B), (0, 0)]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    G = P // LANES
    at = a.reshape(G, LANES, L).transpose(0, 2, 1)
    bt = b.reshape(G, LANES, L).transpose(0, 2, 1)
    mod, npr = _const_tiles(spec)
    out = _pallas_fn(spec, G, bs, interpret)(at, bt, mod, npr)
    res = out.transpose(0, 2, 1).reshape(P, L)[:B]
    return res.reshape(shape + (L,))
