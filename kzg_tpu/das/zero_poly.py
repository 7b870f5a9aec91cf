"""Zero polynomial Z(x) = prod_{i in missing} (x - w^(i*stride)).

Reference: ZeroPolyViaMultiplication (zero_poly.go:116-217), which builds
<=63-index leaves by sequential O(m^2) multiplication and tree-reduces
them 4-at-a-time with FFT convolutions into preallocated scratch.

TPU-native design, fused into ONE compiled dispatch per shape:
  1. leaves of up to 64 linear factors built by a 64-step scan that is
     batched over all leaves at once (each step is one fused
     shift-multiply-add over every leaf)
  2. a binary product tree where every level is a single batched FFT
     convolution over all remaining pairs
The missing-index set is host data (sample availability is host
knowledge); shapes depend only on (leaf count, length).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..field import fr
from ..ntt.domain import FFTSettings
from ..ntt.fft_fr import _fft_core

LEAF_FACTORS = 64  # factors per leaf (reference uses <=63, zero_poly.go:17)
LEAF_WIDTH = 128   # storage width: degree <= 64 fits, power of two


def _build_leaves(neg_roots, valid):
    """(G, S, 16) negated roots + (G, S) validity -> (G, LEAF_WIDTH, 16)
    monic products prod(x - r) over the valid factors of each leaf."""
    G = neg_roots.shape[0]
    one = jnp.asarray(fr.from_int(1))
    poly0 = jnp.zeros((G, LEAF_WIDTH, fr.N_LIMBS), dtype=jnp.uint32)
    poly0 = poly0.at[:, 0, :].set(jnp.broadcast_to(one, (G, fr.N_LIMBS)))

    def step(poly, xs):
        negr, v = xs  # (G, 16), (G,)
        shifted = jnp.concatenate(
            [jnp.zeros_like(poly[:, :1, :]), poly[:, :-1, :]], axis=1)
        cand = fr.add(shifted, fr.mul(poly, negr[:, None, :]))
        return fr.select(v[:, None], cand, poly), None

    xs = (jnp.moveaxis(neg_roots, 1, 0), jnp.moveaxis(valid, 1, 0))
    poly, _ = lax.scan(step, poly0, xs)
    return poly


def _reduce_level(polys, roots, rev_roots, max_width: int,
                  target: int):
    """One tree level: convolve adjacent pairs via FFT at width `target`.
    polys: (cnt, width, 16) -> (cnt/2, target, 16)."""
    width = polys.shape[1]
    pad = [(0, 0), (0, target - width), (0, 0)]
    fa = _fft_core(jnp.pad(polys[0::2], pad), roots, None,
                   max_width=max_width)
    fb = _fft_core(jnp.pad(polys[1::2], pad), roots, None,
                   max_width=max_width)
    return _fft_core(fr.mul(fa, fb), rev_roots, target.bit_length() - 1,
                     max_width=max_width)


def zero_poly_graph(root_idx, valid, roots, rev_roots,
                    length: int, max_width: int):
    """Traceable leaf build + product tree + final forward FFT. Shared
    by the standalone jit below and by pipelines that fuse the zero
    polynomial into a larger single-dispatch program (das/recovery.py)."""
    gathered = jnp.take(roots, root_idx.reshape(-1), axis=0).reshape(
        root_idx.shape + (fr.N_LIMBS,))
    neg_roots = fr.neg(gathered)
    polys = _build_leaves(neg_roots, valid)
    while polys.shape[0] > 1:
        target = min(2 * polys.shape[1], length)
        polys = _reduce_level(polys, roots, rev_roots,
                              max_width=max_width, target=target)
    zpoly = polys[0]
    if zpoly.shape[0] < length:
        zpoly = jnp.pad(zpoly, [(0, length - zpoly.shape[0]), (0, 0)])
    else:
        # degree m < length: truncation only drops structural zeros
        zpoly = zpoly[:length]
    evals = _fft_core(zpoly, roots, None, max_width=max_width)
    return evals, zpoly


@functools.lru_cache(maxsize=None)
def _zero_poly_fn(G: int, length: int, max_width: int):
    """Leaf build + whole product tree + final forward FFT as ONE
    compiled function per (leaf count, length)."""

    @jax.jit
    def run(root_idx, valid, roots, rev_roots):
        return zero_poly_graph(root_idx, valid, roots, rev_roots,
                               length, max_width)

    return run


def zero_poly_via_multiplication(fs: FFTSettings, missing_indices, length: int):
    """-> (zero_eval uint32[length, 16], zero_coeffs uint32[length, 16]).

    missing_indices: host iterable of ints in [0, length). length must be
    a power of two <= fs.max_width (the evaluation domain size). Matches
    the reference contract (zero_poly.go:116-130): the returned coefficient
    array is the monic Z padded with zeros to `length`, and zero_eval is
    its FFT on the length-domain.
    """
    missing = np.asarray(sorted(int(i) for i in missing_indices),
                         dtype=np.int64)
    m = missing.shape[0]
    if length & (length - 1) != 0:
        raise ValueError("length must be a power of two")
    if length > fs.max_width:
        raise ValueError("length larger than domain")
    if m >= length:
        raise ValueError("cannot build zero polynomial of full length")
    stride = fs.max_width // length

    if m == 0:
        coeffs = jnp.concatenate(
            [jnp.asarray(fr.from_int(1))[None, :], fr.zeros((length - 1,))],
            axis=0,
        )
        from ..ntt.fft_fr import fft

        return fft(fs, coeffs), coeffs

    idx, valid_np, G = leaf_layout(fs, missing, length, stride)
    run = _zero_poly_fn(G, length, fs.max_width)
    return run(
        idx, valid_np,
        fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
    )


def leaf_layout(fs: FFTSettings, missing: np.ndarray, length: int,
                stride: int):
    """Host-side leaf packing: group missing-root factors into leaves of
    LEAF_FACTORS, pad the leaf count to a power of two (identity leaves
    via the validity mask).
    Returns (idx (G, S) int32, valid (G, S) bool, G)."""
    m = missing.shape[0]
    G = 1 << (max((m + LEAF_FACTORS - 1) // LEAF_FACTORS, 1) - 1).bit_length()
    S = LEAF_FACTORS
    idx = np.zeros((G, S), dtype=np.int32)
    valid_np = np.zeros((G, S), dtype=bool)
    flat_leaf = np.arange(m) // S
    flat_pos = np.arange(m) % S
    idx[flat_leaf, flat_pos] = (missing * stride).astype(np.int32)
    valid_np[flat_leaf, flat_pos] = True
    return idx, valid_np, G
