"""Zero polynomial Z(x) = prod_{i in missing} (x - w^(i*stride)).

Reference: ZeroPolyViaMultiplication (zero_poly.go:116-217), which builds
<=63-index leaves by sequential O(m^2) multiplication and tree-reduces
them 4-at-a-time with FFT convolutions into preallocated scratch.

TPU-native design: every level of the product tree is one *batched* FFT
convolution — level j holds 2^(p-j) polynomials of 2^(j+1) coefficients in
a single array, so the whole level is one fused FFT/pointwise-mul/IFFT
over the batch axis. The missing-index set is host data (sample
availability is host knowledge); shapes depend only on (padded count,
length), so each size compiles once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..ntt.domain import FFTSettings
from ..ntt.fft_fr import _fft_core, fft


def _reduce_level(polys, roots, rev_roots, inv_t, max_width: int,
                  target: int):
    """One tree level: convolve adjacent pairs via FFT at width `target`.
    polys: (cnt, width, 16) -> (cnt/2, target, 16)."""
    width = polys.shape[1]
    pad = [(0, 0), (0, target - width), (0, 0)]
    fa = _fft_core(jnp.pad(polys[0::2], pad), roots, None,
                   max_width=max_width)
    fb = _fft_core(jnp.pad(polys[1::2], pad), roots, None,
                   max_width=max_width)
    return _fft_core(fr.mul(fa, fb), rev_roots, inv_t, max_width=max_width)


@functools.lru_cache(maxsize=None)
def _tree_fn(p2: int, length: int, max_width: int):
    """Whole product tree + final pad + forward FFT as ONE compiled
    function per (leaf count, length) shape."""

    @jax.jit
    def run(polys, roots, rev_roots, invs):
        i = 0
        while polys.shape[0] > 1:
            target = min(2 * polys.shape[1], length)
            polys = _reduce_level(polys, roots, rev_roots, invs[i],
                                  max_width=max_width, target=target)
            i += 1
        zpoly = polys[0]
        if zpoly.shape[0] < length:
            zpoly = jnp.pad(zpoly, [(0, length - zpoly.shape[0]), (0, 0)])
        else:
            zpoly = zpoly[:length]
        evals = _fft_core(zpoly, roots, None, max_width=max_width)
        return evals, zpoly

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
        return fft(fs, coeffs), coeffs

    # Leaves: for each missing index the linear factor (x - w^(i*stride)),
    # padding the count to a power of two with the constant polynomial 1.
    p2 = 1 << (m - 1).bit_length()
    roots = jnp.take(
        fs.expanded_roots_of_unity,
        jnp.asarray((missing * stride).astype(np.int32)),
        axis=0,
    )  # (m, 16)
    neg_roots = fr.neg(roots)
    one = jnp.asarray(fr.from_int(1))
    # (p2, 2, 16): [(-w^i, 1)] for real entries, [(1, 0)] for padding
    c0 = jnp.concatenate(
        [neg_roots, jnp.broadcast_to(one, (p2 - m, 16))], axis=0
    )
    c1 = jnp.concatenate(
        [jnp.broadcast_to(one, (m, 16)), fr.zeros((p2 - m,))], axis=0
    )
    polys = jnp.stack([c0, c1], axis=1)  # (p2, 2, 16)

    # Tree reduction: every level convolves pairs via FFT at double width;
    # the whole tree (plus the final forward FFT) is one compiled dispatch.
    # The total degree of the remaining product is m < length, so the
    # convolution width never needs to exceed `length` (no aliasing).
    invs, width = [], 2
    while True:
        cnt = p2 >> len(invs)
        if cnt <= 1:
            break
        target = min(2 * width, length)
        invs.append(fs.inv_length(target))
        width = target
    run = _tree_fn(p2, length, fs.max_width)
    return run(
        polys, fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
        tuple(invs),
    )
