"""DAS FFT extension.

Given the evaluations at even indices of the doubled domain, compute the
odd-index evaluations such that the combined polynomial's top half of
coefficients is zero (reference: das_extension.go:7-84).

The reference uses a specialized in-place half-FFT recursion. The TPU-native
formulation is algebraic and equivalent: let w be the 2n-th root and
o = w^2 the n-th root. The unique degree-<n polynomial p interpolating the
evens on <o> gives the odds as evaluations on the coset w*<o>:

    odds = FFT_n( IFFT_n(evens) * w^j )      (pointwise scale by w^j)

which is two half-size FFTs plus one batched multiply — exactly the same
field values as the reference's recursion. The whole pipeline is one
compiled function (a single device dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from .domain import FFTSettings
from .fft_fr import _fft_core, take_strided


@functools.partial(jax.jit, static_argnames=("max_width", "interleave"))
def _das_core(evens, roots, rev_roots, max_width: int,
              interleave: bool):
    n = evens.shape[-2]
    coeffs = _fft_core(evens, rev_roots, n.bit_length() - 1,
                       max_width=max_width)
    stride = max_width // (2 * n)
    coset = take_strided(roots, n, stride)
    odds = _fft_core(fr.mul(coeffs, coset), roots, None, max_width=max_width)
    if not interleave:
        return odds
    out = jnp.stack([evens, odds], axis=-2)  # (..., n, 2, L)
    return out.reshape(evens.shape[:-2] + (2 * n, evens.shape[-1]))


def das_fft_extension(fs: FFTSettings, evens):
    """uint32[..., n, 16] even-index evaluations -> odd-index evaluations."""
    n = evens.shape[-2]
    if 2 * n > fs.max_width:
        raise ValueError("domain too small for extending requested values")
    return _das_core(
        evens, fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
        max_width=fs.max_width, interleave=False,
    )


def das_extend_interleaved(fs: FFTSettings, evens):
    """Full extended evaluation vector [e0, o0, e1, o1, ...] of length 2n."""
    n = evens.shape[-2]
    if 2 * n > fs.max_width:
        raise ValueError("domain too small for extending requested values")
    return _das_core(
        evens, fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
        max_width=fs.max_width, interleave=True,
    )
