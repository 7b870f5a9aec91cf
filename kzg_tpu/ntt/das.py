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
field values as the reference's recursion.
"""

from __future__ import annotations

from ..field import fr
from .domain import FFTSettings
from .fft_fr import coset_scale, fft


def das_fft_extension(fs: FFTSettings, evens):
    """uint32[..., n, 16] even-index evaluations -> odd-index evaluations."""
    n = evens.shape[-2]
    if 2 * n > fs.max_width:
        raise ValueError("domain too small for extending requested values")
    coeffs = fft(fs, evens, inverse=True)
    shifted = fr.mul(coeffs, coset_scale(fs, n))
    return fft(fs, shifted, inverse=False)


def das_extend_interleaved(fs: FFTSettings, evens):
    """Full extended evaluation vector [e0, o0, e1, o1, ...] of length 2n."""
    import jax.numpy as jnp

    odds = das_fft_extension(fs, evens)
    n = evens.shape[-2]
    out = jnp.stack([evens, odds], axis=-2)  # (..., n, 2, L)
    return out.reshape(evens.shape[:-2] + (2 * n, evens.shape[-1]))
