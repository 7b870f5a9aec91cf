"""Toeplitz matrix-by-CRS-vector products in Fourier space.

The FK20 core: a Toeplitz matrix T (built from polynomial coefficients)
applied to a vector of CRS points, via circulant embedding
    T x = IFFT_G1( FFT_Fr(c) o FFT_G1([x; 0]) )[:n]
(reference: toeplitzPart1/2/3, fk20_single.go:40-87). Part 1 (the G1 FFT
of the zero-extended CRS slice) is a precompute; part 2 is a fully batched
pointwise scalar-mul; part 3 is one inverse G1 FFT.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..curve import g1
from ..curve.fft_g1 import fft_g1
from ..curve.weierstrass import JacobianPoint
from ..ntt.domain import FFTSettings
from ..ntt.fft_fr import fft


def take_points(p: JacobianPoint, idx) -> JacobianPoint:
    """Gather points along the leading batch axis."""
    idx = jnp.asarray(idx)
    return JacobianPoint(*(jnp.take(c, idx, axis=0) for c in p))


def concat_points(*ps: JacobianPoint) -> JacobianPoint:
    return JacobianPoint(
        *(jnp.concatenate(cs, axis=0) for cs in zip(*ps))
    )


def toeplitz_part1(fs: FFTSettings, x: JacobianPoint) -> JacobianPoint:
    """Zero-extend the n CRS points to 2n and forward G1-FFT
    (reference: toeplitzPart1, fk20_single.go:40-56)."""
    n = x.x.shape[0]
    ext = concat_points(x, g1.infinity((n,)))
    return fft_g1(fs, ext)


def toeplitz_part2(fs: FFTSettings, toeplitz_coeffs,
                   x_ext_fft: JacobianPoint) -> JacobianPoint:
    """hExtFFT[i] = FFT(toeplitz_coeffs)[i] * xExtFFT[i]
    (reference: ToeplitzPart2, fk20_single.go:59-77).

    toeplitz_coeffs: uint32[..., 2k, 16]; x_ext_fft: matching (..., 2k)
    point batch. The whole pointwise product is one batched scalar-mul.
    """
    c_fft = fft(fs, toeplitz_coeffs)
    return g1.mul(x_ext_fft, c_fft)


def toeplitz_part3(fs: FFTSettings, h_ext_fft: JacobianPoint) -> JacobianPoint:
    """Inverse G1-FFT and keep the first half
    (reference: ToeplitzPart3, fk20_single.go:80-87)."""
    n2 = h_ext_fft.x.shape[0]
    h = fft_g1(fs, h_ext_fft, inverse=True)
    return JacobianPoint(*(c[: n2 // 2] for c in h))
