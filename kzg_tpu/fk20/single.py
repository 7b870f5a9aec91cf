"""FK20 single-point amortized proofs: all n KZG proofs in O(n log n).

Reference: fk20_single.go:122-196 + NewFK20SingleSettings (kzg.go:38-64).
The Toeplitz system: all proofs pi_i = [q_{w^i}(s)]_1 are the G1-FFT of
    h = T(f) . x,   x = [s^{n-2}, ..., s^1, s^0, O]
with T(f) the Toeplitz matrix of the polynomial's coefficients; T.x is
computed by circulant embedding (see toeplitz.py). The DA-optimized
variant exploits the zero top half of an extended polynomial so the
Toeplitz work stays n-sized while producing 2n proofs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..curve import g1
from ..curve.fft_g1 import fft_g1, reverse_bit_order_g1
from ..curve.weierstrass import JacobianPoint
from ..field import fr
from ..kzg.settings import KZGSettings
from .toeplitz import (
    concat_points,
    take_points,
    toeplitz_part1,
    toeplitz_part2,
    toeplitz_part3,
)


def toeplitz_coeffs_step(poly):
    """Circulant first-column vector for the Toeplitz product
    (reference: toeplitzCoeffsStep, fk20_single.go:89-103):
        [f_{n-1}, 0 x (n+1), f_1, ..., f_{n-2}]   (length 2n)
    """
    n = poly.shape[0]
    return jnp.concatenate(
        [poly[n - 1 : n], fr.zeros((n + 1,)), poly[1 : n - 1]], axis=0
    )


class FK20SingleSettings:
    """Precomputes xExtFFT = FFT_G1([x; 0]) once
    (reference: NewFK20SingleSettings, kzg.go:43-64).

    n2 is the G1-FFT width: 2n for an input polynomial of n coefficients.
    """

    def __init__(self, ks: KZGSettings, n2: int):
        if n2 & (n2 - 1) != 0 or n2 < 2:
            raise ValueError("n2 must be a power of two >= 2")
        if n2 > ks.fs.max_width:
            raise ValueError("n2 too large for the FFT settings")
        n = n2 // 2
        if ks.secret_g1.x.shape[0] < n2:
            raise ValueError("CRS shorter than n2")
        self.ks = ks
        self.n = n
        self.n2 = n2
        # x = [s^{n-2}, s^{n-3}, ..., s^0, O]
        idx = np.arange(n - 2, -1, -1, dtype=np.int32)
        x = concat_points(
            take_points(ks.secret_g1, idx), g1.infinity((1,))
        )
        self.x_ext_fft = toeplitz_part1(ks.fs, x)  # (2n,) points

        self._init_jits()

    def _init_jits(self) -> None:
        """Whole-pipeline jits (one device dispatch per proof batch); the
        precomputed tables become compile-time constants via closure.
        Also called by the persistence loader (kzg/persist.py)."""
        import jax

        self._jit_single = jax.jit(self._fk20_single_impl)
        self._jit_da_opt = jax.jit(self._fk20_single_da_impl)

    def _fk20_single_impl(self, poly) -> JacobianPoint:
        tc = toeplitz_coeffs_step(poly)
        h = toeplitz_part3(
            self.ks.fs, toeplitz_part2(self.ks.fs, tc, self.x_ext_fft)
        )
        return fft_g1(self.ks.fs, h)

    def _fk20_single_da_impl(self, poly) -> JacobianPoint:
        reduced = poly[: self.n]
        tc = toeplitz_coeffs_step(reduced)
        h = toeplitz_part3(
            self.ks.fs, toeplitz_part2(self.ks.fs, tc, self.x_ext_fft)
        )
        h_ext = concat_points(h, g1.infinity((self.n,)))
        return fft_g1(self.ks.fs, h_ext)

    def fk20_single(self, poly) -> JacobianPoint:
        """All n proofs for p at the n-th roots of unity, natural order
        (reference: FK20Single, fk20_single.go:122-137). poly: uint32[n, 16].
        """
        if poly.shape[0] != self.n:
            raise ValueError(f"expected polynomial of length {self.n}")
        return self._jit_single(poly)

    def fk20_single_da_optimized(self, poly) -> JacobianPoint:
        """All 2n proofs for an extended polynomial whose top n
        coefficients are zero (reference: FK20SingleDAOptimized,
        fk20_single.go:139-173). poly: uint32[2n, 16]."""
        if poly.shape[0] != self.n2:
            raise ValueError(f"expected polynomial of length {self.n2}")
        return self._jit_da_opt(poly)

    def da_using_fk20(self, poly) -> JacobianPoint:
        """Extend an n-polynomial to 2n, produce the 2n proofs in
        reverse-bit order — the data-availability layout
        (reference: DAUsingFK20, fk20_single.go:176-196)."""
        n = poly.shape[0]
        if n != self.n:
            raise ValueError(f"expected polynomial of length {self.n}")
        ext = jnp.concatenate([poly, fr.zeros((n,))], axis=0)
        proofs = self.fk20_single_da_optimized(ext)
        return reverse_bit_order_g1(proofs)
