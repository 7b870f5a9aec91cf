"""FK20 multi (coset) amortized proofs: k = n/l proofs, each covering an
l-point coset, in O(n log n).

Reference: fk20_multi.go:25-133 + NewFK20MultiSettings (kzg.go:66-116).
The polynomial is split into l strided sub-polynomials; each contributes
a Toeplitz product against its own strided CRS slice, and the l products
accumulate into one hExtFFT. Where the reference runs the l products in a
sequential loop (fk20_multi.go:80-91), here all l Toeplitz coefficient
vectors are stacked on a leading batch axis: one batched Fr-FFT, one
batched pointwise scalar-mul, then a log2(l) tree-sum of point batches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..curve import g1
from ..curve.fft_g1 import fft_g1, reverse_bit_order_g1
from ..curve.msm import tree_reduce
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


def toeplitz_coeffs_step_strided(poly, offset: int, stride: int):
    """Strided circulant vector (reference: toeplitzCoeffsStepStrided,
    fk20_single.go:89-119): for the sub-polynomial sub[m] = f_{offset+m*l},
        [sub_{k-1}, 0 x (k+1), sub_1, ..., sub_{k-2}]   (length 2k)
    """
    n = poly.shape[0]
    k = n // stride
    sub = poly[offset::stride]  # (k, L)
    return jnp.concatenate(
        [sub[k - 1 : k], fr.zeros((k + 1,)), sub[1 : k - 1]], axis=0
    )


class FK20MultiSettings:
    """Precomputes the l per-offset xExtFFT tables
    (reference: NewFK20MultiSettings, kzg.go:73-116).

    n2 = 2n is the extended width; chunk_len = l is the coset size.
    """

    def __init__(self, ks: KZGSettings, n2: int, chunk_len: int):
        if n2 & (n2 - 1) != 0 or n2 < 2:
            raise ValueError("n2 must be a power of two >= 2")
        if n2 > ks.fs.max_width:
            raise ValueError("n2 too large for the FFT settings")
        if chunk_len & (chunk_len - 1) != 0 or chunk_len < 1:
            raise ValueError("chunk_len must be a power of two >= 1")
        if chunk_len >= n2 // 2:
            raise ValueError("chunk_len too large")
        self.ks = ks
        self.n2 = n2
        self.chunk_len = chunk_len
        n = n2 // 2
        self.n = n
        k = n // chunk_len
        self.k = k
        l = chunk_len
        # Per-offset strided CRS slices (derived from the block-quotient
        # identity h_m^(i) = sum_c f_{(c+m+1)l+i} [s^{cl+i}]):
        #   x_i = [s^{(k-2)l+i}, s^{(k-3)l+i}, ..., s^{l+i}, s^i, O]
        # stacked after part1 into one (l, 2k) point batch.
        tables = []
        for i in range(l):
            idx = np.arange(n - 2 * l + i, i - 1, -l, dtype=np.int32)
            assert idx.shape[0] == k - 1
            x = concat_points(
                take_points(ks.secret_g1, idx), g1.infinity((1,))
            )
            tables.append(toeplitz_part1(ks.fs, x))
        self.x_ext_fft_files = JacobianPoint(
            *(jnp.stack([getattr(t, c) for t in tables], axis=0)
              for c in ("x", "y", "z"))
        )  # (l, 2k) points

        self._init_jits()

    def _init_jits(self) -> None:
        """Whole-pipeline jits: one device dispatch per proof batch.
        Also called by the persistence loader (kzg/persist.py)."""
        import jax

        self._jit_multi = jax.jit(self._fk20_multi_impl)
        self._jit_multi_da = jax.jit(self._fk20_multi_da_impl)

    def _h_from_reduced(self, reduced) -> JacobianPoint:
        """reduced: uint32[n, 16] -> h point batch (k,)."""
        l, k = self.chunk_len, self.k
        tcs = jnp.stack(
            [toeplitz_coeffs_step_strided(reduced, i, l) for i in range(l)],
            axis=0,
        )  # (l, 2k, 16)
        h_ext_fft_per = toeplitz_part2(
            self.ks.fs, tcs, self.x_ext_fft_files
        )  # (l, 2k) points
        h_ext_fft = tree_reduce(g1.ops, h_ext_fft_per)  # (2k,)
        return toeplitz_part3(self.ks.fs, h_ext_fft)  # (k,)

    def _fk20_multi_impl(self, poly) -> JacobianPoint:
        h = self._h_from_reduced(poly)
        return fft_g1(self.ks.fs, h)

    def _fk20_multi_da_impl(self, poly) -> JacobianPoint:
        h = self._h_from_reduced(poly[: self.n])
        h_ext = concat_points(h, g1.infinity((self.k,)))
        return fft_g1(self.ks.fs, h_ext)

    def fk20_multi(self, poly) -> JacobianPoint:
        """k proofs for the k cosets of the n-domain, natural order
        (reference: FK20Multi, fk20_multi.go:25-54). poly: uint32[n, 16]."""
        if poly.shape[0] != self.n:
            raise ValueError(f"expected polynomial of length {self.n}")
        return self._jit_multi(poly)

    def fk20_multi_da_optimized(self, poly) -> JacobianPoint:
        """2k proofs for an extended polynomial with zero top half
        (reference: FK20MultiDAOptimized, fk20_multi.go:58-109).
        poly: uint32[2n, 16]."""
        if poly.shape[0] != self.n2:
            raise ValueError(f"expected polynomial of length {self.n2}")
        return self._jit_multi_da(poly)

    def da_using_fk20_multi(self, poly) -> JacobianPoint:
        """Extend to 2n and return the 2k coset proofs in reverse-bit
        order (reference: DAUsingFK20Multi, fk20_multi.go:113-133)."""
        if poly.shape[0] != self.n:
            raise ValueError(f"expected polynomial of length {self.n}")
        ext = jnp.concatenate([poly, fr.zeros((self.n,))], axis=0)
        proofs = self.fk20_multi_da_optimized(ext)
        return reverse_bit_order_g1(proofs)
