"""Radix-2 (I)FFT over G1 points (reference: fft_g1.go:11-94).

Identical butterfly structure to the Fr FFT, with point add/sub and
scalar-mul-by-twiddle instead of field ops. The scalar multiplications
dominate (each is a 255-step double-and-add over the whole batch); all
stages are full-batch vector work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..ntt.bitrev import bit_reversal_indices
from ..ntt.domain import FFTSettings
from ..ntt.bitrev import brp_permute
from ..ntt.fft_fr import take_strided
from . import g1
from .weierstrass import JacobianPoint


def _take_points(p: JacobianPoint, idx, axis=0) -> JacobianPoint:
    return JacobianPoint(*(jnp.take(c, idx, axis=axis) for c in p))


@functools.partial(jax.jit, static_argnames=("max_width",))
def _fft_g1_core(px, py, pz, roots, inv_n, max_width: int):
    n = px.shape[0]
    pts = JacobianPoint(px, py, pz)
    if n > 1:
        pts = JacobianPoint(*(brp_permute(c, axis=0) for c in pts))
        logn = n.bit_length() - 1
        for s in range(1, logn + 1):
            m = 1 << s
            half = m >> 1
            stride = max_width // m
            tw = take_strided(roots, half, stride)  # (half, 16) Fr twiddles
            resh = JacobianPoint(
                *(c.reshape((n // m, m) + c.shape[1:]) for c in pts)
            )
            a = JacobianPoint(*(c[:, :half] for c in resh))
            b = JacobianPoint(*(c[:, half:] for c in resh))
            t = g1.mul(b, tw)  # broadcast twiddles over the n//m axis
            lo = g1.add(a, t)
            hi = g1.sub(a, t)
            pts = JacobianPoint(
                *(
                    jnp.concatenate([l, h], axis=1).reshape((n,) + l.shape[2:])
                    for l, h in zip(lo, hi)
                )
            )
    if inv_n is not None:
        pts = g1.mul(pts, inv_n)
    return pts


def fft_g1(fs: FFTSettings, points: JacobianPoint, inverse: bool = False):
    """(I)FFT of a (n,) G1 point batch. n must be a power of two
    <= fs.max_width (the reference errors likewise, fft_g1.go:62-68)."""
    n = points.x.shape[0]
    if n > fs.max_width:
        raise ValueError("got more values than roots of unity")
    if n & (n - 1) != 0:
        raise ValueError("got a non-power-of-two number of values")
    roots = fs.reverse_roots_of_unity if inverse else fs.expanded_roots_of_unity
    inv_n = fs.inv_length(n) if inverse else None
    return _fft_g1_core(
        points.x, points.y, points.z, roots, inv_n, max_width=fs.max_width
    )


def reverse_bit_order_g1(points: JacobianPoint) -> JacobianPoint:
    """reference: reverseBitOrderG1 (fft_g1.go:97-107)."""
    return JacobianPoint(*(brp_permute(c, axis=0) for c in points))
