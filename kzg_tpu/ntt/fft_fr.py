"""Radix-2 (I)FFT over Fr as iterative vectorized butterfly stages.

Replaces the reference's recursive pointer FFT (fft_fr.go:8-105) with the
TPU-idiomatic form: bit-reversal gather, then log2(n) decimation-in-time
stages, each one fused batched mul/add/sub over the whole array. Twiddles
are gathered from the precomputed domain table with static indices.

Semantics match the reference exactly: forward computes the natural-order
DFT out[i] = sum_j vals[j] * w^(i*j); inverse uses the reversed (inverse)
root table and scales by 1/n (fft_fr.go:76-105). All values are exact field
elements, so any correct FFT algorithm is bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from .bitrev import bit_reversal_indices, brp_permute
from .domain import FFTSettings, next_pow_of_2


def take_strided(roots, count: int, stride: int):
    """roots[0:count*stride:stride] without a gather: strided access into
    the power circle lowers to reshape + slice (TPU gathers are slow)."""
    if stride == 1:
        return roots[:count]
    return roots[: count * stride].reshape(count, stride, roots.shape[-1])[
        :, 0, :
    ]


@functools.partial(jax.jit, static_argnames=("max_width",))
def _fft_core(vals, roots, inv_n, max_width: int):
    """vals: uint32[..., n, 16] (n static from shape). roots: forward or
    reverse table. inv_n: None (forward) or Montgomery limbs of 1/n.

    With the "pallas" field backend each stage runs as one fused
    butterfly kernel (t = b*tw; a+t; a-t with all REDC intermediates
    VMEM-resident — field/pallas_kernels.py); the XLA layer only slices
    and re-concatenates the halves. The vector path composes fr.mul/
    add/sub as plain XLA ops.
    """
    from ..field.backend import field_backend

    n = vals.shape[-2]
    if n == 1:
        return vals if inv_n is None else fr.mul(vals, inv_n)
    use_pallas = field_backend() == "pallas"
    x = brp_permute(vals, axis=-2)
    logn = n.bit_length() - 1
    batch = vals.shape[:-2]
    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        stride = max_width // m
        tw = take_strided(roots, half, stride)  # (half, 16)
        x = x.reshape(batch + (n // m, m, fr.N_LIMBS))
        a = x[..., :half, :]
        b = x[..., half:, :]
        if use_pallas:
            from ..field.pallas_kernels import butterfly_pallas

            hi, lo = butterfly_pallas(fr.SPEC, a, b, tw)
        else:
            t = fr.mul(b, tw)
            hi, lo = fr.add(a, t), fr.sub(a, t)
        x = jnp.concatenate([hi, lo], axis=-2)
    x = x.reshape(batch + (n, fr.N_LIMBS))
    if inv_n is not None:
        x = fr.mul(x, inv_n)
    return x


def fft(fs: FFTSettings, vals, inverse: bool = False):
    """(I)FFT of uint32[..., n, 16] Montgomery Fr values.

    Pads n up to the next power of two with zeros, like the reference's FFT
    wrapper (fft_fr.go:55-74). n must not exceed fs.max_width.
    """
    n = vals.shape[-2]
    if n > fs.max_width:
        raise ValueError(
            f"got {n} values but only have {fs.max_width} roots of unity"
        )
    n2 = next_pow_of_2(n)
    if n2 != n:
        pad = [(0, 0)] * (vals.ndim - 2) + [(0, n2 - n), (0, 0)]
        vals = jnp.pad(vals, pad)
    if inverse:
        return _fft_core(
            vals,
            fs.reverse_roots_of_unity,
            fs.inv_length(n2),
            max_width=fs.max_width,
        )
    return _fft_core(
        vals, fs.expanded_roots_of_unity, None, max_width=fs.max_width
    )


def coset_scale(fs: FFTSettings, n: int, inverse: bool = False):
    """Twiddle vector [g^0, g^1, ..., g^(n-1)] where g is the 2n-th root of
    the domain (the coset offset used by the DAS extension). uint32[n, 16]."""
    stride = fs.max_width // (2 * n)
    roots = fs.reverse_roots_of_unity if inverse else fs.expanded_roots_of_unity
    return take_strided(roots, n, stride)
