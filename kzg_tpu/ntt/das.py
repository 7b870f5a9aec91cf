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


@functools.lru_cache(maxsize=None)
def _das_stage_tws(max_scale: int, n: int):
    """Host-precomputed compact twiddles (R_ext form) for the half-FFT
    extension pipeline (reference recursion, das_extension.go:7-66),
    iterative form over K = log2(n) levels with base stride
    max_width/(2n):

      down level k (DIF, reverse roots):  tw_i = w^-(2 i stride_k)
      up   level k (DIT, forward roots):  tw_i = w^(+(1+2i) stride_k)
      exit scale 1/n (the deferred per-layer 1/2s, applied once).

    Returns (down tuple, up tuple, exit c_tile), each stage a compact
    (LL, m/2) array device-tiled by the pipeline."""
    from ..field.pallas_kernels import LANES, encode_ext
    from .domain import FFTSettings

    roots_int = FFTSettings(max_scale).roots_of_unity_int()
    rev = tuple(reversed(roots_int))
    max_width = 1 << max_scale
    stride0 = max_width // (2 * n)
    K = n.bit_length() - 1
    down, up = [], []
    for k in range(K):
        m = n >> k
        stride = stride0 << k
        down.append(encode_ext(
            fr.SPEC, [rev[i * 2 * stride] for i in range(m // 2)]).T.copy())
        up.append(encode_ext(
            fr.SPEC,
            [roots_int[(1 + 2 * i) * stride] for i in range(m // 2)]
        ).T.copy())
    scale = pow(n, -1, fr.SPEC.modulus)
    c = encode_ext(fr.SPEC, scale)
    c_tile = np.broadcast_to(c[:, None], (c.shape[0], LANES)).copy()
    return tuple(down), tuple(up), c_tile


def _das_core_pallas(evens, max_width: int):
    """The reference's specialized half-FFT extension as a lazy
    lane-layout pipeline: ~n/2 multiplies per level over 2K-1 levels —
    about HALF the multiplies of the algebraic IFFT+FFT form (which is
    why the reference's FFTExtension beats its own FFT per element,
    BASELINE.md). Whole transform in the 17-limb lazy domain, one
    entry/exit pair; unmultiplied down-sweep hi chains are re-reduced
    every few levels (butterfly_lazy_dif reduce_hi) to stay inside the
    R_ext headroom."""
    from ..field.pallas_kernels import (
        butterfly_lazy, butterfly_lazy_dif, canon_scale)

    n = evens.shape[-2]
    batch_shape = evens.shape[:-2]
    batch = 1
    for d in batch_shape:
        batch *= d
    K = n.bit_length() - 1
    down, up, c_tile = _das_stage_tws(max_width.bit_length() - 1, n)

    xl = jnp.moveaxis(evens.reshape(batch * n, fr.N_LIMBS), -1, 0)

    def split(x, m):
        rows = x.shape[0]
        xs = x.reshape(rows, batch * (n // m), m)
        return (xs[:, :, : m // 2].reshape(rows, batch * n // 2),
                xs[:, :, m // 2:].reshape(rows, batch * n // 2))

    def merge(hi, lo, m):
        rows = hi.shape[0]
        return jnp.concatenate(
            [hi.reshape(rows, batch * (n // m), m // 2),
             lo.reshape(rows, batch * (n // m), m // 2)],
            axis=-1,
        ).reshape(rows, batch * n)

    def tile_tw(compact, m):
        return jnp.broadcast_to(
            jnp.asarray(compact)[:, None, :],
            (compact.shape[0], batch * (n // m), m // 2),
        ).reshape(compact.shape[0], batch * n // 2)

    # down sweep (DIF, reverse roots); re-reduce the add chain every
    # 6 levels (hi magnitude doubles per level: 2^6 * ~3r << 2^17 r)
    for k in range(K):
        m = n >> k
        a, b = split(xl, m)
        hi, lo = butterfly_lazy_dif(
            fr.SPEC, a, b, tile_tw(down[k], m), first=(k == 0),
            reduce_hi=(k % 6 == 5 or k == K - 1))
        xl = merge(hi, lo, m)
    # up sweep (DIT, forward odd roots)
    for k in range(K - 1, -1, -1):
        m = n >> k
        a, b = split(xl, m)
        hi, lo = butterfly_lazy(
            fr.SPEC, a, b, tile_tw(up[k], m), first=False)
        xl = merge(hi, lo, m)
    out = canon_scale(fr.SPEC, xl, jnp.asarray(c_tile))
    return jnp.moveaxis(out, 0, -1).reshape(batch_shape + (n, fr.N_LIMBS))


@functools.partial(jax.jit, static_argnames=("max_width", "interleave"))
def _das_core(evens, roots, rev_roots, max_width: int,
              interleave: bool):
    from ..field.backend import field_backend

    n = evens.shape[-2]
    if field_backend() == "pallas" and n > 1:
        odds = _das_core_pallas(evens, max_width)
    else:
        coeffs = _fft_core(evens, rev_roots, n.bit_length() - 1,
                           max_width=max_width)
        stride = max_width // (2 * n)
        coset = take_strided(roots, n, stride)
        odds = _fft_core(fr.mul(coeffs, coset), roots, None,
                         max_width=max_width)
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
