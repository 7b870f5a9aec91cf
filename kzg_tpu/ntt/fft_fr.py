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
from .bitrev import brp_permute
from .domain import FFTSettings, next_pow_of_2


def take_strided(roots, count: int, stride: int):
    """roots[0:count*stride:stride] without a gather: strided access into
    the power circle lowers to reshape + slice (TPU gathers are slow)."""
    if stride == 1:
        return roots[:count]
    return roots[: count * stride].reshape(count, stride, roots.shape[-1])[
        :, 0, :
    ]


@functools.lru_cache(maxsize=None)
def _stage_tws_ext(max_scale: int, n: int, inverse: bool, inv_log2):
    """Host-precomputed per-stage twiddle vectors in R_ext form for
    the lazy Pallas FFT pipeline: stage s gets the COMPACT (LL, half)
    distinct twiddles (device-broadcast to the full lane vector).
    Stage 1's twiddle is always 1 and is skipped (mul-free kernel).
    Also returns the exit-scale constant tile: R_ext mod r (forward) or
    2^-inv_log2 * R_ext mod r (inverse) — the caller's inverse scale
    rides along for free. inv_log2 is the CALLER's scale (a sharded
    local IFFT of length n/D passes the global log2(n), so it must not
    be re-derived from the local shape here).
    """
    from ..field.pallas_kernels import LANES, encode_ext
    from .domain import FFTSettings

    roots_int = FFTSettings(max_scale).roots_of_unity_int()
    max_width = 1 << max_scale
    roots = tuple(reversed(roots_int)) if inverse else roots_int
    logn = n.bit_length() - 1
    per_stage = []
    for s in range(2, logn + 1):
        m = 1 << s
        half = m >> 1
        stride = max_width // m
        tws = encode_ext(fr.SPEC, [roots[j * stride] for j in range(half)])
        # COMPACT (LL, half): tiled to the full (LL, batch*n/2) lane
        # vector on DEVICE (a cheap broadcast) — host-tiling these was
        # ~677 MB of baked-in constants at scale 20
        per_stage.append(tws.T.copy())
    scale = 1 if not inverse else pow(1 << inv_log2, -1, fr.SPEC.modulus)
    c = encode_ext(fr.SPEC, scale)
    c_tile = np.broadcast_to(
        c[:, None], (c.shape[0], LANES)).copy()
    return tuple(per_stage), c_tile


def _fft_core_pallas(vals, inv_log2, max_width: int):
    """Lazy lane-layout FFT pipeline (field/pallas_kernels.py "lazy FFT
    stage kernels"): the whole transform runs in the 17-limb lazy domain
    with TWO relayouts total (entry/exit) and ZERO canonical reductions
    between stages; the single exit multiply restores the domain,
    canonicalizes, and carries the inverse transform's scale."""
    from ..field.pallas_kernels import butterfly_lazy, canon_scale

    inverse = inv_log2 is not None
    n = vals.shape[-2]
    batch_shape = vals.shape[:-2]
    batch = 1
    for d in batch_shape:
        batch *= d
    logn = n.bit_length() - 1
    per_stage, c_tile = _stage_tws_ext(
        max_width.bit_length() - 1, n, inverse, inv_log2)

    x = brp_permute(vals, axis=-2)
    # entry relayout: (..., n, L) -> (L, batch*n) lane layout
    xl = jnp.moveaxis(x.reshape(batch * n, fr.N_LIMBS), -1, 0)

    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        rows = xl.shape[0]
        xs = xl.reshape(rows, batch * (n // m), m)
        a = xs[:, :, :half].reshape(rows, batch * n // 2)
        b = xs[:, :, half:].reshape(rows, batch * n // 2)
        if s == 1:
            tw = None
        else:
            compact = jnp.asarray(per_stage[s - 2])  # (LL, half)
            tw = jnp.broadcast_to(
                compact[:, None, :],
                (compact.shape[0], batch * (n // m), half),
            ).reshape(compact.shape[0], batch * n // 2)
        hi, lo = butterfly_lazy(fr.SPEC, a, b, tw, first=(s == 1))
        rows = hi.shape[0]
        xl = jnp.concatenate(
            [hi.reshape(rows, batch * (n // m), half),
             lo.reshape(rows, batch * (n // m), half)],
            axis=-1,
        ).reshape(rows, batch * n)

    out = canon_scale(fr.SPEC, xl, jnp.asarray(c_tile))
    # exit relayout: (L, batch*n) -> (..., n, L)
    return jnp.moveaxis(out, 0, -1).reshape(batch_shape + (n, fr.N_LIMBS))


@functools.partial(jax.jit, static_argnames=("inv_log2", "max_width"))
def _fft_core(vals, roots, inv_log2, max_width: int):
    """vals: uint32[..., n, 16] (n static from shape). roots: forward or
    reverse table. inv_log2: None (forward) or the STATIC log2 of the
    inverse transform's scale denominator (the output is multiplied by
    2^-inv_log2 mod r). Every scale in the library is 1/2^k — a plain
    IFFT passes log2(n); a sharded local IFFT passes the GLOBAL log2(n)
    while transforming a length-n/D block, which is why the scale is an
    explicit parameter and never derived from the input shape.

    With the "pallas" field backend the whole transform runs as the
    lane-layout lazy stage pipeline (_fft_core_pallas); the vector path
    composes fr.mul/add/sub as plain XLA ops per stage.
    """
    from ..field.backend import field_backend

    def inv_limbs():
        return jnp.asarray(
            fr.from_int(pow(1 << inv_log2, -1, fr.SPEC.modulus)))

    n = vals.shape[-2]
    if n == 1:
        return vals if inv_log2 is None else fr.mul(vals, inv_limbs())
    if field_backend() == "pallas":
        # NOTE: a fully-fused four-step (n1 x n2) two-kernel variant was
        # built and measured on-chip (round 4): bit-exact, but SLOWER
        # than this per-stage pipeline (237 us vs 108 us at scale 12,
        # tied at scale 15) — the per-stage kernels are already
        # mul-bound, so killing the inter-stage HBM traffic bought
        # nothing. Removed; see git history (kzg_tpu/ntt/pallas_fft.py).
        return _fft_core_pallas(vals, inv_log2, max_width)
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
        t = fr.mul(b, tw)
        hi, lo = fr.add(a, t), fr.sub(a, t)
        x = jnp.concatenate([hi, lo], axis=-2)
    x = x.reshape(batch + (n, fr.N_LIMBS))
    if inv_log2 is not None:
        x = fr.mul(x, inv_limbs())
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
            n2.bit_length() - 1,
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
