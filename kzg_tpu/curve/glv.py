"""Host-side GLV scalar decomposition and signed-window recoding.

For scalars known on the host (FFT-G1 twiddles: the domain's roots of
unity), the GLV split k = k1 + lambda*k2 is exact integer division —
k2 = k // lambda, k1 = k mod lambda — giving two non-negative halves
below 2^128, each recoded into 33 signed 4-bit digits. The device then
runs a 33-window ladder over the point and its endomorphism image
phi(x, y) = (beta*x, y) instead of the 64-window full-width ladder:
~45% fewer point doublings per twiddle multiply.

The reference has no analogue (its MulG1 delegates to kilic's generic
scalar mul, bls/bls_kilic.go:41-45); this is TPU-side algorithmic
headroom on the FFT-G1 hot path (fft_g1.go:33-56), exploiting that FFT
twiddles are static while kilic must treat every scalar as dynamic.
"""

from __future__ import annotations

import functools

import numpy as np

from ..field.constants import FR_MODULUS

GLV_LAMBDA = 0xAC45A4010001A40200000000FFFFFFFF

N_WINDOWS = 33  # ceil(128 / 4) + 1 carry digit from signed recoding


def signed_digits(k: int, n_windows: int = N_WINDOWS) -> list:
    """Non-negative int -> signed 4-bit digits (LSB-first) in [-7, 8]
    (d == 8 is kept unchanged, so the range is asymmetric toward +8)
    with sum d_j * 16^j == k. Requires k < 16^(n_windows-1) * 8."""
    out = []
    for _ in range(n_windows):
        d = k & 0xF
        if d > 8:
            d -= 16
            k += 16
        k >>= 4
        out.append(d)
    if k:
        raise ValueError("scalar too wide for the window count")
    return out


def decompose(k: int):
    """k in [0, r) -> (k1, k2) with k == k1 + lambda*k2 (over the
    integers), both in [0, 2^128)."""
    k %= FR_MODULUS
    k2, k1 = divmod(k, GLV_LAMBDA)
    return k1, k2


@functools.lru_cache(maxsize=None)
def _twiddle_digits_cached(scalars: tuple) -> tuple:
    d1 = np.empty((len(scalars), N_WINDOWS), dtype=np.int32)
    d2 = np.empty((len(scalars), N_WINDOWS), dtype=np.int32)
    for i, k in enumerate(scalars):
        k1, k2 = decompose(k)
        d1[i] = signed_digits(k1)
        d2[i] = signed_digits(k2)
    return d1, d2


def twiddle_digits(scalars) -> tuple:
    """Iterable of canonical host ints -> (d1, d2) int32[N, 33] signed
    digit arrays for the GLV two-ladder (cached per scalar tuple)."""
    return _twiddle_digits_cached(tuple(int(s) for s in scalars))
