"""Erasure-coded data recovery from partial evaluations.

Reference: RecoverPolyFromSamples / ShiftPoly / UnshiftPoly
(recover_from_samples.go:9-109) and the legacy randomized
ErasureCodeRecover (legacy_recovery.go:162-283).

Given >= 1/2 of the evaluations of a polynomial on a power-of-two domain
(the DAS extended data), reconstruct all of them:

    (p*Z)  =  IFFT(samples_masked * Z_evals)          Z = zero poly of the
    p      =  unshift( FFT(shift(p*Z)) / FFT(shift(Z)) )   missing set

The coset shift by a small factor k moves the evaluation points off the
domain so the division is well-defined; the reference uses k=5 and a
random k with retries in the legacy path. Unlike the reference's
per-element InvModFr loop (recover_from_samples.go:88-91), the pointwise
division uses one Montgomery-trick batch inversion (log-depth scans +
a single Fermat ladder).

Sample availability is host knowledge: `missing` masks/indices are host
data, everything else runs on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import poly
from ..field import fr
from ..field.constants import FR_MODULUS
from ..ntt.domain import FFTSettings
from ..ntt.fft_fr import _fft_core, fft
from .zero_poly import zero_poly_graph, zero_poly_via_multiplication

SHIFT_FACTOR = 5  # reference: recover_from_samples.go:9 (shiftFactor)


@functools.partial(jax.jit, static_argnames=("max_width",))
def _recover_core(samples, missing_mask, zero_eval, zero_coeffs,
                  shift_mont, shift_inv_mont, roots, rev_roots,
                  max_width: int):
    """The whole shift-divide-unshift pipeline as one compiled dispatch."""
    n = samples.shape[0]
    inv_log2 = n.bit_length() - 1
    masked = fr.select(missing_mask, fr.zeros((n,)), samples)
    pz_evals = fr.mul(masked, zero_eval)
    pz = _fft_core(pz_evals, rev_roots, inv_log2, max_width=max_width)
    scale = poly.powers_of(shift_mont, n)
    scale_inv = poly.powers_of(shift_inv_mont, n)
    eval_pz = _fft_core(fr.mul(pz, scale), roots, None, max_width=max_width)
    eval_z = _fft_core(fr.mul(zero_coeffs, scale), roots, None,
                       max_width=max_width)
    # eval_z is provably nonzero: a zero would need shift*w^i to be a
    # root of Z, i.e. the shift factor inside the domain subgroup, which
    # recover_poly_from_samples rejects up front.
    eval_p = fr.mul(eval_pz, fr.batch_inv(eval_z))
    shifted_p = _fft_core(eval_p, rev_roots, inv_log2, max_width=max_width)
    p_coeffs = fr.mul(shifted_p, scale_inv)
    recovered = _fft_core(p_coeffs, roots, None, max_width=max_width)
    return recovered, eval_z


def shift_poly(coeffs, factor: int = SHIFT_FACTOR):
    """p(x) -> p(k*x): scale coefficient i by k^i
    (reference: ShiftPoly, recover_from_samples.go:9-21)."""
    n = coeffs.shape[-2]
    scale = poly.powers_of(jnp.asarray(fr.from_int(factor)), n)
    return fr.mul(coeffs, scale)


def unshift_poly(coeffs, factor: int = SHIFT_FACTOR):
    """p(x) -> p(x/k) (reference: UnshiftPoly,
    recover_from_samples.go:24-40)."""
    inv = pow(factor, -1, FR_MODULUS)
    return shift_poly(coeffs, inv)


@functools.lru_cache(maxsize=None)
def _recover_fused_fn(G: int, n: int, max_width: int):
    """Zero-poly construction + recovery pipeline + self-check fused into
    ONE compiled dispatch per (leaf count, width). Per-dispatch latency
    to the device can reach tens of ms in this environment, so the
    three-dispatch structure (zero-poly jit, recover jit, check jit)
    dominated wall clock; fusing makes recovery one round-trip."""

    @jax.jit
    def run(root_idx, valid, samples, missing_mask, shift_mont,
            shift_inv_mont, roots, rev_roots):
        zero_eval, zero_coeffs = zero_poly_graph(
            root_idx, valid, roots, rev_roots, n, max_width)
        recovered, _ = _recover_core(
            samples, missing_mask, zero_eval, zero_coeffs, shift_mont,
            shift_inv_mont, roots, rev_roots, max_width=max_width)
        # reference self-check (recover_from_samples.go:103-107)
        ok = jnp.all(fr.eq(recovered, samples) | missing_mask)
        return recovered, ok

    return run


def _recover_with_shift(fs: FFTSettings, samples, missing_idx, n: int,
                        shift: int):
    """Core pipeline with a given coset shift factor. Returns the
    recovered evaluation vector uint32[n, 16]."""
    zero_eval, zero_coeffs = zero_poly_via_multiplication(fs, missing_idx, n)
    mask = np.zeros(n, dtype=bool)
    mask[missing_idx] = True
    return _recover_core(
        samples, jnp.asarray(mask), zero_eval, zero_coeffs,
        jnp.asarray(fr.from_int(shift)),
        jnp.asarray(fr.from_int(pow(shift, -1, FR_MODULUS))),
        fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
        max_width=fs.max_width,
    )


def recover_poly_from_samples(fs: FFTSettings, samples, missing_indices):
    """Reconstruct the full evaluation vector
    (reference: RecoverPolyFromSamples, recover_from_samples.go:42-109).

    samples: uint32[n, 16] evaluations with arbitrary values in the
    missing lanes. missing_indices: host ints. Returns uint32[n, 16].
    Raises if the result disagrees with the given samples (the reference's
    self-check, recover_from_samples.go:103-107).

    Requires deg(p) + len(missing) < n — i.e. the data must actually be
    redundant (a DAS-extended polynomial has deg < n/2, tolerating up to
    n/2 missing). Otherwise (p*Z) aliases under the length-n IFFT.
    """
    from .zero_poly import leaf_layout

    n = samples.shape[0]
    missing = np.asarray(sorted(int(i) for i in missing_indices),
                         dtype=np.int64)
    if missing.shape[0] > n // 2:
        raise ValueError("cannot recover from more than n/2 missing samples")
    if pow(SHIFT_FACTOR, n, FR_MODULUS) == 1:
        raise ValueError("shift factor lies in the evaluation domain")
    if missing.shape[0] == 0:
        return samples
    if n & (n - 1) != 0:
        raise ValueError("width must be a power of two")
    if n > fs.max_width:
        raise ValueError("width larger than domain")
    stride = fs.max_width // n
    idx, valid_np, G = leaf_layout(fs, missing, n, stride)
    mask = np.zeros(n, dtype=bool)
    mask[missing] = True
    run = _recover_fused_fn(G, n, fs.max_width)
    recovered, ok = run(
        idx, valid_np, samples, jnp.asarray(mask),
        jnp.asarray(fr.from_int(SHIFT_FACTOR)),
        jnp.asarray(fr.from_int(pow(SHIFT_FACTOR, -1, FR_MODULUS))),
        fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
    )
    if not bool(ok):
        raise ValueError("recovery self-check failed: inconsistent samples")
    return recovered


# The legacy randomized-shift recovery lives in das/legacy.py as a fully
# independent second implementation (its own zero-poly construction and
# batch inversion), mirroring the reference's legacy_recovery.go role as
# a differential oracle for this modern pipeline.
from .legacy import erasure_code_recover  # noqa: E402,F401
