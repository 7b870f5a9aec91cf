"""Legacy erasure recovery: an INDEPENDENT second implementation.

Reference: ErasureCodeRecover (legacy_recovery.go:162-283) with its own
building blocks `_zPoly` (legacy_recovery.go:93-157), `multiInv`
(legacy_recovery.go:49-65) and `pOfKX` (legacy_recovery.go:68-78) —
the older algorithm the reference's tests cross-check against the
modern RecoverPolyFromSamples. This module plays the same role here:
every piece is implemented differently from das/recovery.py +
das/zero_poly.py so the two pipelines form a genuine differential pair:

  * zero polynomial: direct monomial-expansion scan over ALL missing
    roots at full width (O(m*n) batched work, no FFT product tree)
  * pointwise division: true Montgomery-trick batch inversion — two
    log-depth prefix-product scans plus ONE Fermat inverse — instead of
    the fully-batched Fermat ladder
  * coset shift: randomized factor k with a retry loop, per the legacy
    contract (legacy_recovery.go:203-281)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..field import fr
from ..field.constants import FR_MODULUS
from ..ntt.domain import FFTSettings
from ..ntt.fft_fr import _fft_core


def zero_poly_direct(fs: FFTSettings, missing_indices, length: int):
    """Z(x) = prod_{i in missing} (x - w^(i*stride)) by direct monomial
    expansion: a single scan over the m factors, each step one fused
    shift-multiply-add over the full width (reference builds leaves this
    way, zero_poly.go:17-39; here there is no tree on top — that is the
    point: no shared code path with das/zero_poly.py).

    Returns coefficients uint32[length, 16] (monic, zero-padded).
    """
    missing = sorted(int(i) for i in missing_indices)
    m = len(missing)
    if m >= length:
        raise ValueError("cannot build zero polynomial of full length")
    stride = fs.max_width // length
    roots = np.asarray(
        jax.device_get(fs.expanded_roots_of_unity))[
            [i * stride for i in missing]]
    neg_roots = fr.neg(jnp.asarray(roots)) if m else None

    one = jnp.asarray(fr.from_int(1))
    poly0 = jnp.zeros((length, fr.N_LIMBS), dtype=jnp.uint32)
    poly0 = poly0.at[0, :].set(one)
    if m == 0:
        return poly0

    def step(poly, negr):
        shifted = jnp.concatenate(
            [jnp.zeros_like(poly[:1]), poly[:-1]], axis=0)
        return fr.add(shifted, fr.mul(poly, negr[None, :])), None

    poly, _ = lax.scan(step, poly0, neg_roots)
    return poly


def batch_inv(vals):
    """Montgomery-trick batch inversion (reference: multiInv,
    legacy_recovery.go:49-65, and BatchInvModFr, bls/globals.go:117-124).

    TPU shape: exclusive prefix and suffix products via two log-depth
    `lax.associative_scan`s over the batch axis, ONE Fermat inverse of
    the total product, then inv_i = prefix_i * suffix_i * total_inv.
    All inputs must be nonzero (a zero poisons the whole batch — the
    legacy recovery retries with a fresh shift in that case).
    """
    n = vals.shape[0]
    if n == 1:
        return fr.inv(vals)
    prefix = lax.associative_scan(fr.mul, vals, axis=0)  # inclusive
    suffix = lax.associative_scan(fr.mul, vals, axis=0, reverse=True)
    total_inv = fr.inv(prefix[-1])
    one = jnp.asarray(fr.from_int(1))
    ex_prefix = jnp.concatenate([one[None], prefix[:-1]], axis=0)
    ex_suffix = jnp.concatenate([suffix[1:], one[None]], axis=0)
    return fr.mul(fr.mul(ex_prefix, ex_suffix), total_inv)


def p_of_kx(coeffs, k_mont):
    """p(x) -> p(k*x): scale coefficient i by k^i (reference: pOfKX,
    legacy_recovery.go:68-78), powers built by a log-depth scan."""
    n = coeffs.shape[0]
    pows = lax.associative_scan(
        fr.mul, jnp.broadcast_to(k_mont, (n, fr.N_LIMBS)), axis=0)
    one = jnp.asarray(fr.from_int(1))
    pows = jnp.concatenate([one[None], pows[:-1]], axis=0)  # k^0..k^(n-1)
    return fr.mul(coeffs, pows)


@functools.partial(jax.jit, static_argnames=("max_width",))
def _legacy_recover_core(samples, missing_mask, z_coeffs, k_mont,
                         k_inv_mont, roots, rev_roots,
                         max_width: int):
    """One compiled dispatch: the legacy pipeline given Z's coefficients.

    Returns (recovered evals, shifted-Z evals) — the caller inspects the
    latter for zeros to decide on a retry (legacy_recovery.go:243-254)."""
    inv_log2 = samples.shape[0].bit_length() - 1
    z_evals = _fft_core(z_coeffs, roots, None, max_width=max_width)
    e_vals = fr.select(missing_mask, fr.zeros(samples.shape[:-1]), samples)
    e_vals = fr.mul(e_vals, z_evals)
    d_poly = _fft_core(e_vals, rev_roots, inv_log2, max_width=max_width)
    q1_evals = _fft_core(p_of_kx(d_poly, k_mont), roots, None,
                         max_width=max_width)
    q2_evals = _fft_core(p_of_kx(z_coeffs, k_mont), roots, None,
                         max_width=max_width)
    qs = fr.mul(q1_evals, batch_inv(q2_evals))
    d_over_z = _fft_core(qs, rev_roots, inv_log2, max_width=max_width)
    p_coeffs = p_of_kx(d_over_z, k_inv_mont)
    recovered = _fft_core(p_coeffs, roots, None, max_width=max_width)
    return recovered, q2_evals


def erasure_code_recover(fs: FFTSettings, samples, missing_indices,
                         seed: int = 42, max_tries: int = 10):
    """Legacy recovery (reference: ErasureCodeRecover,
    legacy_recovery.go:162-283): random coset shift k with retries until
    the shifted zero polynomial is invertible everywhere. Built entirely
    from this module's independent primitives, so it serves as a true
    second oracle against recover_poly_from_samples.
    """
    n = samples.shape[0]
    missing = list(missing_indices)
    if len(missing) > n // 2:
        raise ValueError("cannot recover from more than n/2 missing samples")
    z_coeffs = zero_poly_direct(fs, missing, n)
    mask = np.zeros(n, dtype=bool)
    mask[missing] = True
    maskj = jnp.asarray(mask)
    rng = np.random.default_rng(seed)
    for _ in range(max_tries):
        k = int(rng.integers(2, 1 << 30))
        if pow(k, n, FR_MODULUS) == 1:
            continue  # k inside the domain: shifted Z still vanishes
        recovered, q2 = _legacy_recover_core(
            samples, maskj, z_coeffs,
            jnp.asarray(fr.from_int(k)),
            jnp.asarray(fr.from_int(pow(k, -1, FR_MODULUS))),
            fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
            max_width=fs.max_width,
        )
        if bool(jnp.any(fr.is_zero(q2))):
            continue  # bad shift, retry with new k
        if bool(jnp.all(fr.eq(recovered, samples) | maskj)):
            return recovered
    raise ValueError("erasure recovery failed after retries")
