"""Polynomial primitives over Fr: evaluation, linear combination, division.

TPU-native counterparts of the reference's polynomial helpers:
  * Horner evaluation            (reference: EvalPolyAt/EvalPolyAtUnoptimized,
                                  bls/globals.go:76-95)
  * barycentric evaluation-form  (reference: EvaluatePolyInEvaluationForm,
    evaluation                    bls/globals.go:106-153)
  * random linear combination    (reference: PolyLinComb, bls/globals.go:155-178)
  * long division / factor       (reference: polyLongDiv/polyFactorDiv,
    division                      poly.go:6-40)

Everything operates on Montgomery limb batches `uint32[..., L]` (see
kzg_tpu.field.limbs). Where the reference loops element-by-element, these
run the whole polynomial on the vector unit; the only sequential pieces are
the genuinely serial recurrences (long division), expressed as `lax.scan`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .field import fr


def sum_fr(vals, axis: int = -2):
    """Field sum along `axis` via log2-depth pairwise tree reduction.

    vals: uint32[..., n, ..., L]. Works for any n (zero-pads to a power of
    two; zero is the additive identity so padding is free).
    """
    vals = jnp.moveaxis(vals, axis if axis >= 0 else axis + vals.ndim - 1, 0)
    n = vals.shape[0]
    while n > 1:
        if n % 2 == 1:
            vals = jnp.concatenate(
                [vals, jnp.zeros_like(vals[:1])], axis=0
            )
            n += 1
        vals = fr.add(vals[0::2], vals[1::2])
        n //= 2
    return vals[0]


def powers_of(x, n: int):
    """[x^0, x^1, ..., x^(n-1)] as uint32[n, L] via log-depth doubling.

    (The eth layer's ComputePowers, eth/helpers.go:87-95, is the scalar
    version of this.) x: single element uint32[L].
    """
    out = jnp.asarray(fr.from_int(1))[None, :]  # [1]
    cur = x[None, :]  # x^(2^k) ladder base: [x]
    while out.shape[0] < n:
        # out currently holds x^0..x^(m-1); multiply by x^m to extend
        ext = fr.mul(out, cur[0])
        out = jnp.concatenate([out, ext], axis=0)
        cur = fr.mul(cur, cur)
    return out[:n]


def eval_poly_at(coeffs, x):
    """Horner evaluation p(x) (reference: EvalPolyAtUnoptimized,
    bls/globals.go:76-95).

    coeffs: uint32[n, L]; x: uint32[..., L] (any batch of points).
    Returns uint32[..., L]. Scans over the n coefficients; each step is a
    full-batch fused mul+add over the points axis.
    """
    n = coeffs.shape[0]
    if n == 0:
        return jnp.zeros_like(x)
    rev = coeffs[::-1]

    def step(acc, c):
        return fr.add(fr.mul(acc, x), jnp.broadcast_to(c, acc.shape)), None

    init = jnp.broadcast_to(rev[0], x.shape)
    acc, _ = lax.scan(step, init, rev[1:])
    return acc


def eval_poly_at_parallel(coeffs, x):
    """p(x) via the powers ladder + tree-sum: O(log n) depth instead of the
    Horner scan's O(n). Same exact field values."""
    n = coeffs.shape[0]
    pw = powers_of(x, n)  # (n, L)
    return sum_fr(fr.mul(coeffs, pw), axis=0)


def eval_poly_in_evaluation_form(evals, domain, x, width_inv):
    """Barycentric evaluation on a (possibly bit-rev-permuted) domain.

    p(x) = (x^n - 1)/n * sum_i evals[i] * w_i / (x - w_i)

    evals:  uint32[n, L] evaluations, ordered to match `domain`
    domain: uint32[n, L] the n-th roots of unity, any permutation
    x:      uint32[L] point (if x is in the domain the exact stored
            evaluation is returned, matching the reference's special case)
    width_inv: uint32[L] Montgomery limbs of 1/n

    (reference: EvaluatePolyInEvaluationForm, bls/globals.go:106-153;
    the denominators are batch-inverted with the same Montgomery trick
    as its BatchInvModFr.)
    """
    n = evals.shape[0]
    diff = fr.sub(jnp.broadcast_to(x, domain.shape), domain)  # x - w_i
    on_domain = fr.is_zero(diff)  # (n,)
    # avoid 0^-1: substitute 1 in masked lanes (result discarded)
    safe = fr.select(on_domain, jnp.asarray(fr.from_int(1)), diff)
    inv_diff = fr.batch_inv(safe)
    terms = fr.mul(fr.mul(evals, domain), inv_diff)
    s = sum_fr(terms, axis=0)
    xn = fr.pow_static(x, n)
    factor = fr.mul(fr.sub(xn, jnp.asarray(fr.from_int(1))), width_inv)
    result = fr.mul(s, factor)
    # exact hit: return the stored evaluation
    hit = jnp.any(on_domain)
    exact = sum_fr(fr.select(on_domain, evals, fr.zeros((n,))), axis=0)
    return fr.select(hit, exact, result)


def poly_lin_comb(polys, scalars):
    """sum_i scalars[i] * polys[i] (reference: PolyLinComb,
    bls/globals.go:155-178).

    polys: uint32[k, n, L]; scalars: uint32[k, L] -> uint32[n, L].
    """
    prod = fr.mul(polys, scalars[:, None, :])
    return sum_fr(prod, axis=0)


def poly_factor_div(coeffs, z):
    """Synthetic division of p by the linear factor (x - z).

    Returns quotient coefficients uint32[n-1, L]. Exact when (x - z) divides
    p; otherwise the Euclidean quotient (the remainder is dropped), matching
    how the reference uses polyLongDiv for single proofs
    (kzg_single_proofs.go:36-54 with divisor [-z, 1], poly.go:14-40).

    Recurrence q_{i} = a_{i+1} + z*q_{i+1} is inherently serial -> lax.scan
    over the coefficient axis (n-1 steps of one fused mul-add each).
    """
    n = coeffs.shape[0]
    if n < 2:
        return jnp.zeros((0, coeffs.shape[-1]), dtype=coeffs.dtype)

    def step(acc, a):
        q = fr.add(a, fr.mul(z, acc))
        return q, q

    # qs = [b_{n-1}, ..., b_0] with b_i = a_i + z*b_{i+1}; the quotient's
    # ascending coefficients are b_1..b_{n-1} (b_0 is the remainder p(z))
    _, qs = lax.scan(step, jnp.zeros_like(z), coeffs[::-1])
    return qs[:-1][::-1]


def poly_long_div(dividend, divisor):
    """Schoolbook long division (reference: polyLongDiv, poly.go:14-40).

    dividend: uint32[la, L], divisor: uint32[lb, L] with a nonzero top
    coefficient. Returns quotient uint32[la-lb+1, L] (remainder dropped,
    like the reference). Outer loop is serial (scan); the inner
    multiply-subtract runs over the whole divisor at once.
    """
    la = dividend.shape[0]
    lb = divisor.shape[0]
    if lb == 0:
        raise ValueError("empty divisor")
    if la < lb:
        return jnp.zeros((0, dividend.shape[-1]), dtype=dividend.dtype)
    if lb == 1:
        return fr.mul(dividend, fr.inv(divisor[0]))

    steps = la - lb + 1
    top_inv = fr.inv(divisor[-1])
    # state: remainder padded to la
    div_rest = divisor[:-1]  # (lb-1, L)

    def step(rem, i):
        pos = la - 1 - i  # index of current top coefficient
        q = fr.mul(lax.dynamic_index_in_dim(rem, pos, 0, keepdims=False),
                   top_inv)
        # subtract q * divisor from rem[pos-lb+1 : pos+1]
        window = lax.dynamic_slice_in_dim(rem, pos - (lb - 1), lb - 1, 0)
        window = fr.sub(window, fr.mul(q[None, :], div_rest))
        rem = lax.dynamic_update_slice_in_dim(rem, window, pos - (lb - 1), 0)
        rem = lax.dynamic_update_slice_in_dim(
            rem, jnp.zeros_like(q)[None, :], pos, 0
        )
        return rem, q

    _, qs = lax.scan(step, dividend, jnp.arange(steps))
    return qs[::-1]


def poly_quotient_on_domain(fs, coeffs, z, y=None):
    """Quotient q(x) = (p(x) - y) / (x - z) computed entirely in parallel
    via the evaluation domain: FFT -> pointwise -> IFFT.

    This is the TPU-fast alternative to the serial synthetic division for
    power-of-two-degree polynomials when z is NOT an n-th root of unity
    (the proving path guarantees a random z). Exact field arithmetic, so
    the result is bit-identical to poly_factor_div.

    coeffs: uint32[n, L] (n a power of two <= fs.max_width).
    y: p(z), computed if not given. Returns uint32[n-1, L] (top coefficient
    of the padded quotient is zero and dropped).
    """
    from .ntt.fft_fr import fft, take_strided  # local import, avoids cycle

    n = coeffs.shape[0]
    if y is None:
        y = eval_poly_at_parallel(coeffs, z)
    evals = fft(fs, coeffs)  # p on the domain
    stride = fs.max_width // n
    domain = take_strided(fs.expanded_roots_of_unity, n, stride)
    num = fr.sub(evals, jnp.broadcast_to(y, evals.shape))
    den = fr.sub(domain, jnp.broadcast_to(z, domain.shape))
    q_evals = fr.mul(num, fr.inv(den))
    q = fft(fs, q_evals, inverse=True)
    return q[:-1]
