"""Exact Python-int reference implementations (test oracle).

Independent re-derivations of the algorithms over plain integers; used to
pin down bit-exactness of the device kernels. Slow but exact.
"""

from kzg_tpu.field.constants import FR_MODULUS as MOD
from kzg_tpu.field.constants import fr_scale2_root_of_unity


def dft(vals, root, inverse=False):
    """Naive O(n^2) DFT: out[i] = sum_j vals[j] * root^(i*j) (mod r)."""
    n = len(vals)
    r = pow(root, -1, MOD) if inverse else root
    powers = [1] * n
    for i in range(1, n):
        powers[i] = powers[i - 1] * r % MOD
    out = []
    for i in range(n):
        acc = 0
        for j in range(n):
            acc += vals[j] * powers[(i * j) % n]
        out.append(acc % MOD)
    if inverse:
        inv_n = pow(n, -1, MOD)
        out = [x * inv_n % MOD for x in out]
    return out


def fft(vals, inverse=False):
    """Recursive radix-2 FFT over Fr (exact, for larger test sizes)."""
    n = len(vals)
    assert n & (n - 1) == 0
    root = fr_scale2_root_of_unity(n.bit_length() - 1)
    out = _fft_rec(vals, pow(root, -1, MOD) if inverse else root)
    if inverse:
        inv_n = pow(n, -1, MOD)
        out = [x * inv_n % MOD for x in out]
    return out


def _fft_rec(vals, root):
    n = len(vals)
    if n == 1:
        return list(vals)
    r2 = root * root % MOD
    ev = _fft_rec(vals[0::2], r2)
    od = _fft_rec(vals[1::2], r2)
    out = [0] * n
    w = 1
    for i in range(n // 2):
        t = w * od[i] % MOD
        out[i] = (ev[i] + t) % MOD
        out[i + n // 2] = (ev[i] - t) % MOD
        w = w * root % MOD
    return out


def das_extension(evens):
    """Odd-index evaluations making the top half of coefficients zero."""
    n = len(evens)
    coeffs = fft(evens, inverse=True)
    w = fr_scale2_root_of_unity((2 * n).bit_length() - 1)
    shifted = []
    wp = 1
    for c in coeffs:
        shifted.append(c * wp % MOD)
        wp = wp * w % MOD
    return fft(shifted)


def eval_poly(coeffs, x):
    """Horner evaluation."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % MOD
    return acc


def zero_poly(missing_indices, length, max_width):
    """Monic product prod (x - w^i) over missing indices; returns
    (eval_form len length, coeff_form len length)."""
    root = fr_scale2_root_of_unity(max_width.bit_length() - 1)
    stride = max_width // length
    poly = [1]
    for i in missing_indices:
        r = pow(root, i * stride, MOD)
        # multiply poly by (x - r)
        poly = [0] + poly
        for j in range(len(poly) - 1):
            poly[j] = (poly[j] - poly[j + 1] * r) % MOD
    poly = poly + [0] * (length - len(poly))
    evals = fft(poly[:length])
    return evals, poly[:length]
