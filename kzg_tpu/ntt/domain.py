"""FFT domain settings: precomputed roots-of-unity tables as device arrays.

TPU-native analogue of the reference's FFTSettings (fft.go:34-61): the
expanded root-of-unity circle (width+1 entries, starting AND ending with 1)
and its reverse (the inverses). Here both live as Montgomery limb arrays on
device, ready to be gathered into per-stage twiddle vectors.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..field.constants import FR_MODULUS, fr_scale2_root_of_unity


def next_pow_of_2(v: int) -> int:
    """reference: fft.go:11-16."""
    if v == 0:
        return 1
    return 1 << (v - 1).bit_length()


@functools.lru_cache(maxsize=None)
def _expanded_roots_int(max_scale: int) -> tuple:
    """Power circle of the 2^max_scale root: [1, w, w^2, ..., w^(n-1), 1].

    (reference: expandRootOfUnity, fft.go:21-32). Host Python ints, cached.
    """
    mod = FR_MODULUS
    w = fr_scale2_root_of_unity(max_scale)
    out = [1]
    cur = w
    while cur != 1:
        out.append(cur)
        cur = cur * w % mod
    out.append(1)
    assert len(out) == (1 << max_scale) + 1
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _roots_mont_np(max_scale: int) -> np.ndarray:
    """Montgomery limb encoding of the expanded circle (host, cached).

    Limb extraction goes through to_bytes + a uint16 view instead of a
    per-limb shift loop — at the 2^20 north-star width the old loop was
    ~17M Python ops of pure table-build latency."""
    ints = _expanded_roots_int(max_scale)
    r = fr.SPEC.r
    mod = FR_MODULUS
    buf = b"".join(
        (v * r % mod).to_bytes(32, "little") for v in ints)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(ints), fr.N_LIMBS)
    return u16.astype(np.uint32)


class FFTSettings:
    """Precomputed 2^max_scale evaluation domain.

    Attributes (device arrays, Montgomery limb form):
      expanded_roots_of_unity: uint32[width+1, 16], w^0..w^width (both ends 1)
      reverse_roots_of_unity:  uint32[width+1, 16], the inverses (w^-j)
    """

    def __init__(self, max_scale: int):
        if not 0 <= max_scale <= 31:
            raise ValueError("max scale out of range")
        self.max_scale = max_scale
        self.max_width = 1 << max_scale
        self.root_of_unity_int = fr_scale2_root_of_unity(max_scale)
        roots = _roots_mont_np(max_scale)
        self.expanded_roots_of_unity = jnp.asarray(roots)
        self.reverse_roots_of_unity = jnp.asarray(roots[::-1].copy())
        # 1/n for each power-of-two n <= width, used by inverse FFTs
        self._inv_len_cache = {}

    def roots_of_unity_int(self) -> tuple:
        """The expanded circle as Python ints (host oracle use)."""
        return _expanded_roots_int(self.max_scale)

    def inv_length(self, n: int) -> jnp.ndarray:
        """Montgomery limbs of n^-1 mod r (scalar, cached).

        The cache holds host arrays (never traced values) so that a first
        call from inside a jit trace cannot poison later eager calls.
        """
        if n not in self._inv_len_cache:
            self._inv_len_cache[n] = fr.from_int(pow(n, -1, FR_MODULUS))
        return jnp.asarray(self._inv_len_cache[n])
