"""Where do the 55 non-mul milliseconds of the scale-20 Fr FFT go?

BENCH_TPU round-5: fft_fr scale 20 = 84.1 ms at 34.8% of mul-bound vs
61.8% at scale 12 — something scales worse than the butterflies.
Suspects: the bit-reversal permutation (a 20-dimensional binary
transpose at 2^20), the entry/exit lane relayouts (67 MB transposes),
the per-stage compact-twiddle device broadcasts, and the stage
reshape/concat glue.

Measures, per piece, slope-timed (utils/benchloop.device_loop):
  1. brp_permute (binary-transpose form) at 2^20
  2. two-level brp alternative: reshape (2^10, 2^10) -> transpose ->
     two 1024-entry takes (coarse gathers)
  3. entry relayout (..., n, 16) -> (16, n) moveaxis
  4. one lazy butterfly stage at B = 2^19 lanes
  5. canon_scale exit at B = 2^20
  6. the full fft for reference

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_scale20.py
"""

import json

import numpy as np

import jax
import jax.numpy as jnp

from kzg_tpu.field import fr
from kzg_tpu.field.backend import set_field_backend
from kzg_tpu.ntt import FFTSettings
from kzg_tpu.ntt.bitrev import bit_reversal_indices, brp_permute
from kzg_tpu.ntt.fft_fr import _fft_core
from kzg_tpu.utils.benchloop import device_loop
from kzg_tpu.utils.jaxcache import enable_compilation_cache

SCALE = 20


def brp_two_level(x, axis=-2):
    """brp via one square transpose + two coarse 2^(b/2)-entry takes:
    rev_2b(i) for i = hi*2^b + lo is rev_b(lo)*2^b + rev_b(hi)."""
    n = x.shape[axis]
    bits = n.bit_length() - 1
    assert bits % 2 == 0
    h = 1 << (bits // 2)
    idx = jnp.asarray(bit_reversal_indices(h))
    axis = axis % x.ndim
    lead = x.shape[:axis]
    la = len(lead)
    y = x.reshape(lead + (h, h) + x.shape[axis + 1:])
    y = jnp.swapaxes(y, la, la + 1)
    y = jnp.take(y, idx, axis=la)
    y = jnp.take(y, idx, axis=la + 1)
    return y.reshape(x.shape)


def main():
    enable_compilation_cache()
    set_field_backend("pallas")
    n = 1 << SCALE
    fs = FFTSettings(SCALE)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(fr.from_int(
        [int(rng.integers(0, 2**62)) for _ in range(n)]))

    # correctness of the two-level brp
    small = jnp.arange(64 * 16, dtype=jnp.uint32).reshape(64, 16)
    a = np.asarray(jax.device_get(brp_permute(small, axis=0)))
    b = np.asarray(jax.device_get(brp_two_level(small, axis=0)))
    assert (a == b).all(), "two-level brp mismatch"
    print(json.dumps({"two_level_brp_correct": True}), flush=True)

    def row(name, fn, args, k=16):
        sec, _, fl = device_loop(fn, args, k=k, chain=False)
        print(json.dumps({"metric": name, "ms": round(sec * 1e3, 3),
                          "floored": fl}), flush=True)

    row("brp_binary_transpose", jax.jit(
        lambda v: brp_permute(v, axis=-2)), (vals,))
    row("brp_two_level", jax.jit(
        lambda v: brp_two_level(v, axis=-2)), (vals,))
    row("entry_relayout", jax.jit(
        lambda v: jnp.moveaxis(v.reshape(n, 16), -1, 0)), (vals,))

    from kzg_tpu.field.pallas_kernels import butterfly_lazy, canon_scale

    xl = jnp.moveaxis(vals, -1, 0)          # (16, n)
    a17 = jnp.pad(xl, ((0, 1), (0, 0)))[:, : n // 2]
    tw = jnp.ones((17, n // 2), dtype=jnp.uint32)

    def stage(x):
        hi, lo = butterfly_lazy(fr.SPEC, x, x, tw, first=False)
        return hi

    row("one_stage_B19", jax.jit(stage), (a17,), k=32)

    c = jnp.ones((17, 128), dtype=jnp.uint32)
    x20 = jnp.pad(xl, ((0, 1), (0, 0)))
    row("canon_scale_B20", jax.jit(
        lambda x: canon_scale(fr.SPEC, x, c)), (x20,), k=16)

    def fft(v):
        return _fft_core(v, fs.expanded_roots_of_unity, None,
                         max_width=fs.max_width)

    row("full_fft_scale20", jax.jit(fft), (vals,), k=8)


if __name__ == "__main__":
    main()
