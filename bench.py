"""Headline benchmark: Fr FFT at scale 15 (32768 elements) on one chip.

Baseline: the reference's fastest backend (Kilic Go+asm) does this in
15,442,864 ns single-threaded (BASELINE.md "FFT over Fr", scale 15).
Prints ONE JSON line; vs_baseline is the speedup factor
(baseline_ns / measured_ns, > 1 means faster than the reference).
"""

import json
import sys
import time

import numpy as np

SCALE = 15
BASELINE_NS = 15_442_864  # BENCH.md:46, Kilic backend


def main():
    import jax
    import jax.numpy as jnp

    from kzg_tpu.field import fr
    from kzg_tpu.ntt import FFTSettings, fft
    from kzg_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from kzg_tpu.field.constants import FR_MODULUS

    n = 1 << SCALE
    fs = FFTSettings(SCALE)
    rng = np.random.default_rng(0)
    # canonical (< r) random field elements through the real byte path
    ints = [
        (int(a) | (int(b) << 63) | (int(c) << 126) | (int(d) << 189)
         | (int(e) << 252)) % FR_MODULUS
        for a, b, c, d, e in rng.integers(0, 2**63, size=(n, 5))
    ]
    vals, valid = fr.from_bytes32_batch(
        b"".join(v.to_bytes(32, "little") for v in ints))
    assert bool(valid.all())

    out = fft(fs, vals)  # compile + warmup
    out.block_until_ready()

    # 3 windows of 10 pipelined dispatches; report the best window (the
    # transport's per-session latency is noisy, the device time is not)
    iters = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fft(fs, vals)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    ns = best * 1e9
    print(json.dumps({
        "metric": f"fft_fr_scale{SCALE}",
        "value": round(ns),
        "unit": "ns/op",
        "vs_baseline": round(BASELINE_NS / ns, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
