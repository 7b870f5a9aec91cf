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

    n = 1 << SCALE
    fs = FFTSettings(SCALE)
    rng = np.random.default_rng(0)
    # random field elements, encoded on host via vectorized byte path
    raw = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    raw[:, -1] &= 0x7FFF  # < 2^255 < r is not guaranteed; clear top bits
    raw[:, -2] = 0
    vals = jnp.asarray(raw)

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
