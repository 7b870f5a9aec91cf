"""Headline benchmark: Fr FFT at scale 20 (1,048,576 elements) on one
chip — BASELINE.json's north-star width ("Fr FFT elems/sec/chip at
2^20").

Baseline: the reference's own benchmarks stop at 2^15 (BENCH.md);
its fastest backend (Kilic Go+asm) measures 15.44 ms there and scales
n*log2(n) to within 3% across its published rows, extrapolating to
~658.9 ms at 2^20 (BASELINE.md "no numbers exist at 2^20" note).
Prints ONE JSON line; vs_baseline is the speedup factor
(baseline_ns / measured_ns, > 1 means faster than the reference).

Methodology (round-3 correction): the timing loop runs ON DEVICE with
each iteration's output feeding the next iteration's input, and the sync
is a device_get (utils/benchloop.py). Earlier rounds' headline numbers
(BENCH_r01/r02) are invalid: this environment's block_until_ready
returns at enqueue-ack, not completion, so they measured the transport,
not the kernel.
"""

import json
import sys

import numpy as np

SCALE = 20
# Kilic scale-15 row (BENCH.md:46) extrapolated n*log2(n) to 2^20
# (reference benches stop at 2^15; see BASELINE.md derived-throughputs note)
BASELINE_NS = round(15_442_864 * ((1 << 20) * 20) / ((1 << 15) * 15))


def main():
    import jax
    import jax.numpy as jnp

    from kzg_tpu.field import fr
    from kzg_tpu.ntt import FFTSettings
    from kzg_tpu.ntt.fft_fr import _fft_core
    from kzg_tpu.utils.benchloop import device_loop
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
    assert bool(np.asarray(jax.device_get(valid)).all())

    def fwd(v):
        return _fft_core(v, fs.expanded_roots_of_unity, None,
                         max_width=fs.max_width)

    sec, out, floored = device_loop(fwd, (vals,), k=8, chain=True)
    ns = sec * 1e9
    rec = {
        "metric": f"fft_fr_scale{SCALE}",
        "value": round(ns),
        "unit": "ns/op",
        "vs_baseline": round(BASELINE_NS / ns, 3),
        "note": "reference extrapolated n*log2(n) from scale 15",
    }
    if floored:
        rec["note"] = "latency-floored"
        del rec["vs_baseline"]
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
