"""Full benchmark suite, mirroring the reference's scale-parameterized
Go benchmarks (BENCH.md / BASELINE.md). Prints one JSON line per metric:
  {"metric": ..., "value": ns/op, "unit": "ns/op", "vs_baseline": speedup}
vs_baseline compares against the reference's fastest backend on its
5950X CPU (BASELINE.md); > 1 means this framework is faster.

Methodology (round-2 fixes, VERDICT weak #6/#9):
  * all inputs are CANONICAL field elements (< r), generated host-side
    and entering through the real byte path — benches measure the
    invariant-respecting pipeline;
  * G1 rows rotate between 3 distinct pre-staged inputs and check that
    the output digest changes per iteration, so a collapsed measurement
    (constant-folded or cached result) is flagged instead of published.

Usage: python bench_all.py [--quick] [--heavy]
  --quick: small scales only (CI smoke)
  --heavy: adds the G1-FFT scale-12/15 and commit benchmarks
"""

import argparse
import json
import time

import numpy as np

# BASELINE.md numbers (ns/op): fastest backend per row.
BASELINES = {
    "fft_fr": {4: 3991, 8: 87280, 12: 1911871, 15: 15442864},
    "fft_g1": {4: 1900117, 8: 57022201, 12: 1379302210, 15: 13513868449},
    "das_extension": {8: 50896, 12: 1169011, 15: 11377382},
    "recover": {8: 2815613, 12: 50779730, 15: 425497194},
    "zero_poly": {8: 564170, 12: 18257011, 15: 172534656},
}


def emit(metric, ns, baseline_ns=None, note=None):
    rec = {"metric": metric, "value": round(ns), "unit": "ns/op"}
    if baseline_ns:
        rec["vs_baseline"] = round(baseline_ns / ns, 3)
    if note:
        rec["note"] = note
    print(json.dumps(rec), flush=True)


def timeit(fn, block, iters=5, windows=3):
    """Pipelined-throughput timing: `iters` dispatches enqueued
    back-to-back per window, one device sync at the window end, best
    window reported. Per-dispatch transport latency in this environment
    swings 0.1-60 ms between sessions (it is NOT device time), so
    per-call sync timing would measure the tunnel, not the kernel; the
    reference's ns/op is a tight b.N loop, which pipelining mirrors.
    Functions that sync internally (e.g. recovery's self-check fetch)
    degrade gracefully to sequential timing — their number honestly
    includes that sync, like the reference's host-side checks do."""
    fn()  # compile + warmup
    block()
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        block()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e9


def rand_fr_canonical(n, rng):
    """Uniform canonical field elements through the real byte path."""
    from kzg_tpu.field import fr
    from kzg_tpu.field.constants import FR_MODULUS

    vals = (
        rng.integers(0, 2**63, size=(n, 5)).astype(object)
    )
    ints = [
        int(v[0] + (v[1] << 63) + (v[2] << 126) + (v[3] << 189)
            + (v[4] << 252)) % FR_MODULUS
        for v in vals
    ]
    buf = b"".join(v.to_bytes(32, "little") for v in ints)
    arr, valid = fr.from_bytes32_batch(buf)
    assert bool(valid.all())
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--heavy", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kzg_tpu.das.recovery import recover_poly_from_samples
    from kzg_tpu.das.zero_poly import zero_poly_via_multiplication
    from kzg_tpu.field import fr
    from kzg_tpu.ntt import FFTSettings, fft
    from kzg_tpu.ntt.das import das_fft_extension
    from kzg_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    fr_scales = [8, 12] if args.quick else [8, 12, 15]

    # ---- FFT over Fr ----
    for s in fr_scales:
        fs = FFTSettings(s)
        vals = rand_fr_canonical(1 << s, rng)
        out = {}
        ns = timeit(lambda: out.update(o=fft(fs, vals)),
                    lambda: out["o"].block_until_ready())
        emit(f"fft_fr_scale{s}", ns, BASELINES["fft_fr"].get(s))

    # ---- DAS extension ----
    for s in fr_scales:
        fs = FFTSettings(s + 1)
        vals = rand_fr_canonical(1 << s, rng)
        out = {}
        ns = timeit(lambda: out.update(o=das_fft_extension(fs, vals)),
                    lambda: out["o"].block_until_ready())
        emit(f"das_extension_scale{s}", ns, BASELINES["das_extension"].get(s))

    # ---- zero poly (half missing) ----
    for s in fr_scales:
        fs = FFTSettings(s + 1)
        n = 1 << s
        missing = sorted(
            rng.choice(n, size=n // 2, replace=False).tolist())
        out = {}
        ns = timeit(
            lambda: out.update(o=zero_poly_via_multiplication(
                fs, missing, n)[0]),
            lambda: out["o"].block_until_ready())
        emit(f"zero_poly_scale{s}", ns, BASELINES["zero_poly"].get(s))

    # ---- recovery (half missing, the public fused single-dispatch API;
    # its self-check fetch syncs per call, honestly included) ----
    for s in fr_scales:
        fs = FFTSettings(s + 1)
        n = 1 << s
        half = rand_fr_canonical(n // 2, rng)
        coeffs = jnp.concatenate(
            [half, jnp.zeros_like(half)], axis=0)  # deg < n/2: recoverable
        evals = fft(fs, coeffs)
        missing = sorted(
            rng.choice(n, size=n // 2, replace=False).tolist())
        out = {}
        ns = timeit(
            lambda: out.update(o=recover_poly_from_samples(
                fs, evals, missing)),
            lambda: out["o"].block_until_ready())
        assert bool(jnp.all(fr.eq(out["o"], evals))), "recovery mismatch"
        emit(f"recover_scale{s}", ns, BASELINES["recover"].get(s))

    # ---- G1 FFT (rotating fresh inputs + output digest guard) ----
    from kzg_tpu.curve import g1
    from kzg_tpu.curve.fft_g1 import fft_g1

    g1_scales = [4] if args.quick else (
        [4, 8, 12, 15] if args.heavy else [4, 8])
    for s in g1_scales:
        fs = FFTSettings(s)
        n = 1 << s
        inputs = []
        for _ in range(3):
            pts = g1.mul(g1.generator((n,)), rand_fr_canonical(n, rng))
            pts.x.block_until_ready()
            inputs.append(pts)
        state = {"i": 0}
        digests = []

        def run():
            p = inputs[state["i"] % 3]
            state["i"] += 1
            state["o"] = fft_g1(fs, p)

        def block():
            o = state["o"]
            o.x.block_until_ready()
            digests.append(int(np.asarray(jax.device_get(o.x)).sum()))

        ns = timeit(run, block)
        note = None
        if len(set(digests[-3:])) < min(3, len(digests)):
            note = "SUSPECT: identical output digests across fresh inputs"
        emit(f"fft_g1_scale{s}", ns, BASELINES["fft_g1"].get(s), note)

    # ---- commit (MSM) ----
    if args.heavy:
        from kzg_tpu.curve.msm import lin_comb_g1

        n = 1 << 12
        base = g1.mul(g1.generator((n,)), rand_fr_canonical(n, rng))
        base.x.block_until_ready()
        scs = [rand_fr_canonical(n, rng) for _ in range(3)]
        state = {"i": 0}
        digests = []

        def runm():
            sc = scs[state["i"] % 3]
            state["i"] += 1
            state["o"] = lin_comb_g1(base, sc)

        def blockm():
            o = state["o"]
            o.x.block_until_ready()
            digests.append(int(np.asarray(jax.device_get(o.x)).sum()))

        ns = timeit(runm, blockm)
        note = None
        if len(set(digests[-3:])) < min(3, len(digests)):
            note = "SUSPECT: identical output digests across fresh inputs"
        emit("commit_msm_scale12", ns, None, note)  # no BENCH.md row


if __name__ == "__main__":
    main()
