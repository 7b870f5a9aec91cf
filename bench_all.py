"""Full benchmark suite, mirroring the reference's scale-parameterized
Go benchmarks (BENCH.md / BASELINE.md). Prints one JSON line per metric:
  {"metric": ..., "value": ns/op, "unit": "ns/op", "vs_baseline": speedup}
vs_baseline compares against the reference's fastest backend on its
5950X CPU (BASELINE.md); > 1 means this framework is faster.

Usage: python bench_all.py [--quick] [--heavy]
  --quick: small scales only (CI smoke)
  --heavy: adds the G1-FFT scale-12 and commit benchmarks
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


def emit(metric, ns, baseline_ns=None):
    rec = {"metric": metric, "value": round(ns), "unit": "ns/op"}
    if baseline_ns:
        rec["vs_baseline"] = round(baseline_ns / ns, 3)
    print(json.dumps(rec), flush=True)


def timeit(fn, block, iters=5):
    fn()  # compile + warmup
    block()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        block()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] * 1e9


def rand_fr(n, rng):
    raw = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    raw[:, -1] &= 0x7FFF
    raw[:, -2] = 0
    return raw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--heavy", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kzg_tpu.das.recovery import _recover_with_shift
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
        vals = jnp.asarray(rand_fr(1 << s, rng))
        out = {}
        ns = timeit(lambda: out.update(o=fft(fs, vals)),
                    lambda: out["o"].block_until_ready())
        emit(f"fft_fr_scale{s}", ns, BASELINES["fft_fr"].get(s))

    # ---- DAS extension ----
    for s in fr_scales:
        fs = FFTSettings(s + 1)
        vals = jnp.asarray(rand_fr(1 << s, rng))
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

    # ---- recovery (half missing) ----
    for s in fr_scales:
        fs = FFTSettings(s + 1)
        n = 1 << s
        vals = jnp.asarray(rand_fr(n, rng))
        missing = sorted(
            rng.choice(n, size=n // 2, replace=False).tolist())
        out = {}
        ns = timeit(
            lambda: out.update(o=_recover_with_shift(
                fs, vals, missing, n, 5)[0]),
            lambda: out["o"].block_until_ready())
        emit(f"recover_scale{s}", ns, BASELINES["recover"].get(s))

    # ---- G1 FFT ----
    from kzg_tpu.curve import g1
    from kzg_tpu.curve.fft_g1 import fft_g1

    g1_scales = [4] if args.quick else ([4, 8, 12] if args.heavy else [4, 8])
    for s in g1_scales:
        fs = FFTSettings(s)
        n = 1 << s
        sc = jnp.asarray(rand_fr(n, rng))
        pts = g1.mul(g1.generator((n,)), sc)  # pseudo-random points
        pts.x.block_until_ready()
        out = {}
        ns = timeit(lambda: out.update(o=fft_g1(fs, pts)),
                    lambda: out["o"].x.block_until_ready())
        emit(f"fft_g1_scale{s}", ns, BASELINES["fft_g1"].get(s))

    # ---- commit (MSM) ----
    if args.heavy:
        from kzg_tpu.curve.msm import lin_comb_g1
        from kzg_tpu.curve.weierstrass import JacobianPoint

        n = 1 << 12
        sc = jnp.asarray(rand_fr(n, rng))
        base = g1.mul(g1.generator((n,)), jnp.asarray(rand_fr(n, rng)))
        base.x.block_until_ready()
        out = {}
        ns = timeit(lambda: out.update(o=lin_comb_g1(base, sc)),
                    lambda: out["o"].x.block_until_ready())
        emit("commit_msm_scale12", ns)  # no published baseline row


if __name__ == "__main__":
    main()
