"""Full benchmark suite, mirroring the reference's scale-parameterized
Go benchmarks (BENCH.md / BASELINE.md). Prints one JSON line per metric:
  {"metric": ..., "value": ns/op, "unit": "ns/op", "vs_baseline": speedup}
vs_baseline compares against the reference's fastest backend on its
5950X CPU (BASELINE.md); > 1 means this framework is faster.

Methodology (round-3 correction, see utils/benchloop.py): every row is
timed with an ON-DEVICE loop (lax.scan + optimization_barrier, outputs
chained into inputs where shapes allow) and a device_get sync. The
round-1/2 artifacts are invalid — this transport's block_until_ready
returns at enqueue-ack, so those runs measured the tunnel, not the chip.
All inputs are canonical field elements entering through the real byte
path; inputs are staged to device before timing.

Usage: python bench_all.py [--quick] [--heavy]
  --quick: small scales only (CI smoke)
  --heavy: adds the G1-FFT scale-12/15 and commit benchmarks
"""

import argparse
import json

import numpy as np

# BASELINE.md numbers (ns/op): fastest backend per row.
BASELINES = {
    "fft_fr": {4: 3991, 8: 87280, 12: 1911871, 15: 15442864},
    "fft_g1": {4: 1900117, 8: 57022201, 12: 1379302210, 15: 13513868449},
    "das_extension": {8: 50896, 12: 1169011, 15: 11377382},
    "recover": {8: 2815613, 12: 50779730, 15: 425497194},
    "zero_poly": {8: 564170, 12: 18257011, 15: 172534656},
}


def emit(metric, ns, baseline_ns=None, note=None, floored=False):
    rec = {"metric": metric, "value": round(ns), "unit": "ns/op"}
    if floored:
        # the whole timing window hid under the transport round-trip:
        # ns is a floor, not a measurement — no speedup claim
        rec["note"] = "latency-floored"
    else:
        if baseline_ns:
            rec["vs_baseline"] = round(baseline_ns / ns, 3)
        if note:
            rec["note"] = note
    print(json.dumps(rec), flush=True)


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
    assert bool(np.asarray(valid).all())
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--heavy", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kzg_tpu.das.recovery import _recover_fused_fn
    from kzg_tpu.das.zero_poly import _zero_poly_fn, leaf_layout
    from kzg_tpu.field import fr
    from kzg_tpu.field.constants import FR_MODULUS
    from kzg_tpu.ntt import FFTSettings, fft
    from kzg_tpu.ntt.das import _das_core
    from kzg_tpu.ntt.fft_fr import _fft_core
    from kzg_tpu.utils.benchloop import device_loop
    from kzg_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    fr_scales = [8, 12] if args.quick else [8, 12, 15]

    # ---- FFT over Fr (chained: out feeds next input) ----
    for s in fr_scales:
        fs = FFTSettings(s)
        vals = rand_fr_canonical(1 << s, rng)

        def fwd(v, fs=fs):
            return _fft_core(v, fs.expanded_roots_of_unity, None,
                             max_width=fs.max_width)

        sec, _, fl = device_loop(fwd, (vals,), k=64 if s <= 8 else 16,
                                 chain=True)
        emit(f"fft_fr_scale{s}", sec * 1e9, BASELINES["fft_fr"].get(s),
             floored=fl)

    # ---- DAS extension (chained: n -> n) ----
    for s in fr_scales:
        fs = FFTSettings(s + 1)
        vals = rand_fr_canonical(1 << s, rng)

        def ext(v, fs=fs, s=s):
            return _das_core(
                v, fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
                fs.inv_length(1 << s), max_width=fs.max_width,
                interleave=False)

        sec, _, fl = device_loop(ext, (vals,), k=64 if s <= 8 else 16,
                                 chain=True)
        emit(f"das_extension_scale{s}", sec * 1e9,
             BASELINES["das_extension"].get(s), floored=fl)

    # ---- zero poly (half missing; device-staged leaf layout) ----
    for s in fr_scales:
        fs = FFTSettings(s + 1)
        n = 1 << s
        missing = np.sort(rng.choice(n, size=n // 2, replace=False))
        idx, valid, invs, G = leaf_layout(
            fs, missing.astype(np.int64), n, fs.max_width // n)
        zp_graph = _zero_poly_fn(G, n, fs.max_width)
        argsd = (jax.device_put(idx), jax.device_put(valid),
                 fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
                 invs)
        sec, _, fl = device_loop(zp_graph, argsd, k=8)
        emit(f"zero_poly_scale{s}", sec * 1e9, BASELINES["zero_poly"].get(s),
             floored=fl)

    # ---- recovery (half missing; the fused single-dispatch pipeline,
    # self-check included in-graph) ----
    for s in fr_scales:
        fs = FFTSettings(s + 1)
        n = 1 << s
        half = rand_fr_canonical(n // 2, rng)
        coeffs = jnp.concatenate(
            [half, jnp.zeros_like(half)], axis=0)  # deg < n/2: recoverable
        evals = fft(fs, coeffs)
        missing = np.sort(rng.choice(n, size=n // 2, replace=False))
        idx, valid, invs, G = leaf_layout(
            fs, missing.astype(np.int64), n, fs.max_width // n)
        mask = np.zeros(n, dtype=bool)
        mask[missing] = True
        shift = 5
        run = _recover_fused_fn(G, n, fs.max_width)
        argsd = (
            jax.device_put(idx), jax.device_put(valid), evals,
            jax.device_put(mask),
            jnp.asarray(fr.from_int(shift)),
            jnp.asarray(fr.from_int(pow(shift, -1, FR_MODULUS))),
            fs.expanded_roots_of_unity, fs.reverse_roots_of_unity,
            invs, fs.inv_length(n),
        )
        sec, out, fl = device_loop(run, argsd, k=8)
        recovered, ok = out
        assert bool(np.asarray(jax.device_get(ok))), "recovery failed"
        assert bool(jnp.all(fr.eq(recovered, evals))), "recovery mismatch"
        emit(f"recover_scale{s}", sec * 1e9, BASELINES["recover"].get(s),
             floored=fl)

    # ---- G1 FFT (chained: points feed the next iteration) ----
    from kzg_tpu.curve import g1
    from kzg_tpu.curve.fft_g1 import fft_g1

    g1_scales = [4] if args.quick else (
        [4, 8, 12, 15] if args.heavy else [4, 8])
    for s in g1_scales:
        fs = FFTSettings(s)
        n = 1 << s
        pts = g1.mul(g1.generator((n,)), rand_fr_canonical(n, rng))

        def g1fwd(p, fs=fs):
            return fft_g1(fs, p)

        sec, _, fl = device_loop(g1fwd, (pts,), k=4, chain=True)
        emit(f"fft_g1_scale{s}", sec * 1e9, BASELINES["fft_g1"].get(s),
             floored=fl)

    # ---- commit (MSM) ----
    if args.heavy:
        from kzg_tpu.curve.msm import lin_comb_g1

        n = 1 << 12
        base = g1.mul(g1.generator((n,)), rand_fr_canonical(n, rng))
        sc = rand_fr_canonical(n, rng)
        sec, _, fl = device_loop(lin_comb_g1, (base, sc), k=4)
        emit("commit_msm_scale12", sec * 1e9, None,  # no BENCH.md row
             floored=fl)


if __name__ == "__main__":
    main()
