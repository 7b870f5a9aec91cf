"""Full DAS pipeline — the framework's flagship end-to-end workload.

Mirrors the reference's TestFullDAS (integration_test.go:68-159):
  random bytes -> 31-byte Fr packing -> reverse-bit-order -> DAS extension
  -> KZG commitment -> FK20 coset proofs -> per-sample CheckProofMulti
  -> randomly drop <=50% of samples -> erasure recovery -> byte-exact check

Usage: python examples/full_das_pipeline.py [scale] [coset_width] [n_checks]
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from kzg_tpu.curve import g1
from kzg_tpu.das import recover_poly_from_samples
from kzg_tpu.field import fr
from kzg_tpu.field.constants import FR_MODULUS
from kzg_tpu.fk20 import FK20MultiSettings
from kzg_tpu.kzg import KZGSettings, generate_testing_setup
from kzg_tpu.ntt import FFTSettings, fft, reverse_bit_order
from kzg_tpu.ntt.bitrev import bit_reversal_indices, reverse_bits_limited
from kzg_tpu.ntt.das import das_extend_interleaved


def run(scale=6, coset_width=8, n_checks=2, seed=1234, verbose=True,
        device_crs=False, batch_verify=False):
    """device_crs: build the testing CRS with one batched device
    scalar-mul (required above ~scale 10 — the host loop takes hours).
    batch_verify: verify EVERY sample through the batched device pairing
    (kzg/settings.check_proof_multi_batch) instead of n_checks host
    pairings."""
    def log(*a):
        if verbose:
            print(*a)

    t0 = time.time()
    n = 1 << scale
    n2 = 2 * n
    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, 256, size=n * 31, dtype=np.uint8))

    # ---- pack: 31 bytes per field element (always < modulus) ----
    chunks = np.frombuffer(data, dtype=np.uint8).reshape(n, 31)
    padded = np.zeros((n, 32), dtype=np.uint8)
    padded[:, :31] = chunks
    evens, valid = fr.from_bytes32_batch(padded.tobytes())
    assert valid.all()
    evens = reverse_bit_order(evens)  # (integration_test.go:34)

    # ---- extend ----
    fs = FFTSettings(scale + 1)
    extended = das_extend_interleaved(fs, evens)  # (2n,)
    log(f"extended {n} -> {n2} elements", round(time.time() - t0, 1))

    # ---- commitment over the extended data's coefficient form ----
    if device_crs:
        from kzg_tpu.kzg.setup import insecure_kzg_settings_device

        ks = insecure_kzg_settings_device(
            1927409816240961209460912649124 % FR_MODULUS, n2 + 1, fs,
            g2_indices=(1, coset_width))
    else:
        s1, s2, a1, a2 = generate_testing_setup(
            1927409816240961209460912649124 % FR_MODULUS, n2 + 1)
        ks = KZGSettings(fs, s1, a2, a1)
    coeffs = fft(fs, extended, inverse=True)  # top half is zero
    commit = ks.commit_to_poly(coeffs[:n])
    log("committed", round(time.time() - t0, 1))

    # ---- FK20 coset proofs ----
    fk = FK20MultiSettings(ks, n2, coset_width)
    proofs = fk.fk20_multi_da_optimized(coeffs)
    sample_count = n2 // coset_width
    log(f"{sample_count} coset proofs", round(time.time() - t0, 1))

    # ---- package samples in original-data order ----
    ext_orig = reverse_bit_order(extended)  # original data order
    ext_orig_host = np.asarray(ext_orig)

    # ---- verify samples ----
    stride = fs.max_width // n2
    roots_host = fs.roots_of_unity_int()
    if batch_verify:
        # every sample, one device program: batched interpolation MSMs,
        # batched G2, N-lane Miller loops + one batched final exp
        brp_l = bit_reversal_indices(coset_width)
        dpos_all = [reverse_bits_limited(sample_count, i)
                    for i in range(sample_count)]
        xs = [roots_host[d * stride] for d in dpos_all]
        ys_all = jnp.asarray(
            ext_orig_host.reshape(sample_count, coset_width, 16)[:, brp_l])
        from kzg_tpu.fk20.toeplitz import take_points

        proofs_b = take_points(proofs, np.asarray(dpos_all, dtype=np.int32))
        tv = time.time()
        ok = ks.check_proof_multi_batch(commit, proofs_b, xs, ys_all)
        dt = time.time() - tv
        assert all(ok), f"{ok.count(False)} samples failed verification"
        log(f"verified ALL {sample_count} samples on device "
            f"({sample_count / dt:.1f} samples/s)",
            round(time.time() - t0, 1))
    else:
        commit_aff = g1.to_affine_ints(commit)
        proofs_aff = g1.to_affine_ints(proofs)
        check_idx = list(
            rng.choice(sample_count, size=min(n_checks, sample_count),
                       replace=False))
        for i in check_idx:
            dpos = reverse_bits_limited(sample_count, int(i))
            x = roots_host[dpos * stride]
            sub = ext_orig_host[i * coset_width:(i + 1) * coset_width]
            ys = jnp.asarray(sub)[
                jnp.asarray(bit_reversal_indices(coset_width))]
            assert ks.check_proof_multi(
                commit_aff, proofs_aff[dpos], x, ys), \
                f"sample {i} failed verification"
        log(f"verified {len(check_idx)} samples",
            round(time.time() - t0, 1))

    # ---- drop up to half the samples, recover ----
    missing_samples = []
    for i in range(sample_count):
        if rng.integers(0, 2) == 0 and len(missing_samples) < sample_count // 2:
            missing_samples.append(i)
    missing_elems = []
    for i in missing_samples:
        missing_elems.extend(range(i * coset_width, (i + 1) * coset_width))
    # samples are in original order; recovery runs in polynomial order
    brp = bit_reversal_indices(n2)
    inv_brp = np.argsort(brp)
    poly_order_missing = sorted(int(inv_brp[e]) for e in missing_elems)
    partial = reverse_bit_order(ext_orig)  # back to polynomial order
    recovered = recover_poly_from_samples(fs, partial, poly_order_missing)
    log(f"recovered {len(missing_elems)} elements "
        f"({len(missing_samples)} samples)", round(time.time() - t0, 1))

    # ---- compare and unpack ----
    rec_orig = reverse_bit_order(recovered)
    assert bool(jnp.all(fr.eq(rec_orig, ext_orig))), "recovery mismatch"
    rec_bytes = fr.to_bytes32_batch(rec_orig[:n])[:, :31].tobytes()
    assert rec_bytes == data, "reconstructed bytes differ"
    log("byte-exact reconstruction OK", round(time.time() - t0, 1))
    return True


if __name__ == "__main__":
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [int(a) for a in sys.argv[1:4] if not a.startswith("--")]
    run(*args, device_crs="--device-crs" in flags,
        batch_verify="--batch-verify" in flags)
    print("FULL DAS PIPELINE PASS")
