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


def run(scale=6, coset_width=8, n_checks=2, seed=1234, verbose=True):
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
    commit_aff = g1.to_affine_ints(commit)
    proofs_aff = g1.to_affine_ints(proofs)

    # ---- verify a subset of samples with the independent pairing check ----
    stride = fs.max_width // n2
    roots_host = fs.roots_of_unity_int()
    check_idx = list(
        rng.choice(sample_count, size=min(n_checks, sample_count),
                   replace=False))
    for i in check_idx:
        dpos = reverse_bits_limited(sample_count, int(i))
        x = roots_host[dpos * stride]
        sub = ext_orig_host[i * coset_width:(i + 1) * coset_width]
        ys = jnp.asarray(sub)[jnp.asarray(bit_reversal_indices(coset_width))]
        assert ks.check_proof_multi(commit_aff, proofs_aff[dpos], x, ys), \
            f"sample {i} failed verification"
    log(f"verified {len(check_idx)} samples", round(time.time() - t0, 1))

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
    args = [int(a) for a in sys.argv[1:4]]
    run(*args)
    print("FULL DAS PIPELINE PASS")
