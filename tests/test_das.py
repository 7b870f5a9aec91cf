"""Zero polynomial and erasure recovery tests vs the exact oracle.

Mirrors the reference's property tests: tree-reduced zero poly vs direct
construction (zero_poly_test.go:51-131) and recovery roundtrips with
seeded RNG over several missing ratios
(recover_from_samples_test.go:94-136).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from kzg_tpu.das import (
    batch_inv,
    erasure_code_recover,
    recover_poly_from_samples,
    shift_poly,
    unshift_poly,
    zero_poly_direct,
)
from kzg_tpu.das.zero_poly import zero_poly_via_multiplication
from kzg_tpu.field import fr
from kzg_tpu.ntt import FFTSettings

MOD = fr.SPEC.modulus


@pytest.mark.parametrize("scale,ratio", [(4, 0.25), (5, 0.5), (6, 0.75)])
def test_zero_poly_vs_oracle(scale, ratio):
    fs = FFTSettings(scale + 1)
    n = 1 << scale
    rng = np.random.default_rng(scale)
    m = max(1, int(n * ratio))
    if m >= n:
        m = n - 1
    missing = sorted(rng.choice(n, size=m, replace=False).tolist())
    ze, zc = zero_poly_via_multiplication(fs, missing, n)
    exp_evals, exp_coeffs = oracle.zero_poly(missing, n, fs.max_width)
    assert [int(v) for v in fr.to_int(ze)] == exp_evals
    assert [int(v) for v in fr.to_int(zc)] == exp_coeffs


def test_zero_poly_empty():
    fs = FFTSettings(4)
    ze, zc = zero_poly_via_multiplication(fs, [], 16)
    assert [int(v) for v in fr.to_int(ze)] == [1] * 16
    assert [int(v) for v in fr.to_int(zc)] == [1] + [0] * 15


def test_zero_poly_single_index():
    fs = FFTSettings(4)
    ze, zc = zero_poly_via_multiplication(fs, [3], 16)
    exp_evals, exp_coeffs = oracle.zero_poly([3], 16, 16)
    assert [int(v) for v in fr.to_int(ze)] == exp_evals
    assert [int(v) for v in fr.to_int(zc)] == exp_coeffs


def test_zero_poly_multi_leaf_tree():
    """>64 missing indices activates the batched product tree
    (LEAF_FACTORS=64): scale 8, half missing -> 2 leaves + 1 reduce
    level, value-checked against the direct-expansion construction
    (reference's tree-vs-direct property test, zero_poly_test.go:51-131)."""
    scale = 8
    fs = FFTSettings(scale + 1)
    n = 1 << scale
    rng = np.random.default_rng(88)
    missing = sorted(rng.choice(n, size=n // 2, replace=False).tolist())
    assert len(missing) > 64
    ze, zc = zero_poly_via_multiplication(fs, missing, n)
    zc_direct = zero_poly_direct(fs, missing, n)
    assert [int(v) for v in fr.to_int(zc)] == [
        int(v) for v in fr.to_int(zc_direct)]
    # evals vanish exactly on the missing set
    ev = [int(v) for v in fr.to_int(ze)]
    for i in range(n):
        assert (ev[i] == 0) == (i in set(missing))


def test_zero_poly_direct_vs_oracle():
    fs = FFTSettings(5)
    missing = [1, 5, 17, 30]
    zc = zero_poly_direct(fs, missing, 32)
    _, exp_coeffs = oracle.zero_poly(missing, 32, fs.max_width)
    assert [int(v) for v in fr.to_int(zc)] == exp_coeffs


def test_batch_inv_matches_fermat():
    rng = np.random.default_rng(17)
    vals = [int(rng.integers(1, 2**62)) * int(rng.integers(1, 2**62)) % MOD
            for _ in range(13)]
    vals = [v if v else 1 for v in vals]
    arr = jnp.asarray(fr.from_int(vals))
    got = [int(v) for v in fr.to_int(batch_inv(arr))]
    assert got == [pow(v, -1, MOD) for v in vals]


def test_shift_unshift_roundtrip():
    vals = [int(np.random.default_rng(0).integers(0, 2**60)) for _ in range(8)]
    arr = jnp.asarray(fr.from_int(vals))
    back = unshift_poly(shift_poly(arr))
    assert [int(v) for v in fr.to_int(back)] == vals


@pytest.mark.parametrize("seed,known_ratio", [(1, 0.5), (2, 0.7), (3, 0.95)])
def test_recover_poly_from_samples(seed, known_ratio):
    # the data must be an erasure code: degree < n/2 (a DAS-extended
    # polynomial), so that deg(p) + missing < n
    scale = 5
    fs = FFTSettings(scale + 1)
    n = 1 << scale
    rng = np.random.default_rng(seed)
    coeffs_int = [int(rng.integers(0, 2**62)) % MOD
                  for _ in range(n // 2)] + [0] * (n // 2)
    evals = oracle.fft(coeffs_int)
    n_missing = n - int(n * known_ratio)
    n_missing = min(n_missing, n // 2)
    missing = sorted(rng.choice(n, size=n_missing, replace=False).tolist())
    samples = list(evals)
    for i in missing:
        samples[i] = 0  # garbage value in missing lanes
    rec = recover_poly_from_samples(
        fs, jnp.asarray(fr.from_int(samples)), missing)
    assert [int(v) for v in fr.to_int(rec)] == evals


def test_recover_is_erasure_only():
    # Erasure decoding interpolates whatever samples it is given: a
    # corrupted known sample is reproduced verbatim (the decoder cannot
    # detect errors, only fill erasures — same contract as the reference,
    # whose self-check at recover_from_samples.go:103-107 is defensive).
    scale = 4
    fs = FFTSettings(scale + 1)
    n = 1 << scale
    rng = np.random.default_rng(9)
    coeffs_int = [int(rng.integers(0, 2**62)) % MOD
                  for _ in range(n // 2)] + [0] * (n // 2)
    evals = oracle.fft(coeffs_int)
    missing = [0, 3]
    samples = list(evals)
    samples[7] = (samples[7] + 1) % MOD  # corrupt a known sample
    rec = recover_poly_from_samples(
        fs, jnp.asarray(fr.from_int(samples)), missing)
    got = [int(v) for v in fr.to_int(rec)]
    for i in range(n):
        if i not in missing:
            assert got[i] == samples[i]


def test_erasure_code_recover_legacy_parity():
    scale = 4
    fs = FFTSettings(scale + 1)
    n = 1 << scale
    rng = np.random.default_rng(4)
    coeffs_int = [int(rng.integers(0, 2**62)) % MOD
                  for _ in range(n // 2)] + [0] * (n // 2)
    evals = oracle.fft(coeffs_int)
    missing = sorted(rng.choice(n, size=n // 2, replace=False).tolist())
    samples = list(evals)
    for i in missing:
        samples[i] = 0
    rec = erasure_code_recover(
        fs, jnp.asarray(fr.from_int(samples)), missing)
    assert [int(v) for v in fr.to_int(rec)] == evals


def test_legacy_vs_modern_differential():
    """The two recovery implementations (independent zero-poly and
    inversion strategies, das/legacy.py vs das/recovery.py) must agree
    bit-exactly — the reference's legacy/modern cross-check
    (legacy_recovery_test.go vs recover_from_samples_test.go)."""
    scale = 5
    fs = FFTSettings(scale + 1)
    n = 1 << scale
    rng = np.random.default_rng(14)
    coeffs_int = [int(rng.integers(0, 2**62)) % MOD
                  for _ in range(n // 2)] + [0] * (n // 2)
    evals = oracle.fft(coeffs_int)
    missing = sorted(rng.choice(n, size=n // 2, replace=False).tolist())
    samples = list(evals)
    for i in missing:
        samples[i] = 0
    arr = jnp.asarray(fr.from_int(samples))
    modern = recover_poly_from_samples(fs, arr, missing)
    legacy = erasure_code_recover(fs, arr, missing)
    assert [int(v) for v in fr.to_int(modern)] == [
        int(v) for v in fr.to_int(legacy)]


@pytest.mark.heavy
@pytest.mark.parametrize("ratio", [0.1, 0.25, 0.5, 0.75, 0.9])
def test_zero_poly_scale12_ratios(ratio):
    """Reference sweep: zero-poly over large scales x ratios
    (zero_poly_test.go:51-131 goes to scale 12 x 8 ratios)."""
    scale = 12
    fs = FFTSettings(scale + 1)
    n = 1 << scale
    rng = np.random.default_rng(int(ratio * 100))
    m = min(max(1, int(n * ratio)), n - 1)
    missing = sorted(rng.choice(n, size=m, replace=False).tolist())
    ze, zc = zero_poly_via_multiplication(fs, missing, n)
    # spot-check: evals vanish exactly on the missing set
    ev = [int(v) for v in fr.to_int(ze)]
    mset = set(missing)
    for i in range(n):
        assert (ev[i] == 0) == (i in mset)
    # coefficient form is monic of degree m
    co = [int(v) for v in fr.to_int(zc)]
    assert co[m] == 1
    assert all(c == 0 for c in co[m + 1:])


@pytest.mark.heavy
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_recover_scale10(seed):
    """Reference scale: recovery at scale 10 with half missing
    (recover_from_samples_test.go:94-136)."""
    scale = 10
    fs = FFTSettings(scale + 1)
    n = 1 << scale
    rng = np.random.default_rng(seed)
    coeffs_int = [int(rng.integers(0, 2**62)) % MOD
                  for _ in range(n // 2)] + [0] * (n // 2)
    evals = oracle.fft(coeffs_int)
    missing = sorted(rng.choice(n, size=n // 2, replace=False).tolist())
    samples = list(evals)
    for i in missing:
        samples[i] = 0
    rec = recover_poly_from_samples(
        fs, jnp.asarray(fr.from_int(samples)), missing)
    assert [int(v) for v in fr.to_int(rec)] == evals


def test_recover_too_many_missing_raises():
    fs = FFTSettings(5)
    samples = jnp.asarray(fr.from_int(list(range(16))))
    with pytest.raises(ValueError):
        recover_poly_from_samples(fs, samples, list(range(9)))


# Golden vectors from the reference (zero_poly_test.go:151-197, themselves
# "produced from python implementation"): missing = indices of False in
# the exists mask, width 16.
GOLDEN_ZP_MISSING = [1, 2, 4, 7, 8, 9, 12, 14]
GOLDEN_ZP_EVAL = [
    "40868503138626303263713448452028063093974861640573380501185290423282553381059",
    "0",
    "0",
    "9059493333851894280622930192031068801018187410981018272280547403745554404951",
    "0",
    "589052107338478098858761185551735055781651813398303959420821217298541933174",
    "1980700778768058987161339158728243463014673552245301202287722613196911807966",
    "0",
    "0",
    "0",
    "48588946696503834689243119316363329218956542308951664733900338765742108388091",
    "17462668815085674001076443909983570919844170615339489499875900337907893054793",
    "0",
    "32986316229085390499922301497961243665601583888595873281538162159212447231217",
    "0",
    "31340620128536760059637470141592017333700483773455661424257920684057136952965",
]
GOLDEN_ZP_POLY = [
    "37647706414300369857238608619982937390838535937985112215973498325246987289395",
    "2249310547870908874251949653552971443359134481191188461034956129255788965773",
    "14214218681578879810156974734536988864583938194339599855352132142401756507144",
    "11562429031388751544281783289945994468702719673309534612868555280828261838388",
    "38114263339263944057999429128256535679768370097817780187577397655496877536510",
    "21076784030567214561538347586500535789557219054084066119912281151549494675620",
    "9111875896859243625633322505516518368332415340935654725595105138403527134249",
    "11763665547049371891508513950107512764213633861965719968078681999977021803005",
    "1", "0", "0", "0", "0", "0", "0", "0",
]


def test_zero_poly_reference_golden_vector():
    fs = FFTSettings(4)
    ze, zc = zero_poly_via_multiplication(fs, GOLDEN_ZP_MISSING, 16)
    assert [str(v) for v in fr.to_int(ze)] == GOLDEN_ZP_EVAL
    assert [str(v) for v in fr.to_int(zc)] == GOLDEN_ZP_POLY
