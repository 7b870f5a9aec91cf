"""NTT layer tests: FFT/IFFT, bit reversal, DAS extension.

Golden vectors are the exact decimal field elements from the reference
tests (fft_fr_test.go:48-70, das_extension_test.go:25-39, themselves
produced by the original Python research code), cross-checked against our
own Python-int oracle."""

import numpy as np
import pytest

import oracle
from kzg_tpu.field import fr
from kzg_tpu.ntt import (
    FFTSettings,
    bit_reversal_indices,
    das_extend_interleaved,
    das_fft_extension,
    fft,
    reverse_bit_order,
    reverse_bits_limited,
)

# reference golden vector: IFFT of [0..15] (fft_fr_test.go:48-70)
GOLDEN_IFFT_0_15 = [
    "26217937587563095239723870254092982918845276250263818911301829349969290592264",
    "8864682297557565932517422087434646388650579555464978742404310425307854971414",
    "42397926345479656069499145686287671633657326275595206970800938736622240188372",
    "20829590431265536861492157516271359172322844207237904580180981500923098586768",
    "26217937587563095241456442667129809078233411015607690300436955584351971573760",
    "40905488090558605688319636812215252217941835718478251840326926365086504505065",
    "42397926345479656066034000860214019314881056744907464192530686267856878225364",
    "28940579956850634752414611731231234796717032005329840446009750351940536963695",
    "26217937587563095239723870254092982918845276250263818911301829349969290592256",
    "23495295218275555727033128776954731040973520495197797376593908347998044220817",
    "10037948829646534413413739647971946522809495755620173630072972432081702959148",
    "11530387084567584791128103695970713619748716782049385982276732334852076679447",
    "26217937587563095237991297841056156759457141484919947522166703115586609610752",
    "31606284743860653617955582991914606665367708293289733242422677199015482597744",
    "10037948829646534409948594821898294204033226224932430851802719963316340996140",
    "43571192877568624546930318420751319449039972945062659080199348274630726213098",
]

# reference golden vector: DASFFTExtension of [0..7] (das_extension_test.go:25-39)
GOLDEN_DAS_0_7 = [
    "35517140934261047308355351661356802312031268910108466120070952281657631518077",
    "46293835246856164064818777137000049805076132996160294782312647979750015529053",
    "16918734240865143167627244020755511206883014059731428924262453949515587703435",
    "11473449502290064142245761066479007451139502549599385854846611945573094960557",
    "16918734240865143167627244020755511206883014059731428924262453949515587703435",
    "46293835246856164064818777137000049805076132996160294782312647979750015529053",
    "35517140934261047308355351661356802312031268910108466120070952281657631518077",
    "810630354249988693942455328040129251641875520510785782275914432334760276393",
]


def test_ifft_golden_vector():
    fs = FFTSettings(4)
    data = fr.from_int(list(range(16)))
    res = fft(fs, data, inverse=True)
    got = [int(x) for x in fr.to_int(res)]
    assert got == [int(s) for s in GOLDEN_IFFT_0_15]
    # cross-check the oracle agrees with the reference vector too
    assert oracle.fft(list(range(16)), inverse=True) == got


def test_fft_roundtrip():
    # reference: TestFFTRoundtrip (fft_fr_test.go:9-30)
    fs = FFTSettings(4)
    data = fr.from_int(list(range(16)))
    coeffs = fft(fs, data, inverse=False)
    back = fft(fs, coeffs, inverse=True)
    assert list(fr.to_int(back)) == list(range(16))


@pytest.mark.parametrize("scale", [1, 2, 5, 8])
def test_fft_matches_oracle(scale):
    rng = np.random.default_rng(scale)
    n = 1 << scale
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    fs = FFTSettings(scale)
    got_f = list(fr.to_int(fft(fs, fr.from_int(vals))))
    got_i = list(fr.to_int(fft(fs, fr.from_int(vals), inverse=True)))
    assert got_f == oracle.fft(vals)
    assert got_i == oracle.fft(vals, inverse=True)


def test_fft_subdomain_of_larger_settings():
    # an n < max_width FFT must use the stride-scaled subdomain
    fs = FFTSettings(8)
    vals = [7, 1, 9, 100, 5, 6, 0, 3]
    got = list(fr.to_int(fft(fs, fr.from_int(vals))))
    assert got == oracle.fft(vals)


def test_fft_pads_to_pow2():
    fs = FFTSettings(4)
    vals = [1, 2, 3]  # padded to 4 with zeros like the reference wrapper
    got = list(fr.to_int(fft(fs, fr.from_int(vals))))
    assert got == oracle.fft([1, 2, 3, 0])


def test_fft_batched():
    fs = FFTSettings(4)
    rows = [[1, 2, 3, 4, 5, 6, 7, 8], [9, 8, 7, 6, 5, 4, 3, 2]]
    got = fr.to_int(fft(fs, fr.from_int(rows)))
    for row, g in zip(rows, got):
        assert list(g) == oracle.fft(row)


def test_fft_too_large_raises():
    fs = FFTSettings(3)
    with pytest.raises(ValueError):
        fft(fs, fr.from_int(list(range(16))))


def test_das_extension_golden():
    fs = FFTSettings(4)
    data = fr.from_int(list(range(8)))
    odds = das_fft_extension(fs, data)
    got = [int(x) for x in fr.to_int(odds)]
    assert got == [int(s) for s in GOLDEN_DAS_0_7]
    assert oracle.das_extension(list(range(8))) == got


@pytest.mark.parametrize("scale", [4, 5, 6, 7])
@pytest.mark.parametrize("seed", [1, 2])
def test_das_extension_zero_top_coeffs(scale, seed):
    # reference: TestParametrizedDASFFTExtension (das_extension_test.go:42-86)
    rng = np.random.default_rng(seed)
    fs = FFTSettings(scale)
    half = fs.max_width // 2
    evens = [int(rng.integers(0, 1 << 62)) for _ in range(half)]
    combined = np.asarray(
        fr.to_int(das_extend_interleaved(fs, fr.from_int(evens)))
    )
    assert list(combined[0::2]) == evens  # evens preserved
    coeffs = oracle.fft(list(combined), inverse=True)
    assert all(c == 0 for c in coeffs[half:]), "top half must be zero"
    assert any(c != 0 for c in coeffs[:half])


@pytest.mark.heavy
@pytest.mark.parametrize("seed", [1, 2])
def test_das_extension_zero_top_coeffs_scale9(seed):
    """Reference's top sweep tier: extension at scale 9
    (das_extension_test.go:42-86 goes to scale 9)."""
    rng = np.random.default_rng(seed)
    fs = FFTSettings(9)
    half = fs.max_width // 2
    evens = [int(rng.integers(0, 1 << 62)) for _ in range(half)]
    combined = np.asarray(
        fr.to_int(das_extend_interleaved(fs, fr.from_int(evens)))
    )
    assert list(combined[0::2]) == evens
    coeffs = oracle.fft(list(combined), inverse=True)
    assert all(c == 0 for c in coeffs[half:]), "top half must be zero"
    assert any(c != 0 for c in coeffs[:half])


def test_reverse_bits_limited():
    # reference semantics: reverseBitsLimited(length, value)
    assert reverse_bits_limited(16, 1) == 8
    assert reverse_bits_limited(16, 8) == 1
    assert reverse_bits_limited(16, 0b0110) == 0b0110
    assert reverse_bits_limited(2, 1) == 1


def test_bit_reversal_permutation():
    idx = bit_reversal_indices(8)
    assert list(idx) == [0, 4, 2, 6, 1, 5, 3, 7]
    arr = fr.from_int(list(range(8)))
    out = fr.to_int(reverse_bit_order(arr))
    assert list(out) == [0, 4, 2, 6, 1, 5, 3, 7]


@pytest.mark.heavy
def test_fft_fr_scale16_vs_oracle():
    """Bit-exactness at 2^16 vs the exact host oracle — the widest
    CPU-feasible width (the 2^18/2^20 north-star widths run on TPU in
    bench_all --heavy, chained-roundtrip-checked there)."""
    scale = 16
    fs = FFTSettings(scale)
    n = 1 << scale
    rng = np.random.default_rng(7)
    vals_int = [int(rng.integers(0, 2**62)) % MOD for _ in range(n)]
    out = fft(fs, jnp.asarray(fr.from_int(vals_int)))
    assert [int(v) for v in fr.to_int(out)] == oracle.fft(vals_int)
    back = fft(fs, out, inverse=True)
    assert [int(v) for v in fr.to_int(back)] == vals_int
