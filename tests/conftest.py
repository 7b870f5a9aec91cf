"""Shared fixtures: one small insecure trusted setup per session.

Mirrors the reference's approach of a single GenerateTestingSetup per
test (setup.go:9-26); disk caching in kzg_tpu makes this cheap across
runs.
"""

import pytest

TEST_SECRET = 1927409816240961209460912649124


@pytest.fixture(scope="session")
def kzg_env():
    """(fs, ks) with a width-32 domain and a 17-point CRS."""
    from kzg_tpu.kzg import KZGSettings, generate_testing_setup
    from kzg_tpu.ntt import FFTSettings

    fs = FFTSettings(5)
    s1, s2, a1, a2 = generate_testing_setup(TEST_SECRET, 17)
    return fs, KZGSettings(fs, s1, a2, a1)


@pytest.fixture(scope="session")
def eth_env():
    """EthSettings with a reduced width-16 blob domain."""
    from kzg_tpu import eth

    return eth.EthSettings.insecure(secret=424242424242, width=16)
