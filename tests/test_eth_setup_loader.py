"""Ceremony-file loader parity: parse the reference's actual
trusted_setup.json schema (eth/globals.go:33-37).

The fast tier validates the format contract on a truncated copy (first
16 points of each section); the heavy tier loads the FULL production
file (batched device decompression, serialization.decompress_g1_batch)
and runs the blob pipeline end-to-end at width 4096. Skipped when the
reference file isn't mounted.
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


@pytest.mark.heavy
@pytest.mark.skipif(not os.path.exists(REF_SETUP),
                    reason="reference setup not mounted")
def test_production_width_end_to_end():
    """Load the reference's full 4096-point ceremony file and run the
    EIP-4844 pipeline at production width: blob -> commitment -> point
    proof -> pairing verify -> precompile (reference width:
    eth/globals.go:27-72, eth/eth.go:76-110)."""
    import numpy as np

    from kzg_tpu import eth
    from kzg_tpu.field.constants import FR_MODULUS

    es = eth.EthSettings.from_json(REF_SETUP)
    assert es.width == 4096

    rng = np.random.default_rng(44)
    vals = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62))
            % FR_MODULUS for _ in range(es.width)]
    blob = b"".join(v.to_bytes(32, "little") for v in vals)

    comm = eth.blob_to_kzg_commitment(es, blob)
    assert comm is not None
    poly = eth.blob_to_polynomial(es, blob)
    z = 0xDEADBEEF0123456789
    assert z % FR_MODULUS not in es.domain_set
    proof = eth.compute_kzg_proof(es, poly, z)
    y = eth.evaluate_polynomial_in_evaluation_form(es, poly, z)

    inp = (
        eth.kzg_to_versioned_hash(comm)
        + z.to_bytes(32, "little")
        + y.to_bytes(32, "little")
        + comm
        + proof
    )
    out = eth.point_evaluation_precompile(es, inp)
    assert out[:32] == es.width.to_bytes(32, "big")

    # corrupting y must revert
    bad = bytearray(inp)
    bad[64] ^= 1
    with pytest.raises(ValueError):
        eth.point_evaluation_precompile(es, bytes(bad))


@pytest.mark.heavy
@pytest.mark.skipif(not os.path.exists(REF_SETUP),
                    reason="reference setup not mounted")
def test_production_width_aggregate_proof():
    """Aggregate proof over 2 production-width blobs, commitments batched
    on the blob axis (reference: ComputeAggregateKZGProof /
    VerifyAggregateKZGProof, eth/eth.go:155-181)."""
    import numpy as np

    from kzg_tpu import eth
    from kzg_tpu.field.constants import FR_MODULUS

    es = eth.EthSettings.from_json(REF_SETUP)
    rng = np.random.default_rng(45)
    blobs = []
    for _ in range(2):
        vals = [int(rng.integers(0, 2**62)) % FR_MODULUS
                for _ in range(es.width)]
        blobs.append(b"".join(v.to_bytes(32, "little") for v in vals))
    comms = [eth.blob_to_kzg_commitment(es, b) for b in blobs]
    agg = eth.compute_aggregate_kzg_proof(es, blobs)
    assert eth.verify_aggregate_kzg_proof(es, blobs, comms, agg)
