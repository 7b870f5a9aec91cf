"""EIP-4844 spec function tests (reduced width-16 domain)."""

import hashlib

import numpy as np
import pytest

from kzg_tpu import eth
from kzg_tpu.field import fr

MOD = fr.SPEC.modulus
RNG = np.random.default_rng(77)


def rand_blob(es):
    vals = [int(RNG.integers(0, 2**62)) % MOD for _ in range(es.width)]
    return b"".join(v.to_bytes(32, "little") for v in vals)


def test_bytes_to_bls_field_boundaries():
    assert eth.bytes_to_bls_field(b"\x00" * 32) == 0
    assert eth.bytes_to_bls_field((MOD - 1).to_bytes(32, "little")) == MOD - 1
    assert eth.bytes_to_bls_field(MOD.to_bytes(32, "little")) is None
    assert eth.bytes_to_bls_field(b"\xff" * 32) is None


def test_compute_powers():
    ps = eth.compute_powers(7, 5)
    assert ps == [1, 7, 49, 343, 2401]


def test_hash_to_bls_field_is_le_mod_r():
    data = b"hello world"
    h = hashlib.sha256(data).digest()
    assert eth.hash_to_bls_field(data) == int.from_bytes(h, "little") % MOD


def test_kzg_to_versioned_hash():
    c = b"\xab" * 48
    vh = eth.kzg_to_versioned_hash(c)
    exp = bytearray(hashlib.sha256(c).digest())
    exp[0] = 0x01
    assert vh == bytes(exp)


def test_blob_to_polynomial_rejects_out_of_range(eth_env):
    es = eth_env
    blob = bytearray(rand_blob(es))
    blob[0:32] = b"\xff" * 32  # >= modulus
    assert eth.blob_to_polynomial(es, bytes(blob)) is None


def test_blob_commitment_roundtrip_and_proof(eth_env):
    es = eth_env
    blob = rand_blob(es)
    p = eth.blob_to_polynomial(es, blob)
    comm = eth.polynomial_to_kzg_commitment(es, p)
    z = 987654321
    y = eth.evaluate_polynomial_in_evaluation_form(es, p, z)
    proof = eth.compute_kzg_proof(es, p, z)
    assert eth.verify_kzg_proof(
        es, comm, z.to_bytes(32, "little"), y.to_bytes(32, "little"), proof)
    assert not eth.verify_kzg_proof(
        es, comm, z.to_bytes(32, "little"),
        ((y + 1) % MOD).to_bytes(32, "little"), proof)


def test_compute_kzg_proof_rejects_domain_z(eth_env):
    es = eth_env
    blob = rand_blob(es)
    p = eth.blob_to_polynomial(es, blob)
    with pytest.raises(ValueError):
        eth.compute_kzg_proof(es, p, es.domain_ints[3])


def test_point_evaluation_precompile(eth_env):
    es = eth_env
    blob = rand_blob(es)
    p = eth.blob_to_polynomial(es, blob)
    comm = eth.polynomial_to_kzg_commitment(es, p)
    z = 1234567
    y = eth.evaluate_polynomial_in_evaluation_form(es, p, z)
    proof = eth.compute_kzg_proof(es, p, z)
    vh = eth.kzg_to_versioned_hash(comm)
    inp = (vh + z.to_bytes(32, "little") + y.to_bytes(32, "little")
           + comm + proof)
    out = eth.point_evaluation_precompile(es, inp)
    assert len(out) == 64
    assert int.from_bytes(out[:32], "big") == es.width
    assert int.from_bytes(out[32:], "big") == MOD
    # wrong versioned hash
    with pytest.raises(ValueError):
        eth.point_evaluation_precompile(es, b"\x00" * 32 + inp[32:])
    # bad length
    with pytest.raises(ValueError):
        eth.point_evaluation_precompile(es, inp[:-1])


def test_aggregate_proof_and_sidecar(eth_env):
    es = eth_env
    blobs = [rand_blob(es) for _ in range(3)]
    comms = [eth.blob_to_kzg_commitment(es, b) for b in blobs]
    proof = eth.compute_aggregate_kzg_proof(es, blobs)
    assert eth.verify_aggregate_kzg_proof(es, blobs, comms, proof)
    sidecar = eth.BlobsSidecar(b"\x11" * 32, 5, blobs, proof)
    eth.validate_blobs_sidecar(es, 5, b"\x11" * 32, comms, sidecar)
    with pytest.raises(ValueError):
        eth.validate_blobs_sidecar(es, 6, b"\x11" * 32, comms, sidecar)
    # tampered blob fails the aggregate check
    bad = bytearray(blobs[0])
    bad[0] ^= 1
    assert not eth.verify_aggregate_kzg_proof(
        es, [bytes(bad)] + blobs[1:], comms, proof)


def test_tx_peek_blob_versioned_hashes():
    hashes = [bytes([i]) * 32 for i in range(1, 4)]
    # offset is relative to "message" start (byte 70); hashes at the end
    payload_offset = 300  # arbitrary >= 192
    tx = bytearray(70 + payload_offset + 32 * len(hashes))
    tx[0] = eth.BLOB_TX_TYPE
    tx[eth.BLOB_VERSIONED_HASHES_OFFSET:
       eth.BLOB_VERSIONED_HASHES_OFFSET + 4] = payload_offset.to_bytes(
        4, "little")
    start = 70 + payload_offset
    for i, h in enumerate(hashes):
        tx[start + 32 * i: start + 32 * (i + 1)] = h
    got = eth.tx_peek_blob_versioned_hashes(bytes(tx))
    assert got == hashes
    with pytest.raises(ValueError):
        eth.tx_peek_blob_versioned_hashes(b"\x05" + b"\x00" * 100)
    bad = bytearray(tx)
    bad[0] = 1
    with pytest.raises(ValueError):
        eth.tx_peek_blob_versioned_hashes(bytes(bad))


def test_verify_kzg_commitments_against_transactions(eth_env):
    es = eth_env
    blob = rand_blob(es)
    comm = eth.blob_to_kzg_commitment(es, blob)
    vh = eth.kzg_to_versioned_hash(comm)
    payload_offset = 192
    tx = bytearray(70 + payload_offset + 32)
    tx[0] = eth.BLOB_TX_TYPE
    tx[eth.BLOB_VERSIONED_HASHES_OFFSET:
       eth.BLOB_VERSIONED_HASHES_OFFSET + 4] = payload_offset.to_bytes(
        4, "little")
    tx[70 + payload_offset:] = vh
    eth.verify_kzg_commitments_against_transactions([bytes(tx)], [comm])
    with pytest.raises(ValueError):
        eth.verify_kzg_commitments_against_transactions(
            [bytes(tx)], [b"\x00" * 48])
