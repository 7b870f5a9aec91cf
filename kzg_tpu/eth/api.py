"""EIP-4844 spec functions (blob commitments, proofs, precompile).

Reference: eth/eth.go + eth/helpers.go. Host work (sha256 transcripts,
byte parsing, pairing checks) stays host; everything per-field-element
(blob parsing, linear combination, barycentric evaluation, the quotient,
MSMs) is batched device work. Where the reference inverts denominators
one element at a time (ComputeKZGProof, eth/helpers.go:179-203 via
DivModFr), the whole denominator vector is inverted in one batched
Fermat ladder.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .. import poly as polyops
from ..curve import g1 as g1mod
from ..curve import pairing, serialization
from ..curve.msm import lin_comb_g1
from ..field import fr
from ..field.constants import FR_MODULUS
from ..utils import host_ec
from .settings import EthSettings

FIAT_SHAMIR_PROTOCOL_DOMAIN = b"FSBLOBVERIFY_V1_"
BLOB_COMMITMENT_VERSION_KZG = 0x01
BLOB_TX_TYPE = 5
PRECOMPILE_INPUT_LENGTH = 192
BLOB_VERSIONED_HASHES_OFFSET = 258


@dataclass
class BlobsSidecar:
    """reference: BlobsSidecar (eth/eth.go:33-38)."""

    beacon_block_root: bytes
    beacon_block_slot: int
    blobs: Sequence[bytes]
    kzg_aggregated_proof: bytes


# ---------------- field/byte helpers ----------------
def bytes_to_bls_field(b32: bytes) -> Optional[int]:
    """32-byte little-endian -> int < r, or None (spec bytes_to_bls_field;
    reference: eth/helpers.go:107-110)."""
    v = int.from_bytes(b32, "little")
    return v if v < FR_MODULUS else None


def hash_to_bls_field(data: bytes) -> int:
    """sha256 digest interpreted as little-endian int mod r
    (reference: hashToBLSField, eth/helpers.go:113-133)."""
    h = hashlib.sha256(data).digest()
    return int.from_bytes(h, "little") % FR_MODULUS


def compute_powers(r: int, n: int) -> List[int]:
    """[1, r, r^2, ...] (reference: ComputePowers, eth/helpers.go:87-95)."""
    out, cur = [], 1
    for _ in range(n):
        out.append(cur)
        cur = cur * r % FR_MODULUS
    return out


def kzg_to_versioned_hash(commitment: bytes) -> bytes:
    """sha256 with version byte (reference: KZGToVersionedHash,
    eth/eth.go:137-141)."""
    h = bytearray(hashlib.sha256(commitment).digest())
    h[0] = BLOB_COMMITMENT_VERSION_KZG
    return bytes(h)


# ---------------- blob <-> polynomial ----------------
def blob_to_polynomial(es: EthSettings, blob: bytes):
    """width*32 LE bytes -> device uint32[width, 16], or None if any
    element is out of range (reference: BlobToPolynomial,
    eth/helpers.go:264-273)."""
    if len(blob) != es.width * 32:
        return None
    arr, valid = fr.from_bytes32_batch(blob)
    if not bool(valid.all()):
        return None
    return arr


def blobs_to_polynomials(es: EthSettings, blobs: Sequence[bytes]):
    polys = []
    for b in blobs:
        p = blob_to_polynomial(es, b)
        if p is None:
            return None
        polys.append(p)
    return jnp.stack(polys, axis=0) if polys else jnp.zeros((0, es.width, 16), dtype=jnp.uint32)


def polynomial_to_kzg_commitment(es: EthSettings, poly_dev) -> bytes:
    """MSM over the bit-reversed Lagrange CRS, compressed
    (reference: PolynomialToKZGCommitment, eth/helpers.go:98-103)."""
    pt = es._jit_commit(poly_dev)
    return serialization.compress_g1(g1mod.to_affine_ints(pt))


def blob_to_kzg_commitment(es: EthSettings, blob: bytes) -> Optional[bytes]:
    """reference: BlobToKZGCommitment (eth/eth.go:145-151)."""
    p = blob_to_polynomial(es, blob)
    if p is None:
        return None
    return polynomial_to_kzg_commitment(es, p)


# ---------------- evaluation ----------------
def evaluate_polynomial_in_evaluation_form(es: EthSettings, poly_dev,
                                           z: int) -> int:
    """Barycentric evaluation on the bit-reversed domain
    (reference: EvaluatePolynomialInEvaluationForm, eth/helpers.go:207-211
    -> bls/globals.go:106-153). Returns the canonical int value."""
    zdev = jnp.asarray(fr.from_int(z))
    y = es._jit_eval(poly_dev, zdev)
    return int(fr.to_int(y)[()])


# ---------------- Fiat-Shamir ----------------
def _hash_polys_comms(es: EthSettings, polys_dev,
                      comms: Sequence[bytes]) -> bytes:
    """reference: hashPolysComms (eth/helpers.go:235-262)."""
    sha = hashlib.sha256()
    sha.update(FIAT_SHAMIR_PROTOCOL_DOMAIN)
    sha.update(es.width.to_bytes(8, "little"))
    sha.update(len(polys_dev).to_bytes(8, "little"))
    if len(polys_dev):
        sha.update(fr.to_bytes32_batch(polys_dev).tobytes())
    for c in comms:
        sha.update(bytes(c))
    return sha.digest()


def compute_challenges(es: EthSettings, polys_dev, comms: Sequence[bytes]):
    """-> (r_powers ints, evaluation_challenge int)
    (reference: ComputeChallenges, eth/helpers.go:215-231)."""
    h = _hash_polys_comms(es, polys_dev, comms)
    r = hash_to_bls_field(h + b"\x00")
    evaluation_challenge = hash_to_bls_field(h + b"\x01")
    return compute_powers(r, len(polys_dev)), evaluation_challenge


def compute_aggregated_poly_and_commitment(es: EthSettings, polys_dev,
                                           comms: Sequence[bytes]):
    """-> (aggregated poly dev, aggregated commitment host affine,
    evaluation challenge int) (reference:
    ComputeAggregatedPolyAndCommitment, eth/helpers.go:137-161)."""
    r_powers, challenge = compute_challenges(es, polys_dev, comms)
    powers_dev = jnp.asarray(fr.from_int(r_powers))
    agg_poly = es._jit_poly_lin_comb(polys_dev, powers_dev)
    comm_pts = [serialization.decompress_g1(bytes(c)) for c in comms]
    agg_comm = g1mod.to_affine_ints(
        lin_comb_g1(g1mod.from_affine_ints(comm_pts), powers_dev)
    )
    return agg_poly, agg_comm, challenge


# ---------------- proofs ----------------
def compute_kzg_proof(es: EthSettings, poly_dev, z: int) -> bytes:
    """Quotient entirely in evaluation form with one batched inversion
    (reference: ComputeKZGProof, eth/helpers.go:179-203)."""
    if z % FR_MODULUS in es.domain_set:
        raise ValueError("invalid z challenge: lies in the domain")
    y = evaluate_polynomial_in_evaluation_form(es, poly_dev, z)
    zdev = jnp.asarray(fr.from_int(z))
    ydev = jnp.asarray(fr.from_int(y))
    pt = es._jit_quotient_commit(poly_dev, zdev, ydev)
    return serialization.compress_g1(g1mod.to_affine_ints(pt))


def compute_aggregate_kzg_proof(es: EthSettings,
                                blobs: Sequence[bytes]) -> bytes:
    """reference: ComputeAggregateKZGProof (eth/eth.go:175-181)."""
    polys = blobs_to_polynomials(es, blobs)
    if polys is None:
        raise ValueError("could not convert blobs to polynomials")
    if len(polys) == 0:
        # proof over zero blobs: commitment to the zero polynomial
        return serialization.compress_g1(None)
    # all per-blob commitment MSMs in ONE dispatch: the MSM batches
    # leading scalar dims over shared points (curve/msm.py), so the blob
    # axis rides along (reference loops per blob, eth/helpers.go:165-175)
    pts = es._jit_commit(polys)  # coords (B, 24)
    comms = [
        serialization.compress_g1(a) for a in g1mod.to_affine_ints(pts)
    ]
    agg_poly, _, challenge = compute_aggregated_poly_and_commitment(
        es, polys, comms
    )
    return compute_kzg_proof(es, agg_poly, challenge)


def verify_kzg_proof_from_points(es: EthSettings, commitment_affine, z: int,
                                 y: int, proof_affine) -> bool:
    """e(C - [y]_1, G2) == e(proof, [s - z]_2)
    (reference: VerifyKZGProofFromPoints, eth/helpers.go:55-67)."""
    z2 = host_ec.g2_mul(host_ec.g2_generator(), z % FR_MODULUS)
    y1 = host_ec.g1_mul(host_ec.g1_generator(), y % FR_MODULUS)
    x_minus_z = host_ec.g2_sub(es.setup_g2_1, z2)
    p_minus_y = host_ec.g1_sub(commitment_affine, y1)
    return pairing.pairings_verify(
        host_ec.g1_neg(p_minus_y), host_ec.g2_generator(),
        proof_affine, x_minus_z,
    )


def verify_kzg_proof(es: EthSettings, commitment: bytes, z32: bytes,
                     y32: bytes, proof: bytes) -> bool:
    """reference: VerifyKZGProof (eth/eth.go:114-134). Raises on malformed
    inputs, returns False on a failing pairing check."""
    z = bytes_to_bls_field(z32)
    if z is None:
        raise ValueError("invalid evaluation point")
    y = bytes_to_bls_field(y32)
    if y is None:
        raise ValueError("invalid expected output")
    c = serialization.decompress_g1(bytes(commitment))
    p = serialization.decompress_g1(bytes(proof))
    return verify_kzg_proof_from_points(es, c, z, y, p)


def verify_aggregate_kzg_proof(es: EthSettings, blobs: Sequence[bytes],
                               comms: Sequence[bytes],
                               aggregated_proof: bytes) -> bool:
    """reference: VerifyAggregateKZGProof (eth/eth.go:155-171)."""
    polys = blobs_to_polynomials(es, blobs)
    if polys is None:
        raise ValueError("could not convert blobs to polynomials")
    agg_poly, agg_comm, challenge = compute_aggregated_poly_and_commitment(
        es, polys, comms
    )
    y = evaluate_polynomial_in_evaluation_form(es, agg_poly, challenge)
    proof_pt = serialization.decompress_g1(bytes(aggregated_proof))
    return verify_kzg_proof_from_points(
        es, agg_comm, challenge, y, proof_pt
    )


# ---------------- consensus / EL glue ----------------
def point_evaluation_precompile(es: EthSettings, input_: bytes) -> bytes:
    """versioned_hash | z | y | commitment | proof -> 64-byte constant
    (reference: PointEvaluationPrecompile, eth/eth.go:76-110).
    Raises ValueError on any failure (the precompile reverts)."""
    if len(input_) != PRECOMPILE_INPUT_LENGTH:
        raise ValueError("invalid input length")
    versioned_hash = input_[:32]
    z32 = input_[32:64]
    y32 = input_[64:96]
    commitment = input_[96:144]
    proof = input_[144:192]
    if kzg_to_versioned_hash(commitment) != versioned_hash:
        raise ValueError("mismatched versioned hash")
    if not verify_kzg_proof(es, commitment, z32, y32, proof):
        raise ValueError("invalid kzg proof")
    return es.width.to_bytes(32, "big") + FR_MODULUS.to_bytes(32, "big")


def validate_blobs_sidecar(es: EthSettings, slot: int,
                           beacon_block_root: bytes,
                           expected_kzg_commitments: Sequence[bytes],
                           sidecar: BlobsSidecar) -> None:
    """reference: ValidateBlobsSidecar (eth/eth.go:185-208).
    Raises ValueError on any mismatch."""
    if slot != sidecar.beacon_block_slot:
        raise ValueError("slot doesn't match sidecar's beacon block slot")
    if beacon_block_root != sidecar.beacon_block_root:
        raise ValueError("roots not equal")
    if len(sidecar.blobs) != len(expected_kzg_commitments):
        raise ValueError("blob len doesn't match expected commitments len")
    if not verify_aggregate_kzg_proof(
        es, sidecar.blobs, expected_kzg_commitments,
        sidecar.kzg_aggregated_proof,
    ):
        raise ValueError("invalid kzg proof")


def tx_peek_blob_versioned_hashes(tx: bytes) -> List[bytes]:
    """Raw blob-tx byte peeking (reference: TxPeekBlobVersionedHashes,
    eth/eth.go:234-256; offsets documented at eth/eth.go:213-233)."""
    if len(tx) < BLOB_VERSIONED_HASHES_OFFSET + 4:
        raise ValueError("blob tx invalid: too short")
    if tx[0] != BLOB_TX_TYPE:
        raise ValueError("invalid blob tx type")
    offset = (
        int.from_bytes(
            tx[BLOB_VERSIONED_HASHES_OFFSET: BLOB_VERSIONED_HASHES_OFFSET + 4],
            "little",
        )
        + 70
    )
    if offset > len(tx):
        raise ValueError("offset to versioned hashes is out of bounds")
    rest = len(tx) - offset
    if rest % 32 != 0:
        raise ValueError(
            "expected trailing data starting at versioned-hashes offset "
            "to be a multiple of 32 bytes"
        )
    return [tx[offset + 32 * i: offset + 32 * (i + 1)]
            for i in range(rest // 32)]


def verify_kzg_commitments_against_transactions(
    transactions: Sequence[bytes], kzg_commitments: Sequence[bytes]
) -> None:
    """reference: VerifyKZGCommitmentsAgainstTransactions
    (eth/eth.go:261-282). Raises ValueError on mismatch."""
    hashes: List[bytes] = []
    for tx in transactions:
        if len(tx) > 0 and tx[0] == BLOB_TX_TYPE:
            hashes.extend(tx_peek_blob_versioned_hashes(tx))
    if len(kzg_commitments) != len(hashes):
        raise ValueError("invalid number of blob versioned hashes")
    for c, h in zip(kzg_commitments, hashes):
        if kzg_to_versioned_hash(bytes(c)) != h:
            raise ValueError("invalid version hashes vs kzg")
