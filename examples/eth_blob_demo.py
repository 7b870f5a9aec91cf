"""EIP-4844 blob pipeline at production width (4096 field elements).

Drives the full consensus-spec surface end-to-end: blob -> commitment ->
point-evaluation proof -> precompile check -> aggregate proof over a
sidecar. Uses the insecure testing setup unless a ceremony JSON path is
given.

Usage: python examples/eth_blob_demo.py [width] [path/to/trusted_setup.json]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from kzg_tpu import eth
from kzg_tpu.field import fr
from kzg_tpu.utils.jaxcache import enable_compilation_cache

MOD = fr.SPEC.modulus


def run(width=4096, setup_path=None, n_blobs=2, verbose=True):
    enable_compilation_cache()

    def log(*a):
        if verbose:
            print(*a, flush=True)

    t0 = time.time()
    if setup_path:
        es = eth.EthSettings.from_json(setup_path)
    else:
        es = eth.EthSettings.insecure(secret=424242424242, width=width)
    log(f"settings ready (width {es.width})", round(time.time() - t0, 1))

    rng = np.random.default_rng(99)

    def rand_blob():
        vals = rng.integers(0, 2**62, size=es.width, dtype=np.uint64)
        return b"".join(int(v).to_bytes(32, "little") for v in vals)

    blob = rand_blob()
    comm = eth.blob_to_kzg_commitment(es, blob)
    assert comm is not None
    log("commitment", comm.hex()[:24], round(time.time() - t0, 1))

    p = eth.blob_to_polynomial(es, blob)
    z = 31415926535897932384
    y = eth.evaluate_polynomial_in_evaluation_form(es, p, z)
    proof = eth.compute_kzg_proof(es, p, z)
    assert eth.verify_kzg_proof(
        es, comm, z.to_bytes(32, "little"), y.to_bytes(32, "little"), proof)
    log("point-evaluation proof verified", round(time.time() - t0, 1))

    vh = eth.kzg_to_versioned_hash(comm)
    out = eth.point_evaluation_precompile(
        es, vh + z.to_bytes(32, "little") + y.to_bytes(32, "little")
        + comm + proof)
    assert int.from_bytes(out[:32], "big") == es.width
    log("precompile ok", round(time.time() - t0, 1))

    blobs = [blob] + [rand_blob() for _ in range(n_blobs - 1)]
    comms = [comm] + [eth.blob_to_kzg_commitment(es, b) for b in blobs[1:]]
    agg = eth.compute_aggregate_kzg_proof(es, blobs)
    sidecar = eth.BlobsSidecar(b"\x22" * 32, 7, blobs, agg)
    eth.validate_blobs_sidecar(es, 7, b"\x22" * 32, comms, sidecar)
    log(f"aggregate proof over {n_blobs} blobs verified",
        round(time.time() - t0, 1))
    return True


if __name__ == "__main__":
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    path = sys.argv[2] if len(sys.argv) > 2 else None
    run(width, path)
    print("ETH BLOB DEMO PASS")
