"""Trusted setup generation (testing only) and device-layout conversion.

Reference: GenerateTestingSetup (setup.go:9-26) — powers of a known secret
times the G1/G2 generators. INSECURE by construction, exactly like the
reference's: only for tests and benchmarks. Production setups load the
ceremony output through kzg_tpu.eth.setup_loader.

Setups are generated with exact host integer arithmetic and cached on disk
(.cache/kzg_tpu/), then shipped to the device as Jacobian limb batches.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from ..field.constants import FR_MODULUS
from ..utils import host_ec


def _cache_dir() -> str:
    d = os.environ.get(
        "KZG_TPU_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".cache"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def secret_from_string(hex_seed: str) -> int:
    """Parse a hex secret like the reference's test secret string
    (setup.go tests use "1927409816240961209460912649124"), reduced mod r."""
    return int(hex_seed, 16) % FR_MODULUS


def generate_testing_setup_ints(secret: int, n: int):
    """-> (s1 affine int pairs list, s2 affine Fp2 pairs list), length n.

    s1[i] = [secret^i] G1, s2[i] = [secret^i] G2.
    """
    key = hashlib.sha256(f"{secret}:{n}".encode()).hexdigest()[:24]
    path = os.path.join(_cache_dir(), f"setup_{key}.npz")
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        s1 = [
            (int.from_bytes(bytes(r[:48]), "big"),
             int.from_bytes(bytes(r[48:]), "big"))
            for r in z["s1"]
        ]
        s2 = [
            (
                (int.from_bytes(bytes(r[:48]), "big"),
                 int.from_bytes(bytes(r[48:96]), "big")),
                (int.from_bytes(bytes(r[96:144]), "big"),
                 int.from_bytes(bytes(r[144:]), "big")),
            )
            for r in z["s2"]
        ]
        return s1, s2

    g1 = host_ec.g1_generator()
    g2 = host_ec.g2_generator()
    s1, s2 = [], []
    power = 1
    for _ in range(n):
        s1.append(host_ec.g1_mul(g1, power))
        s2.append(host_ec.g2_mul(g2, power))
        power = power * secret % FR_MODULUS

    b1 = np.zeros((n, 96), dtype=np.uint8)
    b2 = np.zeros((n, 192), dtype=np.uint8)
    for i, ((x, y), ((x0, x1), (y0, y1))) in enumerate(zip(s1, s2)):
        b1[i, :48] = list(x.to_bytes(48, "big"))
        b1[i, 48:] = list(y.to_bytes(48, "big"))
        b2[i, :48] = list(x0.to_bytes(48, "big"))
        b2[i, 48:96] = list(x1.to_bytes(48, "big"))
        b2[i, 96:144] = list(y0.to_bytes(48, "big"))
        b2[i, 144:] = list(y1.to_bytes(48, "big"))
    np.savez_compressed(path, s1=b1, s2=b2)
    return s1, s2


def bench_kzg_settings(n: int, secret: int = 1927409816240961209460912649124):
    """Proof-generation-only KZGSettings with an n-point G1 CRS built by
    ONE batched device scalar-mul (seconds at 2^15, vs minutes for the
    host loop). The G2 side is a placeholder: FK20/commit benchmarks
    never touch it (verification paths need generate_testing_setup).
    """
    import jax.numpy as jnp

    from ..curve import g1 as g1mod
    from ..field import fr
    from ..ntt.domain import FFTSettings
    from .settings import KZGSettings

    secret %= FR_MODULUS
    powers, p = [], 1
    for _ in range(n):
        powers.append(p)
        p = p * secret % FR_MODULUS
    pts = g1mod.mul(
        g1mod.generator((n,)), jnp.asarray(fr.from_int(powers)))
    fs = FFTSettings((2 * n - 1).bit_length())
    return KZGSettings(fs, pts, [None] * n)


def insecure_kzg_settings_device(secret: int, n: int, fs,
                                 g2_indices=(1,)):
    """Production-scale testing KZGSettings: the n-point G1 CRS is ONE
    batched device scalar-mul (seconds at 2^16, vs hours of host EC),
    and [s^i]_2 is computed on host ONLY for the indices the pairing
    checks touch (check_proof_single needs 1, check_proof_multi needs
    the coset width). The rest of the G2 list is None placeholders.
    """
    import jax.numpy as jnp

    from ..curve import g1 as g1mod
    from ..field import fr
    from ..utils import host_ec
    from .settings import KZGSettings

    secret %= FR_MODULUS
    powers, p = [], 1
    for _ in range(n):
        powers.append(p)
        p = p * secret % FR_MODULUS
    pts = g1mod.mul(
        g1mod.generator((n,)), jnp.asarray(fr.from_int(powers)))
    s2 = [None] * n
    g2gen = host_ec.g2_generator()
    for i in set(int(i) for i in g2_indices):
        if 0 <= i < n:
            s2[i] = host_ec.g2_mul(g2gen, pow(secret, i, FR_MODULUS))
    return KZGSettings(fs, pts, s2)


def generate_testing_setup(secret: int, n: int):
    """-> (G1 device JacobianPoint batch (n,), G2 device batch (n,),
    host affine lists). The device batches feed commit/FK20; the host lists
    feed pairing checks."""
    from ..curve import fp2
    from ..curve import g1 as g1mod
    from ..curve.weierstrass import JacobianPoint

    s1, s2 = generate_testing_setup_ints(secret, n)
    pts1 = g1mod.from_affine_ints(s1)
    xs = [list(q[0]) for q in s2]
    ys = [list(q[1]) for q in s2]
    pts2 = JacobianPoint(
        fp2.from_int(xs),
        fp2.from_int(ys),
        fp2.from_int([[1, 0]] * n),
    )
    return pts1, pts2, s1, s2
