"""ctypes binding to the native C++ pairing (native/pairing.cpp).

The reference's pairing engine is the C++ "mcl" library behind cgo
(bls/bls_hbls.go); this is our equivalent native component. Falls back to
the exact-Python tower (kzg_tpu.curve.pairing) when the shared library is
not built. Build with:  make -C native
"""

from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "libkzgpair.so"
    )


def _try_build() -> None:
    """Best-effort build of the shared library (idempotent, quiet)."""
    import subprocess

    native_dir = os.path.dirname(_lib_path())
    try:
        subprocess.run(
            ["make", "-C", native_dir], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            timeout=120,
        )
    except Exception:
        pass


def load():
    """Load (and cache) the shared library; builds it on first use if a
    toolchain is available, else None (pure-Python fallback)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        _try_build()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.kzg_pairings_verify.restype = ctypes.c_int
        lib.kzg_pairings_verify.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return load() is not None


def _g1_blob(affine):
    """(x, y) ints or None -> (96 bytes, inf flag)."""
    if affine is None:
        return b"\x00" * 96, 1
    x, y = affine
    return x.to_bytes(48, "big") + y.to_bytes(48, "big"), 0


def _g2_blob(affine):
    """((x0,x1),(y0,y1)) ints or None -> (192 bytes, inf flag)."""
    if affine is None:
        return b"\x00" * 192, 1
    (x0, x1), (y0, y1) = affine
    return (x0.to_bytes(48, "big") + x1.to_bytes(48, "big")
            + y0.to_bytes(48, "big") + y1.to_bytes(48, "big")), 0


def pairings_verify(a1, a2, b1, b2) -> bool:
    """e(a1, a2) * e(b1, b2) == 1 via the native library.

    Same affine-int-tuple interface as pairing.pairings_verify. Raises
    RuntimeError if the library is not built (callers go through
    pairing.pairings_verify, which dispatches).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native pairing library not built")
    pa1, ia1 = _g1_blob(a1)
    pa2, ia2 = _g2_blob(a2)
    pb1, ib1 = _g1_blob(b1)
    pb2, ib2 = _g2_blob(b2)
    return bool(lib.kzg_pairings_verify(pa1, ia1, pa2, ia2,
                                        pb1, ib1, pb2, ib2))


def self_test() -> str:
    """Quick bilinearity check: e(aG1, G2) * e(-aG1, G2) == 1 and a
    mismatched product != 1."""
    from ..utils import host_ec

    g1 = host_ec.g1_generator()
    g2 = host_ec.g2_generator()
    a = host_ec.g1_mul(g1, 31415)
    ok1 = pairings_verify(a, g2, host_ec.g1_neg(a), g2)
    ok2 = pairings_verify(
        host_ec.g1_mul(g1, 2), host_ec.g2_mul(g2, 3),
        host_ec.g1_neg(host_ec.g1_mul(g1, 6)), g2)
    bad = pairings_verify(a, g2, a, g2)
    assert ok1 and ok2 and not bad, (ok1, ok2, bad)
    return "native pairing self-test OK"
