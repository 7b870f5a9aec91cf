"""Compressed point (de)serialization, ZCash/IETF format (host-side).

Parity with ToCompressedG1/FromCompressedG1 (bls/bls_kilic.go:114-130) and
the hex text marshalling (bls/bls_all.go:20-61). 48 bytes for G1, 96 for
G2, big-endian x with 3 flag bits in the top byte:
  bit7 (0x80): compressed flag (always set here)
  bit6 (0x40): infinity flag
  bit5 (0x20): sign of y (set if y > (p-1)/2)
Decompression needs a square root in Fp; p == 3 (mod 4) so
sqrt(a) = a^((p+1)/4).
"""

from __future__ import annotations

from ..field.constants import CURVE_B, FP_MODULUS

P = FP_MODULUS


def _sqrt_fp(a: int):
    r = pow(a, (P + 1) // 4, P)
    if r * r % P != a % P:
        return None
    return r


def _sqrt_fp2(a0: int, a1: int):
    """Square root in Fp2 via norm trick; returns (r0, r1) or None."""
    if a1 == 0:
        r = _sqrt_fp(a0)
        if r is not None:
            return (r, 0)
        # a0 is a non-residue: sqrt is purely imaginary, a0 = -(r1^2)
        r = _sqrt_fp((-a0) % P)
        if r is None:
            return None
        return (0, r)
    # norm = a0^2 + a1^2 must be a QR in Fp
    n = _sqrt_fp((a0 * a0 + a1 * a1) % P)
    if n is None:
        return None
    for nn in (n, (-n) % P):
        d = (a0 + nn) * pow(2, -1, P) % P
        r0 = _sqrt_fp(d)
        if r0 is None:
            continue
        if r0 == 0:
            continue
        r1 = a1 * pow(2 * r0, -1, P) % P
        if (r0 * r0 - r1 * r1) % P == a0 % P and (2 * r0 * r1) % P == a1 % P:
            return (r0, r1)
    return None


def compress_g1(affine) -> bytes:
    """(x, y) ints or None (infinity) -> 48 bytes."""
    if affine is None:
        out = bytearray(48)
        out[0] = 0xC0
        return bytes(out)
    x, y = affine
    flags = 0x80
    if y > (P - 1) // 2:
        flags |= 0x20
    b = bytearray(x.to_bytes(48, "big"))
    b[0] |= flags
    return bytes(b)


def decompress_g1(data: bytes):
    """48 bytes -> (x, y) ints or None (infinity). Raises on invalid."""
    if len(data) != 48:
        raise ValueError("G1 compressed point must be 48 bytes")
    flags = data[0]
    if not flags & 0x80:
        raise ValueError("uncompressed form not supported")
    if flags & 0x40:
        if any(data[1:]) or (flags & 0x3F):
            raise ValueError("invalid infinity encoding")
        return None
    x = int.from_bytes(bytes([flags & 0x1F]) + data[1:], "big")
    if x >= P:
        raise ValueError("x out of range")
    y2 = (pow(x, 3, P) + CURVE_B) % P
    y = _sqrt_fp(y2)
    if y is None:
        raise ValueError("point not on curve")
    y_is_big = y > (P - 1) // 2
    if bool(flags & 0x20) != y_is_big:
        y = (P - y) % P
    return (x, y)


def compress_g2(affine) -> bytes:
    """((x0,x1),(y0,y1)) ints or None -> 96 bytes (x1 first, per spec)."""
    if affine is None:
        out = bytearray(96)
        out[0] = 0xC0
        return bytes(out)
    (x0, x1), (y0, y1) = affine
    flags = 0x80
    if y1 > (P - 1) // 2 or (y1 == 0 and y0 > (P - 1) // 2):
        flags |= 0x20
    b = bytearray(x1.to_bytes(48, "big") + x0.to_bytes(48, "big"))
    b[0] |= flags
    return bytes(b)


def decompress_g2(data: bytes):
    """96 bytes -> ((x0,x1),(y0,y1)) ints or None. Raises on invalid."""
    if len(data) != 96:
        raise ValueError("G2 compressed point must be 96 bytes")
    flags = data[0]
    if not flags & 0x80:
        raise ValueError("uncompressed form not supported")
    if flags & 0x40:
        if any(data[1:]) or (flags & 0x3F):
            raise ValueError("invalid infinity encoding")
        return None
    x1 = int.from_bytes(bytes([flags & 0x1F]) + data[1:48], "big")
    x0 = int.from_bytes(data[48:96], "big")
    if x0 >= P or x1 >= P:
        raise ValueError("x out of range")
    # y^2 = x^3 + 4(u+1) in Fp2
    x0_3 = (x0 * (x0 * x0 - 3 * x1 * x1)) % P
    x1_3 = (x1 * (3 * x0 * x0 - x1 * x1)) % P
    y2 = ((x0_3 + 4) % P, (x1_3 + 4) % P)
    y = _sqrt_fp2(*y2)
    if y is None:
        raise ValueError("point not on curve")
    y0, y1 = y
    y_is_big = y1 > (P - 1) // 2 or (y1 == 0 and y0 > (P - 1) // 2)
    if bool(flags & 0x20) != y_is_big:
        y0, y1 = (P - y0) % P, (P - y1) % P
        if y0 == P:
            y0 = 0
        if y1 == P:
            y1 = 0
    return ((x0, x1), (y0, y1))


def g1_to_hex(affine) -> str:
    """MarshalText parity (bls/bls_all.go:20-32)."""
    return compress_g1(affine).hex()


def g1_from_hex(s: str):
    return decompress_g1(bytes.fromhex(s))


def g2_to_hex(affine) -> str:
    return compress_g2(affine).hex()


def g2_from_hex(s: str):
    return decompress_g2(bytes.fromhex(s))
