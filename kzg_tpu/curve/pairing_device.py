"""TPU-native batched pairing check over the device Fp12 tower.

The reference's pairing lives inside its CPU backends (PairingsVerify,
bls/bls_kilic.go:153-158 -> kilic engine; bls/bls_hbls.go:152-177 ->
C++ mcl). This is the device stage (SURVEY §7 step 8): verification of
N (proof, commitment) pairs as ONE jitted program — N-lane batched
Miller loops, one batched final exponentiation.

Design (inversion-free Miller): the loop runs on the UNTWISTED curve
E(Fp12) like the exact host oracle (curve/pairing.py), but with T in
Jacobian coordinates and the Miller value carried as a
numerator/denominator PAIR — every affine line value l = l_num/l_den is
accumulated without dividing, and the single division happens once at
the end (one batched Fp12 inversion for the whole batch). Multiplying
the line by arbitrary Fp12 cofactors would NOT be sound here (the final
exponentiation only kills proper-subfield factors, and untwisted
coordinates are not confined to a subfield), which is exactly why the
denominator is carried instead of dropped.

The final exponentiation uses Frobenius maps (gamma constants derived
numerically from the exact oracle) for the easy part and a base-p
4-way joint Shamir ladder for the hard part (~381 squarings + ~370
table multiplies); a generic square-multiply ladder over the full
(p^12-1)/r remains as final_exponentiation_generic, the differential
oracle for the fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..field import fp
from ..field.constants import BLS_X, FP_MODULUS, FR_MODULUS
from . import fp2, tower
from .tower import (
    f12_conj,
    f12_inv,
    f12_is_one,
    f12_mul,
    f12_one,
    f12_one_like,
    f12_pow_static,
    f12_select,
    f12_sqr,
    f12_sub,
)
from .weierstrass import JacobianPoint


# ---------------------------------------------------------------------------
# constants (host, from the exact oracle)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _untwist_consts():
    """1/w^2 and 1/w^3 as host limb arrays (from the exact oracle)."""
    from .pairing import _W2_INV, _W3_INV

    return (tower.f12_from_int(_W2_INV), tower.f12_from_int(_W3_INV))


def _embed_fp(x):
    """Fp (..., 24) -> Fp12 (..., 2, 3, 2, 24) scalar embedding."""
    z = jnp.zeros(x.shape[:-1] + (2, 3, 2, x.shape[-1]), dtype=x.dtype)
    return z.at[..., 0, 0, 0, :].set(x)


def _embed_fp2(x):
    """Fp2 (..., 2, 24) -> Fp12 c0.c0 embedding."""
    z = jnp.zeros(x.shape[:-2] + (2, 3, 2, x.shape[-1]), dtype=x.dtype)
    return z.at[..., 0, 0, :, :].set(x)


def untwist_g2(x2, y2):
    """Device: affine E'(Fp2) coords -> affine E(Fp12) coords
    (x/w^2, y/w^3), batched."""
    w2i, w3i = _untwist_consts()
    return (f12_mul(_embed_fp2(x2), jnp.asarray(w2i)),
            f12_mul(_embed_fp2(y2), jnp.asarray(w3i)))


# ---------------------------------------------------------------------------
# Miller loop (numerator/denominator accumulation)
# ---------------------------------------------------------------------------


def _stk(*xs):
    return jnp.stack(jnp.broadcast_arrays(*xs), axis=0)


def _dbl_step(t: JacobianPoint, xp, yp):
    """Fused non-complete doubling (dbl-2009-l, a=0) + tangent line at P,
    sharing A=X^2, B=Y^2, YZ and E=3A=3X^2 between the two, with every
    tier of independent products stacked into ONE Fp12 multiply (4 mul
    instances for the whole step — instance count is what both compile
    size and the vector path's dispatch cost scale with).

    Valid for T != O with Y != 0 — always true inside the Miller loop
    (T = c*Q for 0 < c < |x| << r and odd-order Q).

    line: l = [2YZ^3 yp - 2Y^2 - 3X^2 (xp Z^2 - X)] / (2YZ^3)."""
    F = tower
    X, Y, Z = t
    s1 = f12_mul(_stk(X, Y, Z, Y), _stk(X, Y, Z, Z))
    A, B, z2, YZ = s1[0], s1[1], s1[2], s1[3]
    E = F.f12_add(F.f12_add(A, A), A)          # 3X^2
    XB = F.f12_add(X, B)
    s2 = f12_mul(_stk(B, XB, YZ), _stk(B, XB, z2))
    C, XB2, YZz2 = s2[0], s2[1], s2[2]
    D = f12_sub(XB2, F.f12_add(A, C))
    D = F.f12_add(D, D)
    den = F.f12_add(YZz2, YZz2)                # 2YZ^3
    s3 = f12_mul(_stk(E, xp), _stk(E, z2))
    Fsq, xpz2 = s3[0], s3[1]
    X3 = f12_sub(Fsq, F.f12_add(D, D))
    m = f12_sub(xpz2, X)
    s4 = f12_mul(_stk(den, E, E), _stk(yp, m, f12_sub(D, X3)))
    dyp, Em, EDX = s4[0], s4[1], s4[2]
    B2 = F.f12_add(B, B)
    num = f12_sub(f12_sub(dyp, B2), Em)
    C8 = F.f12_add(C, C)
    C8 = F.f12_add(C8, C8)
    C8 = F.f12_add(C8, C8)
    Y3 = f12_sub(EDX, C8)
    Z3 = F.f12_add(YZ, YZ)
    return JacobianPoint(X3, Y3, Z3), num, den


def _add_step(t: JacobianPoint, xq, yq, xp, yp):
    """Fused non-complete mixed add T + Q (madd-2007-bl, Q affine) +
    chord line at P, sharing z2, U2 = xq Z^2 and S2 = yq Z^3 (the line's
    dx = -(H) and its yq Z^3 term ARE madd intermediates); 5 stacked
    Fp12 multiplies total. Valid for T != +-Q, both != O.

    line: l = [(yp - yq)(X - xq Z^2) Z - (Y - yq Z^3)(xp - xq)]
              / ((X - xq Z^2) Z)."""
    F = tower
    X1, Y1, Z1 = t
    s1 = f12_mul(_stk(Z1, yq), _stk(Z1, Z1))
    z2, yqZ = s1[0], s1[1]
    s2 = f12_mul(_stk(xq, yqZ), _stk(z2, z2))
    U2, S2 = s2[0], s2[1]
    H = f12_sub(U2, X1)
    ZH = F.f12_add(Z1, H)
    d = f12_sub(S2, Y1)
    r = F.f12_add(d, d)
    s3 = f12_mul(_stk(H, H, ZH, F.f12_neg(d)),
                 _stk(H, Z1, ZH, f12_sub(xp, xq)))
    HH, HZ, ZH2, m2 = s3[0], s3[1], s3[2], s3[3]
    I = F.f12_add(HH, HH)
    I = F.f12_add(I, I)
    den = F.f12_neg(HZ)                        # (X1 - U2) Z1
    s4 = f12_mul(_stk(H, X1, r, f12_sub(yp, yq)),
                 _stk(I, I, r, den))
    J, V, rr, m1 = s4[0], s4[1], s4[2], s4[3]
    X3 = f12_sub(f12_sub(rr, J), F.f12_add(V, V))
    num = f12_sub(m1, m2)
    s5 = f12_mul(_stk(r, Y1), _stk(f12_sub(V, X3), J))
    rV, YJ = s5[0], s5[1]
    Y3 = f12_sub(rV, F.f12_add(YJ, YJ))
    Z3 = f12_sub(ZH2, F.f12_add(z2, HH))       # (Z1+H)^2-Z1^2-H^2 = 2 Z1 H
    return JacobianPoint(X3, Y3, Z3), num, den


def miller_loop_batched(xq12, yq12, xp12, yp12):
    """f_{|x|,Q}(P)^{-1} as a (num, den) Fp12 pair, batched over leading
    axes (the BLS parameter is negative: the inversion is the pair swap).
    Inputs: untwisted affine Q and embedded affine P coordinates.

    The loop uses NON-COMPLETE Jacobian formulas for T: every T is a
    c*Q with 0 < c < |x| << r, so T is never the identity and add steps
    never hit T == +-Q; infinity inputs are masked by the caller. The
    numerator/denominator pipelines ride a stacked leading axis (one
    squaring + one multiply instance per step for both)."""
    u = -BLS_X
    bits = np.array([b == "1" for b in bin(u)[3:]], dtype=bool)
    one = tower.f12_one_like(xq12)
    q = JacobianPoint(xq12, yq12, one)

    def body(carry, bit):
        t, nd = carry                          # nd: (2, ...) num/den
        t, ln, ld = _dbl_step(t, xp12, yp12)
        nd = f12_mul(f12_sqr(nd), _stk(ln, ld))
        # conditional add step
        t_add, an, ad = _add_step(t, xq12, yq12, xp12, yp12)
        nd_add = f12_mul(nd, _stk(an, ad))
        nd = f12_select(bit, nd_add, nd)
        t = JacobianPoint(*(
            tower.f12_select(bit, ca, cb) for ca, cb in zip(t_add, t)))
        return (t, nd), None

    nd0 = jnp.stack([one, one], axis=0)
    (t, nd), _ = lax.scan(body, (q, nd0), jnp.asarray(bits))
    # x < 0: f^{-1} = den/num — swap the pair
    return nd[1], nd[0]


# ---------------------------------------------------------------------------
# Frobenius maps
#
# For basis elements B = w^a v^b of the tower, B^(p^k) = gamma * B with
# gamma in Fp2; the gammas are derived NUMERICALLY on host from the
# exact oracle (B.pow(p^k) has a single nonzero slot whose value IS the
# gamma, since the basis slot value is 1) — no transcription of
# published constant tables, and test_pairing_device pins
# frobenius(f, k) == f^(p^k) against the oracle.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _frob_gammas(k: int):
    """(6, 2, 24) host limb array: gamma for slot (w_idx, v_idx) =
    basis^(p^k) coefficient, basis = w^w_idx v^v_idx."""
    from .pairing import F2, F6, F12

    p = FP_MODULUS
    gammas = []
    for w_idx in range(2):
        for v_idx in range(3):
            f2s = [[F2.ZERO] * 3, [F2.ZERO] * 3]
            f2s[w_idx][v_idx] = F2.ONE
            b = F12(F6(*f2s[0]), F6(*f2s[1]))
            bp = b.pow(p**k)
            coeff = (bp.c0, bp.c1)[w_idx]
            slot = (coeff.c0, coeff.c1, coeff.c2)[v_idx]
            # all other slots must be empty (sanity of the derivation)
            probe = [c for s6 in (bp.c0, bp.c1)
                     for c in (s6.c0, s6.c1, s6.c2)]
            assert sum(0 if x.is_zero() else 1 for x in probe) == 1
            gammas.append([slot.a, slot.b])
    arr = np.asarray(gammas, dtype=object).reshape(2, 3, 2)
    return fp.from_int(arr)  # (2, 3, 2, 24)


def frobenius(f, k: int):
    """f^(p^k) via slot-wise conjugation + gamma multiplication.
    f: (..., 2, 3, 2, 24); k in 1..5."""
    gam = jnp.asarray(_frob_gammas(k))
    if k % 2 == 1:
        # (a + bu)^(p^odd) = a - bu on every Fp2 slot
        f = jnp.stack([f[..., 0, :], fp.neg(f[..., 1, :])], axis=-2)
    return fp2.mul(f, gam)


# ---------------------------------------------------------------------------
# final exponentiation
#
# easy part: f^((p^6-1)(p^2+1)) = t * frob2(t), t = conj(f) * f^-1.
# hard part: (p^4 - p^2 + 1)/r written in base p as
#     h = l3 p^3 + l2 p^2 + l1 p + l0   (li < p, plain integer digits)
# so m^h = PROD_i frob_i(m)^li — evaluated with one JOINT 381-bit
# Shamir ladder over a 16-entry subset-product table: ~381 squarings +
# ~370 table multiplies instead of the ~1710 ops of the generic
# 1139-bit ladder. No addition-chain transcription anywhere: the only
# imported structure is the Frobenius map, pinned against the oracle.
# ---------------------------------------------------------------------------

_FINAL_EXP = (FP_MODULUS**12 - 1) // FR_MODULUS
_HARD = (FP_MODULUS**4 - FP_MODULUS**2 + 1) // FR_MODULUS
_HARD_DIGITS = []
_h = _HARD
for _ in range(4):
    _HARD_DIGITS.append(_h % FP_MODULUS)
    _h //= FP_MODULUS
assert _h == 0


def _pow_joint(gs, exps):
    """PROD_i gs[i]^exps[i] (static host-int exponents, len <= 4) via a
    joint square-multiply scan with a 2^len subset-product table."""
    n = len(gs)
    nbits = max(e.bit_length() for e in exps)
    # bit matrix (nbits, n), MSB first
    bits = np.zeros((nbits,), dtype=np.int32)
    for j in range(nbits):
        idx = 0
        for i, e in enumerate(exps):
            if (e >> (nbits - 1 - j)) & 1:
                idx |= 1 << i
        bits[j] = idx
    # subset-product table [0..2^n): table[s] = prod_{i in s} gs[i]
    table = [f12_one_like(gs[0])]
    for s in range(1, 1 << n):
        low = s & -s
        i = low.bit_length() - 1
        rest = s ^ low
        table.append(f12_mul(table[rest], gs[i]))
    table_arr = jnp.stack(table, axis=0)  # (2^n, ..., 2,3,2,24)

    def body(acc, sel):
        acc = f12_sqr(acc)
        m = jnp.take(table_arr, sel, axis=0)
        return f12_mul(acc, m), None

    out, _ = lax.scan(body, f12_one_like(gs[0]), jnp.asarray(bits))
    return out


def final_exponentiation(f):
    """f^((p^12-1)/r), batched: Frobenius easy part + base-p joint
    ladder hard part."""
    t = f12_mul(f12_conj(f), f12_inv(f))    # f^(p^6 - 1)
    m = f12_mul(frobenius(t, 2), t)         # ^(p^2 + 1)
    gs = [m, frobenius(m, 1), frobenius(m, 2), frobenius(m, 3)]
    return _pow_joint(gs, _HARD_DIGITS)


def final_exponentiation_generic(f):
    """Reference ladder (kept as the differential oracle for the fast
    path; ~1710 Fp12 ops)."""
    return f12_pow_static(f, _FINAL_EXP)


# ---------------------------------------------------------------------------
# the product check
# ---------------------------------------------------------------------------


def pairings_product_is_one(a1: JacobianPoint, a2_affine,
                            b1: JacobianPoint, b2_affine):
    """Batched check e(a1_i, a2_i) * e(b1_i, b2_i) == 1.

    a1, b1: device G1 Jacobian batches (N,). a2_affine, b2_affine:
    device G2 AFFINE coordinate pairs (x2, y2, inf) with fp2 coords
    (N, 2, 24) (from g2.ops.to_affine). Returns bool (N,).

    Lanes where a G1 input is infinity contribute the identity for that
    pairing (PairingsVerify parity: kilic skips such terms); G2
    infinities likewise.
    """
    from . import g1 as g1mod

    xa, ya, inf_a1 = g1mod.ops.to_affine(a1)
    xb, yb, inf_b1 = g1mod.ops.to_affine(b1)
    xpa, ypa = _embed_fp(xa), _embed_fp(ya)
    xpb, ypb = _embed_fp(xb), _embed_fp(yb)
    (x2a, y2a, inf_a2) = a2_affine
    (x2b, y2b, inf_b2) = b2_affine
    xqa, yqa = untwist_g2(x2a, y2a)
    xqb, yqb = untwist_g2(x2b, y2b)

    na, da = miller_loop_batched(xqa, yqa, xpa, ypa)
    nb, db = miller_loop_batched(xqb, yqb, xpb, ypb)
    one = f12_one(na.shape[:-4])
    skip_a = inf_a1 | inf_a2
    skip_b = inf_b1 | inf_b2
    na = f12_select(skip_a, one, na)
    da = f12_select(skip_a, one, da)
    nb = f12_select(skip_b, one, nb)
    db = f12_select(skip_b, one, db)
    f = f12_mul(f12_mul(na, nb), f12_inv(f12_mul(da, db)))
    return f12_is_one(final_exponentiation(f))


pairings_product_is_one_jit = jax.jit(pairings_product_is_one)
