"""Fused Pallas TPU kernels for G1 Jacobian arithmetic (round-4 engine).

Why: the generic curve layer (weierstrass.py) composes point formulas from
per-field-op calls, so every Fp multiply is its own kernel launch with a
lane-relayout on each side and an HBM round-trip between — measured ~10x
off the VPU bound, which left FFT-G1 BELOW the reference's CPU baseline.
Here a whole point operation (or a whole windowed scalar multiplication)
runs inside ONE kernel with every Fp intermediate VMEM-resident.

Layout: a point tile is three (24, W) uint32 coordinate tiles (limbs on
sublanes, batch on lanes), matching field/pallas_kernels.py. Wrappers
accept the library's canonical (..., 24) layout and relayout once per
call.

Formulas, two tiers:
  * standalone add/double kernels: Jacobian dbl-2009-l and the complete
    add-2007-bl with masked selects — bit-exact with
    weierstrass.CurveOps (differentially tested against it), which
    mirrors the reference's kilic Jacobian backend
    (reference: bls/bls_kilic.go:29-112).
  * ladder kernels (scalar mul, GLV butterfly): Renes–Costello–Batina
    complete homogeneous-projective formulas (12M add / 8M double,
    straight-line, no selects — complete because BLS12-381's E(Fp)
    order is odd), with Jacobian conversion once per kernel call.

Scalar multiplication is signed 4-bit fixed-window: an in-VMEM multiples
table [1..8]P (built once per tile) and one fused kernel for the whole
64-window ladder. The GLV variant (glv.py) halves the ladder for scalars
known on the host (FFT twiddles): k = k1 + lambda*k2 with 33-digit
halves, the second half applied through the cube-root endomorphism
phi(x, y, z) = (beta*x, y, z).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fp
from ..field.constants import FP_MODULUS
from ..field.pallas_kernels import (
    LANES,
    _carry_fold,
    _const_spec,
    _interpret,
    _product_cols,
    lazy_add_tile,
    lazy_canon_tile,
    lazy_mul_tile,
    lazy_sub_tile,
    mod_add_tile,
    mod_sub_tile,
    mont_mul_tile,
    mont_sqr_tile,
)
from .weierstrass import JacobianPoint

U32 = jnp.uint32
L = fp.SPEC.n_limbs  # 24

# Extended lazy domain for the ladder kernels (field/pallas_kernels.py
# "lazy-reduction tile ops"): one headroom limb (LL = 25, R_ext = 2^400)
# gives R_ext/m ~ 2^19 of slack, so adds/subs never reduce and lazy_mul
# drops its trailing conditional subtract. Bound audit for the RCB
# formulas below: lazy_mul's REDC output bound is input-dependent,
# m * (1 + c1*c2*m/R_ext) for operands < c1*m, c2*m — up to ~1.26m for
# the worst ladder pair (~131m x ~780m, 131*780*m/R_ext ~ 0.26m), so
# treat every mul output as < 1.3m. Add outputs < sum of operands; subs
# add K*m (K = 64 uniformly; with 1.3m mul outputs every subtrahend in
# the formulas stays < 17m < 64m, so lazy_sub never underflows); the
# largest intermediate is b3 (sub offset + adds) < 790m ~ 2^390.6 <<
# 2^400, and the largest product pair (<131m, <790m) satisfies
# 131*790 < R_ext/m ~ 2^19, keeping every REDC in range. Values
# enter/leave in the library's R=2^384 Montgomery form: to-ext is one
# lazy_mul by C_IN = 2^416 mod m (multiplies by 2^16), from-ext one
# lazy_mul by C_OUT = 2^384 mod m plus one canonical conditional
# subtract.
LL = L + 1  # 25
R_EXT = 1 << (16 * LL)

# GLV endomorphism constants (verified against the host EC oracle in
# tests/test_pallas_g1.py): lambda is a primitive cube root of unity
# mod r, beta the matching cube root of unity mod p with
# (beta*x, y) == lambda * (x, y) for points in the r-torsion subgroup.
GLV_LAMBDA = 0xAC45A4010001A40200000000FFFFFFFF
GLV_BETA = int(
    "0x1a0111ea397fe699ec02408663d4de85aa0d857d89759ad4897d29650fb85f9b"
    "409427eb4f49fffd8bfd00000000aaac", 16,
)

DEFAULT_BLOCK = 256


def _mxu_ladder_enabled() -> bool:
    """MXU-assisted REDC in the ladder kernels — OPT-IN (KZG_TPU_MXU_LADDER=1).
    The field FFT kernels use it by default (measured 1.15-1.28x,
    field/pallas_kernels.py), but the ladder kernels wrap the dots
    inside 33-window fori loops and the round-5 Mosaic compile of that
    shape did not finish in 20 minutes on-chip; until that is bounded,
    the ladders stay on the pure-VPU path."""
    import os

    return os.environ.get("KZG_TPU_MXU_LADDER", "0") == "1"


# ---------------------------------------------------------------------------
# tile-level point math: a point is a tuple (x, y, z) of (24, W) tiles
# ---------------------------------------------------------------------------

def _is_zero_tile(x):
    """bool[W]: all limbs zero along the sublane axis."""
    return jnp.all(x == 0, axis=0)


def _select_tile(mask, a, b):
    """where(mask[W], a, b) per coordinate tuple."""
    return tuple(jnp.where(mask[None, :], ca, cb) for ca, cb in zip(a, b))


def point_double_tile(mod, npr, p):
    """dbl-2009-l (a=0). Infinity -> infinity (Z3 = 2YZ = 0).
    Matches weierstrass.CurveOps.double bit-exactly."""
    x1, y1, z1 = p
    a = mont_sqr_tile(mod, npr, x1)
    b = mont_sqr_tile(mod, npr, y1)
    c = mont_sqr_tile(mod, npr, b)
    d = mod_sub_tile(mod, mont_sqr_tile(mod, npr, mod_add_tile(mod, x1, b)),
                     mod_add_tile(mod, a, c))
    d = mod_add_tile(mod, d, d)
    e = mod_add_tile(mod, mod_add_tile(mod, a, a), a)
    f = mont_sqr_tile(mod, npr, e)
    x3 = mod_sub_tile(mod, f, mod_add_tile(mod, d, d))
    c8 = mod_add_tile(mod, c, c)
    c8 = mod_add_tile(mod, c8, c8)
    c8 = mod_add_tile(mod, c8, c8)
    y3 = mod_sub_tile(
        mod, mont_mul_tile(mod, npr, e, mod_sub_tile(mod, d, x3)), c8)
    yz = mont_mul_tile(mod, npr, y1, z1)
    z3 = mod_add_tile(mod, yz, yz)
    return x3, y3, z3


def point_add_tile(mod, npr, p, q):
    """Complete add via masked selects (add-2007-bl core), bit-exact with
    weierstrass.CurveOps.add: handles P==Q, P==-Q, and infinities."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = mont_sqr_tile(mod, npr, z1)
    z2z2 = mont_sqr_tile(mod, npr, z2)
    u1 = mont_mul_tile(mod, npr, x1, z2z2)
    u2 = mont_mul_tile(mod, npr, x2, z1z1)
    s1 = mont_mul_tile(mod, npr, mont_mul_tile(mod, npr, y1, z2), z2z2)
    s2 = mont_mul_tile(mod, npr, mont_mul_tile(mod, npr, y2, z1), z1z1)
    h = mod_sub_tile(mod, u2, u1)
    rr = mod_sub_tile(mod, s2, s1)

    h2 = mod_add_tile(mod, h, h)
    i = mont_sqr_tile(mod, npr, h2)
    j = mont_mul_tile(mod, npr, h, i)
    rr2 = mod_add_tile(mod, rr, rr)
    v = mont_mul_tile(mod, npr, u1, i)
    x3 = mod_sub_tile(mod, mont_sqr_tile(mod, npr, rr2),
                      mod_add_tile(mod, j, mod_add_tile(mod, v, v)))
    s1j = mont_mul_tile(mod, npr, s1, j)
    y3 = mod_sub_tile(
        mod, mont_mul_tile(mod, npr, rr2, mod_sub_tile(mod, v, x3)),
        mod_add_tile(mod, s1j, s1j))
    z3 = mont_mul_tile(
        mod, npr,
        mod_sub_tile(mod, mont_sqr_tile(mod, npr, mod_add_tile(mod, z1, z2)),
                     mod_add_tile(mod, z1z1, z2z2)),
        h)
    generic = (x3, y3, z3)

    same_x = _is_zero_tile(h)
    same_y = _is_zero_tile(rr)
    p_inf = _is_zero_tile(z1)
    q_inf = _is_zero_tile(z2)

    dbl = point_double_tile(mod, npr, p)
    res = _select_tile(same_x & same_y & ~p_inf & ~q_inf, dbl, generic)
    # Infinity is encoded as Z == 0; X/Y are don't-cares for every
    # consumer (all-zero here, vs Montgomery ONE in weierstrass.py —
    # kernels avoid capturing array constants, and projective equality /
    # to_affine are representation-blind).
    zero = jnp.zeros_like(z1)
    inf = (zero, zero, zero)
    res = _select_tile(same_x & ~same_y & ~p_inf & ~q_inf, inf, res)
    res = _select_tile(q_inf, p, res)
    res = _select_tile(p_inf, q, res)
    return res


# ---------------------------------------------------------------------------
# complete homogeneous-projective formulas (Renes–Costello–Batina 2015,
# eprint 2015/1060, Algorithms 7 & 9 for a=0, b3 = 3b = 12).
#
# COMPLETE on all of E(Fp) for BLS12-381 (the full group order h*r is
# odd, so there is no 2-torsion): no masked selects, no is_zero
# reductions, no embedded doubling branch — a straight-line 12M add and
# 8M double. The ladders run in these coordinates, in the LL-limb lazy
# domain (no canonical reduction anywhere inside), and convert from/to
# the library's Jacobian layout once per kernel call. Identity: (0:1:0).
#
# `lz` is the lazy context tuple (modx, nprx, km64): extended-domain
# modulus / -m^-1 mod R_ext tiles and the precomputed 64*m tile that
# every lazy subtraction offsets by.
# ---------------------------------------------------------------------------

def _lazy_ctx(modx, nprx, mxc=None):
    """Build the in-kernel lazy context: km64 = 64*m by repeated
    doubling (six folded adds, done once per kernel invocation).
    mxc: optional (np_lo, np_hi, m_lo, m_hi) byte-plane Toeplitz tiles —
    when present, every lazy multiply's two by-constant REDC passes run
    on the MXU (field/pallas_kernels.lazy_mul_tile_mxu, bit-identical)."""
    km = modx
    for _ in range(6):
        km = lazy_add_tile(km, km)
    return (modx, nprx, km, mxc)


def _lm(lz, a, b):
    """The context's lazy multiply (VPU or MXU-assisted)."""
    modx, nprx, _, mxc = lz
    if mxc is None:
        return lazy_mul_tile(modx, nprx, a, b)
    from ..field.pallas_kernels import lazy_mul_tile_mxu

    return lazy_mul_tile_mxu(modx, nprx, mxc, a, b)


def _b3_mul(lz, x):
    """12*x (b3 = 3b, b = 4): three doublings and an add, no reduction."""
    x2 = lazy_add_tile(x, x)
    x4 = lazy_add_tile(x2, x2)
    x8 = lazy_add_tile(x4, x4)
    return lazy_add_tile(x8, x4)


def proj_add(lz, p, q):
    """RCB15 Algorithm 7 (a=0): complete projective add, 12M + 2*b3."""
    modx, nprx, km = lz[:3]
    x1, y1, z1 = p
    x2, y2, z2 = q
    M = lambda a, b: _lm(lz, a, b)
    A = lazy_add_tile
    S = lambda a, b: lazy_sub_tile(km, a, b)

    t0 = M(x1, x2)
    t1 = M(y1, y2)
    t2 = M(z1, z2)
    t3 = A(x1, y1)
    t4 = A(x2, y2)
    t3 = M(t3, t4)
    t4 = A(t0, t1)
    t3 = S(t3, t4)          # X1Y2 + X2Y1
    t4 = A(y1, z1)
    x3 = A(y2, z2)
    t4 = M(t4, x3)
    x3 = A(t1, t2)
    t4 = S(t4, x3)          # Y1Z2 + Y2Z1
    x3 = A(x1, z1)
    y3 = A(x2, z2)
    x3 = M(x3, y3)
    y3 = A(t0, t2)
    y3 = S(x3, y3)          # X1Z2 + X2Z1
    x3 = A(t0, t0)
    t0 = A(x3, t0)          # 3 X1X2
    t2 = _b3_mul(lz, t2)
    z3 = A(t1, t2)
    t1 = S(t1, t2)
    y3 = _b3_mul(lz, y3)
    x3 = M(t4, y3)
    t2 = M(t3, t1)
    x3 = S(t2, x3)
    y3 = M(y3, t0)
    t1 = M(t1, z3)
    y3 = A(t1, y3)
    t0 = M(t0, t3)
    z3 = M(z3, t4)
    z3 = A(z3, t0)
    return x3, y3, z3


def proj_double(lz, p):
    """RCB15 Algorithm 9 (a=0): complete projective double, 8M + b3."""
    modx, nprx, km = lz[:3]
    x, y, z = p
    M = lambda a, b: _lm(lz, a, b)
    A = lazy_add_tile
    S = lambda a, b: lazy_sub_tile(km, a, b)

    t0 = M(y, y)
    z3 = A(t0, t0)
    z3 = A(z3, z3)
    z3 = A(z3, z3)          # 8Y^2
    t1 = M(y, z)
    t2 = M(z, z)
    t2 = _b3_mul(lz, t2)    # b3 Z^2
    x3 = M(t2, z3)
    y3 = A(t0, t2)
    z3 = M(t1, z3)
    t1 = A(t2, t2)
    t2 = A(t1, t2)
    t0 = S(t0, t2)
    y3 = M(t0, y3)
    y3 = A(x3, y3)
    t1 = M(x, y)
    x3 = M(t0, t1)
    x3 = A(x3, x3)
    return x3, y3, z3


def to_ext(lz, cin, v):
    """(L, W) canonical R-form value -> (LL, W) lazy R_ext-form.

    Pads the headroom limb and multiplies by C_IN = 2^(16*(2*LL-L)) mod m
    (net effect: value * 2^(16*(LL-L)), i.e. a*R -> a*R_ext). Output is a
    fresh lazy_mul result, < 1.01m."""
    modx, nprx = lz[0], lz[1]
    vx = jnp.pad(v, ((0, LL - L), (0, 0)))
    return _lm(lz, vx, cin)


def from_ext(lz, cout, v):
    """(LL, W) lazy R_ext-form -> (L, W) canonical R-form.

    Multiplies by C_OUT = 2^(16*L) mod m (net: divide by 2^(16*(LL-L))),
    then one canonical conditional subtract; the headroom limb of the
    result is zero and is dropped."""
    modx, nprx = lz[0], lz[1]
    out = lazy_canon_tile(modx, _lm(lz, v, cout))
    return out[:L]


def jac_to_proj(lz, one_ext, p):
    """Jacobian (X, Y, Z) [x=X/Z^2, y=Y/Z^3] -> projective (XZ : Y : Z^3),
    in the lazy ext domain.

    The library's zero-limb infinity (Z=0, X/Y arbitrary incl. all-zero)
    maps to the valid projective identity (0 : 1 : 0)."""
    modx, nprx = lz[0], lz[1]
    x, y, z = p
    M = lambda a, b: _lm(lz, a, b)
    inf = _is_zero_tile(z)
    xp = M(x, z)
    zp = M(M(z, z), z)
    yp = jnp.where(inf[None, :], jnp.broadcast_to(one_ext, y.shape), y)
    return xp, yp, zp


def proj_to_jac(lz, p):
    """Projective (X : Y : Z) [x=X/Z, y=Y/Z] -> Jacobian (XZ, YZ^2, Z),
    still in the lazy ext domain (callers run from_ext on each coord).
    Identity (0:1:0) -> Z=0 (the library's infinity encoding)."""
    modx, nprx = lz[0], lz[1]
    x, y, z = p
    M = lambda a, b: _lm(lz, a, b)
    return M(x, z), M(y, M(z, z)), z


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _add_fn(B: int, block: int, interpret: bool):
    def kernel(mod_ref, npr_ref, px, py, pz, qx, qy, qz, ox, oy, oz):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]
        x3, y3, z3 = point_add_tile(
            mod, npr, (px[:], py[:], pz[:]), (qx[:], qy[:], qz[:]))
        ox[:], oy[:], oz[:] = x3, y3, z3

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(L)] * 2 + [bspec] * 6,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _double_fn(B: int, block: int, interpret: bool):
    def kernel(mod_ref, npr_ref, px, py, pz, ox, oy, oz):
        mod = mod_ref[:, :1]
        x3, y3, z3 = point_double_tile(
            mod, npr_ref[:, :1], (px[:], py[:], pz[:]))
        ox[:], oy[:], oz[:] = x3, y3, z3

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(L)] * 2 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)),
        interpret=interpret,
    )


def _table_build_body(lz, tx, ty, tz):
    """Fill table refs (8, LL, W) with [1..8]P in lazy PROJECTIVE coords:
    slot j holds (j+1)*P, slot 0 pre-seeded with projective P by the
    caller. One traced complete add, (k+1)*P = k*P + P."""
    base = (tx[0], ty[0], tz[0])

    def body(k, _):
        prev = (tx[k - 1], ty[k - 1], tz[k - 1])
        nx, ny, nz = proj_add(lz, prev, base)
        tx[k], ty[k], tz[k] = nx, ny, nz
        return 0

    lax.fori_loop(1, 8, body, 0, unroll=False)


def _table_select(tx, ty, tz, mag):
    """Select table entry |mag| per lane (mag in [0..8]; 0 -> entry 1,
    masked out by the caller). 8-way select chain, no gathers."""
    x = tx[0]
    y = ty[0]
    z = tz[0]
    for k in range(2, 9):
        m = (mag == k)[None, :]
        x = jnp.where(m, tx[k - 1], x)
        y = jnp.where(m, ty[k - 1], y)
        z = jnp.where(m, tz[k - 1], z)
    return x, y, z


def _apply_digit(lz, acc, tx, ty, tz, dig):
    """acc += sign(dig) * table[|dig|] (lazy projective complete add);
    dig == 0 is a no-op."""
    mag = jnp.abs(dig)
    sx, sy, sz = _table_select(tx, ty, tz, mag)
    sy = jnp.where((dig < 0)[None, :],
                   lazy_sub_tile(lz[2], jnp.zeros_like(sy), sy), sy)
    added = proj_add(lz, acc, (sx, sy, sz))
    return _select_tile(mag == 0, acc, added)


# lazy-domain constants ride in SEPARATE kernel operands, one (LL, LANES)
# ref each, sliced [:, :1] from row 0. Measured (scripts/exp_ab_mul.py vs
# exp_lazyops.py): slicing the same values out of one stacked const ref
# made every product against them ~4x slower — mid-array sublane slices
# poison Mosaic's codegen for all downstream ops.
N_CST = 6  # modx, nprx, c_in, c_out, one_ext, beta_ext


def _kernel_ctx(crefs, mx_refs=None):
    """(lz, cin, cout, one_ext) from the per-constant operand refs
    (modx, nprx, cin, cout, one) — each a full (LL, LANES) ref.
    mx_refs: optional byte-plane Toeplitz matrix refs enabling the
    MXU-assisted lazy multiply."""
    modx_ref, nprx_ref, cin_ref, cout_ref, one_ref = crefs
    mxc = tuple(r[:] for r in mx_refs) if mx_refs is not None else None
    lz = _lazy_ctx(modx_ref[:, :1], nprx_ref[:, :1], mxc)
    return (lz, cin_ref[:, :1], cout_ref[:, :1], one_ref[:, :1])


@functools.lru_cache(maxsize=None)
def _scalar_mul_fn(B: int, block: int, n_windows: int, interpret: bool,
                   mxu: bool):
    """points (3x (24, B)) x signed digits (n_windows, B) -> digit-weighted
    windowed scalar multiple. MSB-first Horner: acc = 16*acc + d_j * P.
    Jacobian in/out; the ladder runs in lazy complete projective coords."""

    def kernel(modx_ref, nprx_ref, cin_ref, cout_ref, one_ref, *refs):
        mx_refs = refs[:4] if mxu else None
        (px, py, pz, dig, ox, oy, oz, tx, ty, tz) = (
            refs[4:] if mxu else refs)
        lz, cin, cout, one_ext = _kernel_ctx(
            (modx_ref, nprx_ref, cin_ref, cout_ref, one_ref), mx_refs)
        p_ext = tuple(to_ext(lz, cin, c) for c in (px[:], py[:], pz[:]))
        tx[0], ty[0], tz[0] = jac_to_proj(lz, one_ext, p_ext)
        _table_build_body(lz, tx, ty, tz)

        zero = jnp.zeros((LL, block), dtype=U32)
        oneb = jnp.broadcast_to(one_ext, zero.shape)
        acc0 = (zero, oneb, zero)  # projective identity (0 : 1 : 0)

        def body(i, acc):
            def dbl(_, a):
                return proj_double(lz, a)

            acc = lax.fori_loop(0, 4, dbl, acc, unroll=False)
            d = dig[n_windows - 1 - i]
            return _apply_digit(lz, acc, tx, ty, tz, d)

        acc = lax.fori_loop(0, n_windows, body, acc0, unroll=False)
        jx, jy, jz = proj_to_jac(lz, acc)
        ox[:] = from_ext(lz, cout, jx)
        oy[:] = from_ext(lz, cout, jy)
        oz[:] = from_ext(lz, cout, jz)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((n_windows, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    from ..field.pallas_kernels import _mxu_specs

    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(LL)] * 5
        + (_mxu_specs(LL) if mxu else []) + [bspec] * 3 + [dspec],
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((8, LL, block), U32) for _ in range(3)],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _scalar_mul_glv_fn(B: int, block: int, n_windows: int, interpret: bool,
                       mxu: bool):
    """GLV twiddle multiply + FFT butterfly, one fused kernel per stage:

        t  = (d1 . windows)(B) + (d2 . windows)(phi(B))
        lo = A + t,  hi = A - t

    d1/d2 are signed digit rows of the half-scalars k1, k2 with
    tw = k1 + lambda*k2 (host-decomposed, glv.py); phi scales x by beta.
    Requires B in the r-torsion subgroup (all KZG/FK20 inputs are).
    """

    def kernel(modx_ref, nprx_ref, cin_ref, cout_ref, one_ref, beta_ref,
               *refs):
        mx_refs = refs[:4] if mxu else None
        (ax, ay, az, bx, by, bz,
         d1, d2, lox, loy, loz, hix, hiy, hiz, tx, ty, tz, ux) = (
            refs[4:] if mxu else refs)
        lz, cin, cout, one_ext = _kernel_ctx(
            (modx_ref, nprx_ref, cin_ref, cout_ref, one_ref), mx_refs)
        beta = beta_ref[:, :1]
        b_ext = tuple(to_ext(lz, cin, c) for c in (bx[:], by[:], bz[:]))
        tx[0], ty[0], tz[0] = jac_to_proj(lz, one_ext, b_ext)
        _table_build_body(lz, tx, ty, tz)
        # phi table: same entries with x scaled by beta (y/z shared;
        # phi((X:Y:Z)) = (beta*X : Y : Z) in projective coords too)
        modx, nprx = lz[0], lz[1]

        def phi(k, _):
            ux[k] = _lm(lz, tx[k], beta)
            return 0

        lax.fori_loop(0, 8, phi, 0, unroll=False)

        zero = jnp.zeros((LL, block), dtype=U32)
        oneb = jnp.broadcast_to(one_ext, zero.shape)
        acc0 = (zero, oneb, zero)  # projective identity (0 : 1 : 0)

        def body(i, acc):
            def dbl(_, a):
                return proj_double(lz, a)

            acc = lax.fori_loop(0, 4, dbl, acc, unroll=False)
            acc = _apply_digit(lz, acc, tx, ty, tz,
                               d1[n_windows - 1 - i])
            return _apply_digit(lz, acc, ux, ty, tz,
                                d2[n_windows - 1 - i])

        t = lax.fori_loop(0, n_windows, body, acc0, unroll=False)
        a = jac_to_proj(
            lz, one_ext,
            tuple(to_ext(lz, cin, c) for c in (ax[:], ay[:], az[:])))
        lo = proj_add(lz, a, t)
        hi = proj_add(
            lz, a,
            (t[0], lazy_sub_tile(lz[2], jnp.zeros_like(t[1]), t[1]), t[2]))
        for refs, pt in (((lox, loy, loz), lo), ((hix, hiy, hiz), hi)):
            jx, jy, jz = proj_to_jac(lz, pt)
            refs[0][:] = from_ext(lz, cout, jx)
            refs[1][:] = from_ext(lz, cout, jy)
            refs[2][:] = from_ext(lz, cout, jz)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((n_windows, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    from ..field.pallas_kernels import _mxu_specs

    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(LL)] * 6
        + (_mxu_specs(LL) if mxu else []) + [bspec] * 6 + [dspec] * 2,
        out_specs=(bspec,) * 6,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(6)),
        scratch_shapes=[pltpu.VMEM((8, LL, block), U32) for _ in range(4)],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# canonical-layout wrappers
# ---------------------------------------------------------------------------

def _limbs16(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)],
                    dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def _const_tiles_np():
    """(mod, npr) canonical 24-limb tiles for the standalone kernels."""
    mod = np.broadcast_to(
        fp.SPEC.mod_limbs.astype(np.uint32)[:, None], (L, LANES)).copy()
    npr = np.broadcast_to(
        fp.SPEC.nprime_limbs.astype(np.uint32)[:, None], (L, LANES)).copy()
    return mod, npr


@functools.lru_cache(maxsize=None)
def _cst_np():
    """Lazy-domain constant tiles for the ladder kernels, one (LL, LANES)
    array each: modulus, -m^-1 mod R_ext, the two domain-shift constants,
    the ext-Montgomery one, and the ext-Montgomery GLV beta."""
    m = FP_MODULUS
    rows = [
        _limbs16(m, LL),
        _limbs16((-pow(m, -1, R_EXT)) % R_EXT, LL),
        _limbs16(pow(2, 16 * (2 * LL - L), m), LL),   # C_IN
        _limbs16(pow(2, 16 * L, m), LL),              # C_OUT
        _limbs16(R_EXT % m, LL),                      # one_ext
        _limbs16((GLV_BETA * R_EXT) % m, LL),         # beta_ext
    ]
    return tuple(
        np.broadcast_to(r[:, None], (LL, LANES)).copy() for r in rows)


def _consts():
    mod, npr = _const_tiles_np()
    return jnp.asarray(mod), jnp.asarray(npr)


def _cst():
    return tuple(jnp.asarray(r) for r in _cst_np())


def _block_for(B: int) -> int:
    return min(DEFAULT_BLOCK, B)


def _flatten_pts(p: JacobianPoint):
    shape = p.x.shape[:-1]
    n = 1
    for s in shape:
        n *= s
    return shape, tuple(c.reshape(n, L) for c in p)


def _to_lanes(x, B: int):
    xt = x.T
    if xt.shape[1] != B:
        xt = jnp.pad(xt, ((0, 0), (0, B - xt.shape[1])))
    return xt


def _lanes_to_pts(coords, n, shape):
    return JacobianPoint(*(c[:, :n].T.reshape(shape + (L,)) for c in coords))


@jax.jit
def add_pallas(p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
    """Complete Jacobian add, fused. Broadcasts batch shapes."""
    shape = jnp.broadcast_shapes(p.x.shape[:-1], q.x.shape[:-1])
    p = JacobianPoint(*(jnp.broadcast_to(c, shape + (L,)) for c in p))
    q = JacobianPoint(*(jnp.broadcast_to(c, shape + (L,)) for c in q))
    shape, pc = _flatten_pts(p)
    _, qc = _flatten_pts(q)
    n = pc[0].shape[0]
    block = _block_for(max(LANES, n))
    B = -(-n // block) * block
    mod, npr = _consts()
    out = _add_fn(B, block, _interpret())(
        mod, npr, *(_to_lanes(c, B) for c in pc),
        *(_to_lanes(c, B) for c in qc))
    return _lanes_to_pts(out, n, shape)


@jax.jit
def double_pallas(p: JacobianPoint) -> JacobianPoint:
    shape, pc = _flatten_pts(p)
    n = pc[0].shape[0]
    block = _block_for(max(LANES, n))
    B = -(-n // block) * block
    mod, npr = _consts()
    out = _double_fn(B, block, _interpret())(
        mod, npr, *(_to_lanes(c, B) for c in pc))
    return _lanes_to_pts(out, n, shape)


@jax.jit
def scalar_mul_pallas(p: JacobianPoint, digits) -> JacobianPoint:
    """p * sum_j digits[..., j] * 16^j with signed digits in [-8, 8]
    (LSB-first, e.g. fr.scalar_windows_signed output). Fully fused:
    table build + the whole ladder in one kernel."""
    shape = jnp.broadcast_shapes(p.x.shape[:-1], digits.shape[:-1])
    n_windows = digits.shape[-1]
    p = JacobianPoint(*(jnp.broadcast_to(c, shape + (L,)) for c in p))
    digits = jnp.broadcast_to(digits, shape + (n_windows,))
    shape, pc = _flatten_pts(p)
    dig = digits.reshape(-1, n_windows).astype(jnp.int32)
    n = pc[0].shape[0]
    block = _block_for(max(LANES, n))
    B = -(-n // block) * block
    digT = dig.T
    if digT.shape[1] != B:
        digT = jnp.pad(digT, ((0, 0), (0, B - digT.shape[1])))
    from ..field.pallas_kernels import _lazy_mxu_tiles

    mxu = _mxu_ladder_enabled()
    mxc = _lazy_mxu_tiles(fp.SPEC) if mxu else ()
    out = _scalar_mul_fn(B, block, n_windows, _interpret(), mxu)(
        *_cst()[:5], *mxc, *(_to_lanes(c, B) for c in pc), digT)
    return _lanes_to_pts(out, n, shape)


class PallasG1Ops:
    """CurveOps-shaped facade whose add/double are the fused kernels.

    Drop-in for the generic curve algorithms that take an `ops` object
    (MSM tree reduction, window accumulation — curve/msm.py): same
    NamedTuple point layout, same complete-add semantics, but one kernel
    launch per point op instead of ~16 field-op launches."""

    F = fp
    _edim = 1

    def infinity_like(self, p: JacobianPoint) -> JacobianPoint:
        zero = jnp.zeros_like(p.z)
        return JacobianPoint(zero, zero, zero)

    def is_infinity(self, p: JacobianPoint):
        return fp.is_zero(p.z)

    def add(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        return add_pallas(p, q)

    def double(self, p: JacobianPoint) -> JacobianPoint:
        return double_pallas(p)

    def neg(self, p: JacobianPoint) -> JacobianPoint:
        return JacobianPoint(p.x, fp.neg(p.y), p.z)

    def sub(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        return add_pallas(p, self.neg(q))

    def _select_point(self, mask, a, b):
        return JacobianPoint(
            fp.select(mask, a.x, b.x),
            fp.select(mask, a.y, b.y),
            fp.select(mask, a.z, b.z),
        )

    select = _select_point


ops_pallas = PallasG1Ops()


@jax.jit
def butterfly_glv_pallas(a: JacobianPoint, b: JacobianPoint, d1, d2):
    """FFT-G1 butterfly (a + tw*b, a - tw*b) with host-decomposed GLV
    digits: d1/d2 int32[N, n_windows] signed in [-8, 8], LSB-first, with
    tw = k1 + lambda*k2 per lane. Returns (lo, hi) JacobianPoints.

    Precondition: b in the r-torsion subgroup (phi(P) == lambda*P only
    holds there) — every KZG/FK20/eth input is; matches the reference's
    domain of validated points (bls/bls_kilic.go:122-130)."""
    n_windows = d1.shape[-1]
    shape, ac = _flatten_pts(a)
    _, bc = _flatten_pts(b)
    n = ac[0].shape[0]
    block = _block_for(max(LANES, n))
    B = -(-n // block) * block

    def dig_lanes(d):
        dT = d.reshape(-1, n_windows).astype(jnp.int32).T
        if dT.shape[1] != B:
            dT = jnp.pad(dT, ((0, 0), (0, B - dT.shape[1])))
        return dT

    from ..field.pallas_kernels import _lazy_mxu_tiles

    mxu = _mxu_ladder_enabled()
    mxc = _lazy_mxu_tiles(fp.SPEC) if mxu else ()
    out = _scalar_mul_glv_fn(B, block, n_windows, _interpret(), mxu)(
        *_cst(), *mxc, *(_to_lanes(c, B) for c in ac),
        *(_to_lanes(c, B) for c in bc), dig_lanes(d1), dig_lanes(d2))
    lo = _lanes_to_pts(out[:3], n, shape)
    hi = _lanes_to_pts(out[3:], n, shape)
    return lo, hi
