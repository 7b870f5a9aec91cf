"""Fused Pallas TPU kernels for field arithmetic (round-3 engine).

The XLA "vector" engine (limbs.py) is HBM-bound: each mont_mul builds a
(batch, L, L) outer product plus several padded reshape intermediates
that XLA materializes between fused regions — measured ~10x off the
VPU compute bound on the FFT pipeline. These kernels run the whole
product + REDC (+ optionally the FFT butterfly around it) on
VMEM-resident tiles, so per call the only HBM traffic is inputs/outputs.

Layout: limbs ride the SUBLANE axis, batch rides the 128-wide LANE axis
— a (L, B) tile. The library's canonical layout is (..., L); wrappers
transpose at the kernel boundary (one relayout per call instead of the
vector path's ~10 materialized intermediates).

All carry handling is fully static (two carry-save folds + a Kogge-Stone
carry lookahead along the limb axis), mirroring limbs.carry_fold — no
data-dependent while_loops (the round-1 pallas_mul.py kernel used
while_loops, which serialize on a full-tile reduction per step).

Reference parity: this is the TPU analogue of the reference's fastest
backend (kilic/bls12-381's x86-64 assembly field mul, used via
bls/bignum_kilic.go); selected at runtime by the backend registry
(field/backend.py), mirroring the reference's build-tag backend matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMB_BITS, LIMB_MASK, FieldSpec

U32 = jnp.uint32
LANES = 128
DEFAULT_BLOCK = 512  # lanes per grid step


# ---------------------------------------------------------------------------
# tile math: (K, W) uint32 arrays, limb axis 0 (sublanes), batch axis 1 (lanes)
# ---------------------------------------------------------------------------

def _pad0(x, lo: int, hi: int):
    """Pad only axis 0 (limb axis), any rank."""
    return jnp.pad(x, ((lo, hi),) + ((0, 0),) * (x.ndim - 1))


def _shift_up(x, d: int):
    """Rows move d positions toward higher limb index; top rows drop."""
    if d >= x.shape[0]:
        return jnp.zeros_like(x)
    return _pad0(x, d, 0)[: x.shape[0]]


def _carry_fold(cols):
    """Redundant columns (rows < 2^32 each) -> canonical limbs (< 2^16),
    mod 2^(16*rows). Static: 2 carry-save folds + Kogge-Stone lookahead."""
    v = (cols & LIMB_MASK) + _shift_up(cols >> LIMB_BITS, 1)
    v = (v & LIMB_MASK) + _shift_up(v >> LIMB_BITS, 1)
    g = v >> LIMB_BITS                      # {0,1}: generates a carry
    p = (v == LIMB_MASK).astype(U32)        # saturated: propagates
    d = 1
    while d < v.shape[0]:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    return (v + _shift_up(g, 1)) & LIMB_MASK


def _geq(a, b):
    """Canonical-limb compare a >= b along axis 0 -> bool[W]."""
    L = a.shape[0]
    greater = jnp.zeros(a.shape[1:], dtype=jnp.bool_)
    equal = jnp.ones(a.shape[1:], dtype=jnp.bool_)
    for i in range(L - 1, -1, -1):
        greater = greater | (equal & (a[i] > b[i]))
        equal = equal & (a[i] == b[i])
    return greater | equal


def _add_one_row0(cols, inc):
    """cols[0] += inc (uint32[W] in {0,1}) without a scatter."""
    pad = jnp.zeros((cols.shape[0] - 1,) + cols.shape[1:], dtype=U32)
    return cols + jnp.concatenate([inc[None], pad], axis=0)


def _product_cols(a, b, out_limbs: int):
    """Column sums of the full product; a, b: (L, W) canonical limbs.

    Returns (out_limbs, W) with column k = sum_{i+j=k} a_i*b_j in
    carry-save lo/hi halves; each column accumulates <= 2L values < 2^16
    so entries stay < 2^21. Static slice-adds only."""
    L = a.shape[0]
    acc = jnp.zeros((out_limbs,) + a.shape[1:], dtype=U32)
    for i in range(L):
        p = a[i][None] * b  # (L, ...), exact in uint32
        # pad-and-add accumulation (`.at[slice].add` would lower to a
        # scatter, which Pallas rejects / Mosaic handles poorly)
        lo_n = min(L, out_limbs - i)
        if lo_n > 0:
            acc = acc + _pad0(p[:lo_n] & LIMB_MASK, i, out_limbs - i - lo_n)
        hi_n = min(L, out_limbs - i - 1)
        if hi_n > 0:
            acc = acc + _pad0(
                p[:hi_n] >> LIMB_BITS, i + 1, out_limbs - i - 1 - hi_n)
    return acc


def _cond_sub_mod(mod, x):
    """x < 2m canonical -> x mod m (complement addition, overflow drops)."""
    need = _geq(x, jnp.broadcast_to(mod, x.shape))
    mnot = LIMB_MASK - mod
    cols = x + jnp.where(need[None, :], mnot, jnp.zeros_like(mnot))
    return _carry_fold(_add_one_row0(cols, need.astype(U32)))


def mont_sqr_tile(mod, nprime, a):
    """REDC(a*a) on (L, W) tiles.

    Measured on-chip (scripts/exp_pointops.py): the symmetric-product
    "fast path" (_sqr_cols — half the multiplies, but 24 irregular pad
    shapes) generates far WORSE Mosaic code than the regular product
    loop — a 5-squaring point doubling ran 3x slower through it. On the
    VPU, regular code beats fewer-but-irregular ops; squaring is just a
    multiply."""
    return mont_mul_tile(mod, nprime, a, a)


def mont_mul_tile(mod, nprime, a, b):
    """REDC(a*b) on (L, W) tiles — the kernel-side hot op.

    mod / nprime: (L, W)-broadcastable canonical limb tiles of the
    modulus and -m^-1 mod R (passed as kernel operands: Pallas kernels
    cannot capture array constants)."""
    L = a.shape[0]
    modb = jnp.broadcast_to(mod, a.shape)
    nprimeb = jnp.broadcast_to(nprime, a.shape)

    t = _carry_fold(_product_cols(a, b, 2 * L))
    q = _carry_fold(_product_cols(t[:L], nprimeb, L))
    qm = _carry_fold(_product_cols(q, modb, 2 * L))
    s = _carry_fold(t + qm)  # divisible by R; low L limbs are zero
    return _cond_sub_mod(mod, s[L:])


# ---------------------------------------------------------------------------
# lazy-reduction tile ops (the ladder-kernel fast path)
#
# Measured on-chip (scripts/exp_addsub.py): a mod_add/mod_sub costs
# ~1/7 of a mont_mul, almost all of it the _geq + conditional-subtract
# chain (a 24-step serial compare on thin (W,) rows) — and every
# mont_mul ends with one more. Point formulas do ~27 add/subs and 12
# muls per op, so canonical reduction is ~30% of point-op time and the
# dominant *serial-depth* contributor.
#
# These ops drop reduction entirely by working in an EXTENDED Montgomery
# domain with headroom limbs: tiles carry LL = L + ext rows (R_ext =
# 2^(16*LL)), values are kept carry-folded (16-bit rows) but allowed to
# float in [0, ~2^19 * m):
#
#   lazy_mul:  plain REDC_ext with NO trailing conditional subtract —
#              for inputs < c*m with c^2*m < R_ext the output is < ~1.01m
#              (BLS12-381 Fp at LL=25: R_ext/m ~ 2^19, so c <= ~700)
#   lazy_add:  carry_fold(a + b) — bound grows, nothing reduced
#   lazy_sub:  a + (K*m - b) via complement addition against a fixed
#              multiple of the modulus — NO compare; K*m must bound b
#
# Domain conversion (values enter/leave in the library's R = 2^(16*L)
# Montgomery form): to-ext multiplies by 2^(16*ext) (one lazy_mul by
# C_IN = 2^(16*(2*LL-L)) mod m), from-ext divides by it (one lazy_mul by
# C_OUT = 2^(16*L) mod m) followed by one canonical cond-subtract.
# Callers pass the extended-domain constants (mod/nprime/C in LL rows);
# see curve/pallas_g1.py for the Fp instance and the bound audit.
# ---------------------------------------------------------------------------

def lazy_mul_tile(modx, nprx, a, b):
    """REDC over R_ext = 2^(16*LL) without the final conditional
    subtract. a, b: (LL, W) carry-folded tiles with a*b < R_ext*m;
    output < m*(a*b/(R_ext*m) + 1) — i.e. just above m, never >= 2m."""
    LL = a.shape[0]
    modb = jnp.broadcast_to(modx, a.shape)
    nprb = jnp.broadcast_to(nprx, a.shape)
    t = _carry_fold(_product_cols(a, b, 2 * LL))
    q = _carry_fold(_product_cols(t[:LL], nprb, LL))
    qm = _carry_fold(_product_cols(q, modb, 2 * LL))
    s = _carry_fold(t + qm)
    return s[LL:]


# ---------------------------------------------------------------------------
# MXU-assisted REDC (round-5, scripts/exp_mxu_mul.py)
#
# Of REDC's three product passes, two are by GLOBAL constants (t_lo * n'
# and q * m) — and a by-constant limb product is a small matmul: split
# the variable operand's 16-bit limb rows into lo/hi byte planes (pure
# elementwise), multiply by the constant's byte-plane Toeplitz matrices
# on the MXU (bf16 x bf16 -> f32 is EXACT here: entries < 2^8, products
# < 2^16, column sums < 25*2^16 < 2^21 < 2^24), recombine with shifts.
# Bit-identical to the VPU product loop by construction; measured
# 1.10-1.36x on the full mont-mul kernel (W = 16k..131k lanes) with the
# dots overlapping the VPU passes.
# ---------------------------------------------------------------------------


def toeplitz16_bytes(c: int, in_limbs: int, out_limbs: int):
    """Byte planes of the 16-bit-limb Toeplitz matrix of constant c:
    (T_lo, T_hi) float32 (out_limbs, in_limbs), T_lo[k, i] =
    c16[k-i] & 0xFF, T_hi[k, i] = c16[k-i] >> 8. For x with byte planes
    ev = x & 0xFF, od = x >> 8:
        x*c cols = T_lo@ev + ((T_hi@ev + T_lo@od) << 8)
                   + shift_up(T_hi@od, 1)   (all exact, < 2^30)."""
    c16 = [(c >> (16 * j)) & 0xFFFF for j in range(out_limbs)]
    lo = np.zeros((out_limbs, in_limbs), dtype=np.float32)
    hi = np.zeros((out_limbs, in_limbs), dtype=np.float32)
    for k in range(out_limbs):
        for i in range(in_limbs):
            j = k - i
            if 0 <= j < out_limbs:
                lo[k, i] = c16[j] & 0xFF
                hi[k, i] = c16[j] >> 8
    return lo, hi


def mxu_const_cols(tlo, thi, x16):
    """In-kernel by-constant product via 4 byte-plane MXU dots.
    tlo/thi: (out, L_in) bf16 refsliced tiles; x16: (L_in, W) canonical
    16-bit rows. Returns (out, W) uint32 redundant columns (< 2^30)."""

    def bf(v):
        return v.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    ev = bf(x16 & 0xFF)
    od = bf(x16 >> 8)

    def dot(t, d):
        r = jax.lax.dot_general(
            t, d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return r.astype(jnp.int32).astype(jnp.uint32)

    a = dot(tlo, ev)
    b = dot(thi, ev) + dot(tlo, od)
    d = dot(thi, od)
    return a + (b << 8) + _shift_up(d, 1)


def lazy_mul_tile_mxu(modx, nprx, mxc, a, b):
    """lazy_mul_tile with the two by-constant REDC passes on the MXU.
    mxc = (np_lo, np_hi, m_lo, m_hi) in-kernel matrix tiles
    (np: (LL, LL), m: (2LL, LL)). Bit-identical to lazy_mul_tile."""
    LL = a.shape[0]
    np_lo, np_hi, m_lo, m_hi = mxc
    t = _carry_fold(_product_cols(a, b, 2 * LL))
    q = _carry_fold(mxu_const_cols(np_lo, np_hi, t[:LL]))
    qm = _carry_fold(mxu_const_cols(m_lo, m_hi, q))
    s = _carry_fold(t + qm)
    return s[LL:]


def lazy_add_tile(a, b):
    """a + b with carry folding only — the bound is the caller's to track."""
    return _carry_fold(a + b)


def lazy_sub_tile(km, a, b):
    """a - b + K*m (km = K*m as a carry-folded (LL, W) tile, K*m > b).

    Complement addition: a + km + (~b) + 1 mod 2^(16*LL) — exact as an
    integer because 0 <= a + km - b < 2^(16*LL). No compare chain."""
    cols = a + km + (LIMB_MASK - b)
    return _carry_fold(_add_one_row0(cols, jnp.ones(a.shape[1:], dtype=U32)))


def lazy_canon_tile(modx, x):
    """Value < 2m (e.g. fresh lazy_mul output) -> canonical [0, m)."""
    return _cond_sub_mod(jnp.broadcast_to(modx, x.shape), x)


def mod_add_tile(mod, a, b):
    return _cond_sub_mod(mod, _carry_fold(a + b))


def mod_sub_tile(mod, a, b):
    lt = ~_geq(a, b)
    cols = a + (LIMB_MASK - b) + jnp.where(
        lt[None, :], jnp.broadcast_to(mod, a.shape), jnp.zeros_like(a))
    cols = _add_one_row0(cols, jnp.ones(a.shape[1:], dtype=U32))
    return _carry_fold(cols)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _const_tiles_np(spec: FieldSpec):
    """(mod, nprime) as host (L, LANES) tiles. Host-side cache only —
    caching device arrays here would capture tracers when first called
    inside a jit trace (lru_cache + jnp.asarray is a tracer leak)."""
    mod = np.broadcast_to(
        spec.mod_limbs.astype(np.uint32)[:, None],
        (spec.n_limbs, LANES)).copy()
    npr = np.broadcast_to(
        spec.nprime_limbs.astype(np.uint32)[:, None],
        (spec.n_limbs, LANES)).copy()
    return mod, npr


def _const_tiles(spec: FieldSpec):
    mod, npr = _const_tiles_np(spec)
    return jnp.asarray(mod), jnp.asarray(npr)


def _const_spec(L: int):
    return pl.BlockSpec((L, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _mul_fn(spec: FieldSpec, B: int, block: int, interpret: bool):
    L = spec.n_limbs

    def kernel(mod_ref, npr_ref, a_ref, b_ref, out_ref):
        mod = mod_ref[:, :1]
        out_ref[:] = mont_mul_tile(mod, npr_ref[:, :1], a_ref[:], b_ref[:])

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(L), _const_spec(L), bspec, bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((L, B), U32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _butterfly_fn(spec: FieldSpec, B: int, block: int, interpret: bool):
    """(a, b, tw) -> (a + b*tw, a - b*tw): one fused FFT butterfly stage."""
    L = spec.n_limbs

    def kernel(mod_ref, npr_ref, a_ref, b_ref, tw_ref, outa_ref, outb_ref):
        mod = mod_ref[:, :1]
        a = a_ref[:]
        t = mont_mul_tile(mod, npr_ref[:, :1], b_ref[:], tw_ref[:])
        outa_ref[:] = mod_add_tile(mod, a, t)
        outb_ref[:] = mod_sub_tile(mod, a, t)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(L), _const_spec(L), bspec, bspec, bspec],
        out_specs=(bspec, bspec),
        out_shape=(jax.ShapeDtypeStruct((L, B), U32),
                   jax.ShapeDtypeStruct((L, B), U32)),
        interpret=interpret,
    )


def _interpret() -> bool:
    # off-TPU the kernels run in the Pallas interpreter (differential
    # testing on CPU); on TPU they compile through Mosaic
    return jax.default_backend() != "tpu"


def _to_lanes(spec: FieldSpec, x, B: int):
    """(N, L) canonical layout -> (L, B) lane layout, zero-padded."""
    xt = x.T  # (L, N)
    if xt.shape[1] != B:
        xt = jnp.pad(xt, ((0, 0), (0, B - xt.shape[1])))
    return xt


def _block_for(B: int) -> int:
    return min(DEFAULT_BLOCK, B)


def mont_mul_pallas(spec: FieldSpec, a, b):
    """Drop-in mont_mul for uint32[..., L] Montgomery limbs (broadcasts)."""
    L = spec.n_limbs
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (L,)).reshape(-1, L)
    b = jnp.broadcast_to(b, shape + (L,)).reshape(-1, L)
    N = a.shape[0]
    block = _block_for(max(LANES, N))
    B = -(-N // block) * block
    mod, npr = _const_tiles(spec)
    out = _mul_fn(spec, B, block, _interpret())(
        mod, npr, _to_lanes(spec, a, B), _to_lanes(spec, b, B))
    return out[:, :N].T.reshape(shape + (L,))


def butterfly_pallas(spec: FieldSpec, a, b, tw):
    """Fused butterfly (a + tw*b, a - tw*b) for uint32[..., L] operands.

    tw broadcasts against a/b's batch shape. Returns (sum, diff)."""
    L = spec.n_limbs
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1], tw.shape[:-1])
    a = jnp.broadcast_to(a, shape + (L,)).reshape(-1, L)
    b = jnp.broadcast_to(b, shape + (L,)).reshape(-1, L)
    tw = jnp.broadcast_to(tw, shape + (L,)).reshape(-1, L)
    N = a.shape[0]
    block = _block_for(max(LANES, N))
    B = -(-N // block) * block
    mod, npr = _const_tiles(spec)
    outa, outb = _butterfly_fn(spec, B, block, _interpret())(
        mod, npr, _to_lanes(spec, a, B), _to_lanes(spec, b, B),
        _to_lanes(spec, tw, B))
    return (outa[:, :N].T.reshape(shape + (L,)),
            outb[:, :N].T.reshape(shape + (L,)))


# ---------------------------------------------------------------------------
# lazy FFT-stage kernels over Fr (the headline pipeline)
#
# The radix-2 stage loop in ntt/fft_fr.py runs each butterfly stage as
# one of these kernels with the WHOLE array kept in lane layout and in
# the LL = L+1-limb lazy domain between stages: no transposes and no
# canonical reductions anywhere inside the pipeline.
#
# Domain trick: the FFT is linear, so the uniform factor introduced by
# reinterpreting stored R-form values (a*2^(16L)) as R_ext-form values
# (of a*2^-16) commutes with the whole transform — entering the lazy
# domain is a PAD, not a multiply. Twiddles are host-encoded directly in
# R_ext form, and the single exit multiply (by R_ext mod r, or by
# inv_n * R_ext mod r for the inverse transform — the 1/n scale rides
# along for free) restores values and canonicalizes.
#
# Bounds (r = Fr modulus, LL = 17, R_ext = 2^272, R_ext/r ~ 2^17):
# stage outputs grow by < 3r per stage (hi = a + t with t < 1.01r fresh
# from lazy_mul; lo = a - t + 2r), so after 15 stages values stay
# < ~50r ~ 2^260.6 << 2^272, and every product (a < 50r) * (tw < r)
# satisfies the REDC input bound 50r < R_ext.
# ---------------------------------------------------------------------------

def _mxu_enabled() -> bool:
    """MXU-assisted REDC in the lazy FFT kernels (KZG_TPU_MXU=0 to
    disable; bit-identical either way, see lazy_mul_tile_mxu)."""
    import os

    return os.environ.get("KZG_TPU_MXU", "1") != "0"


@functools.lru_cache(maxsize=None)
def _lazy_mxu_tiles_np(spec: FieldSpec):
    """(np_lo, np_hi, m_lo, m_hi) byte-plane Toeplitz matrices for the
    LL-limb lazy domain, host float32 (cast to bf16 at the wrapper)."""
    LL = spec.n_limbs + 1
    r_ext = 1 << (16 * LL)
    m = spec.modulus
    nprime = (-pow(m, -1, r_ext)) % r_ext
    np_lo, np_hi = toeplitz16_bytes(nprime, LL, LL)
    m_lo, m_hi = toeplitz16_bytes(m, LL, 2 * LL)
    return np_lo, np_hi, m_lo, m_hi


def _lazy_mxu_tiles(spec: FieldSpec):
    return tuple(
        jnp.asarray(t).astype(jnp.bfloat16)
        for t in _lazy_mxu_tiles_np(spec))


@functools.lru_cache(maxsize=None)
def _lazy_const_tiles_np(spec: FieldSpec):
    """(modx, nprx, km2) host tiles at LL = n_limbs+1 rows: the modulus,
    -m^-1 mod R_ext, and 2*m (the lazy_sub offset for subtrahends that
    are fresh lazy_mul outputs)."""
    LL = spec.n_limbs + 1
    r_ext = 1 << (16 * LL)
    m = spec.modulus

    def limbs(v):
        arr = np.array([(v >> (16 * i)) & 0xFFFF for i in range(LL)],
                       dtype=np.uint32)
        return np.broadcast_to(arr[:, None], (LL, LANES)).copy()

    return (limbs(m), limbs((-pow(m, -1, r_ext)) % r_ext), limbs(2 * m))


def encode_ext(spec: FieldSpec, ints) -> np.ndarray:
    """R_ext-Montgomery-form limbs (..., LL) of python ints (host)."""
    LL = spec.n_limbs + 1
    r_ext = 1 << (16 * LL)
    m = spec.modulus
    single = not isinstance(ints, (list, tuple))
    vals = [ints] if single else list(ints)
    out = np.zeros((len(vals), LL), dtype=np.uint32)
    for j, v in enumerate(vals):
        ve = (int(v) * r_ext) % m
        for i in range(LL):
            out[j, i] = (ve >> (16 * i)) & 0xFFFF
    return out[0] if single else out


def _mxu_specs(LL: int):
    """Block specs for the four byte-plane matrix operands."""

    def full(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return [full(LL, LL), full(LL, LL), full(2 * LL, LL), full(2 * LL, LL)]


@functools.lru_cache(maxsize=None)
def _butterfly_lazy_fn(spec: FieldSpec, first: bool, B: int, block: int,
                       interpret: bool, mxu: bool):
    """One lazy FFT stage on lane-layout tiles:
    (a, b, tw) -> (a + b*tw, a - b*tw), all (LL, B) lazy values.
    first=True takes canonical (L, B) inputs (pad = domain entry) and
    has NO twiddle operand: stage 1's twiddle is always 1, so the stage
    is a mul-free add/sub. mxu=True routes the twiddle REDC's constant
    passes over the matrix unit (bit-identical)."""
    L = spec.n_limbs
    LL = L + 1
    use_mxu = mxu and not first

    def kernel(mod_ref, npr_ref, km_ref, *refs):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]
        km = km_ref[:, :1]
        if use_mxu:
            mxc = tuple(r[:] for r in refs[:4])
            refs = refs[4:]
        if first:
            a_ref, b_ref, hi_ref, lo_ref = refs
            a = jnp.pad(a_ref[:], ((0, 1), (0, 0)))
            t = jnp.pad(b_ref[:], ((0, 1), (0, 0)))
        else:
            a_ref, b_ref, tw_ref, hi_ref, lo_ref = refs
            a = a_ref[:]
            if use_mxu:
                t = lazy_mul_tile_mxu(mod, npr, mxc, b_ref[:], tw_ref[:])
            else:
                t = lazy_mul_tile(mod, npr, b_ref[:], tw_ref[:])
        hi_ref[:] = lazy_add_tile(a, t)
        lo_ref[:] = lazy_sub_tile(km, a, t)

    in_rows = L if first else LL
    bspec_in = pl.BlockSpec((in_rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    bspec_ext = pl.BlockSpec((LL, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    n_in = 2 if first else 3
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(LL)] * 3
        + (_mxu_specs(LL) if use_mxu else [])
        + [bspec_in] * 2 + [bspec_ext] * (n_in - 2),
        out_specs=(bspec_ext, bspec_ext),
        out_shape=(jax.ShapeDtypeStruct((LL, B), U32),
                   jax.ShapeDtypeStruct((LL, B), U32)),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _butterfly_lazy_dif_fn(spec: FieldSpec, first: bool, B: int,
                           block: int, interpret: bool, mxu: bool,
                           reduce_hi: bool):
    """One DIF-form lazy stage: (a, b, tw) -> (a + b, (a - b) * tw) —
    the das-extension recursion's butterfly (das_extension.go:27-43).
    first=True takes canonical (L, B) inputs (pad = domain entry).
    reduce_hi=True folds the unmultiplied hi branch back under ~2m with
    one extra lazy mul by ONE_ext — issued every few stages so pure-add
    chains cannot outgrow the R_ext headroom (hi doubles per stage;
    the lo branch is freshly REDC'd every stage)."""
    L = spec.n_limbs
    LL = L + 1

    def kernel(mod_ref, npr_ref, km_ref, one_ref, *refs):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]
        one = one_ref[:, :1]
        # subtrahend b is an UNREDUCED down-sweep chain (up to ~2^6 * 3m
        # between reduce_hi levels); widen the 2m operand offset to
        # 256m by in-kernel doubling so lazy_sub cannot underflow
        # (a + 256m - b stays < ~500m << R_ext)
        km = km_ref[:, :1]
        for _ in range(7):
            km = lazy_add_tile(km, km)
        if mxu:
            mxc = tuple(r[:] for r in refs[:4])
            refs = refs[4:]
        a_ref, b_ref, tw_ref, hi_ref, lo_ref = refs
        if first:
            a = jnp.pad(a_ref[:], ((0, 1), (0, 0)))
            b = jnp.pad(b_ref[:], ((0, 1), (0, 0)))
        else:
            a = a_ref[:]
            b = b_ref[:]

        def lmul(x, y):
            if mxu:
                return lazy_mul_tile_mxu(mod, npr, mxc, x, y)
            return lazy_mul_tile(mod, npr, x, y)

        d = lazy_sub_tile(km, a, b)
        lo_ref[:] = lmul(d, jnp.broadcast_to(tw_ref[:], d.shape))
        hi = lazy_add_tile(a, b)
        if reduce_hi:
            hi = lmul(hi, jnp.broadcast_to(one, hi.shape))
        hi_ref[:] = hi

    in_rows = L if first else LL
    bspec_in = pl.BlockSpec((in_rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    bspec_ext = pl.BlockSpec((LL, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(LL)] * 4
        + (_mxu_specs(LL) if mxu else [])
        + [bspec_in] * 2 + [bspec_ext],
        out_specs=(bspec_ext, bspec_ext),
        out_shape=(jax.ShapeDtypeStruct((LL, B), U32),
                   jax.ShapeDtypeStruct((LL, B), U32)),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _one_ext_tile_np(spec: FieldSpec):
    LL = spec.n_limbs + 1
    r_ext = 1 << (16 * LL)
    v = r_ext % spec.modulus
    arr = np.array([(v >> (16 * i)) & 0xFFFF for i in range(LL)],
                   dtype=np.uint32)
    return np.broadcast_to(arr[:, None], (LL, LANES)).copy()


def butterfly_lazy_dif(spec: FieldSpec, a, b, tw, first: bool,
                       reduce_hi: bool):
    """DIF lazy butterfly (hi = a + b, lo = (a - b) * tw), lane layout.
    a, b: (L|LL, B); tw: (LL, B) R_ext-form twiddles."""
    B = a.shape[1]
    block = _pow2_block(B)
    modx, nprx, km2 = _lazy_consts(spec)
    onex = jnp.asarray(_one_ext_tile_np(spec))
    mxu = _mxu_enabled()
    fn = _butterfly_lazy_dif_fn(spec, first, B, block, _interpret(), mxu,
                                reduce_hi)
    mxc = _lazy_mxu_tiles(spec) if mxu else ()
    return fn(modx, nprx, km2, onex, *mxc, a, b, tw)


@functools.lru_cache(maxsize=None)
def _canon_scale_fn(spec: FieldSpec, B: int, block: int, interpret: bool,
                    mxu: bool):
    """Exit kernel: x (LL, B) lazy * c (LL-row R_ext-form constant) ->
    canonical (L, B). c = R_ext mod r restores values unchanged; any
    extra factor (e.g. 1/n) is pre-multiplied into c on the host."""
    L = spec.n_limbs
    LL = L + 1

    def kernel(mod_ref, npr_ref, *refs):
        mod = mod_ref[:, :1]
        if mxu:
            mxc = tuple(r[:] for r in refs[:4])
            c_ref, x_ref, out_ref = refs[4:]
        else:
            c_ref, x_ref, out_ref = refs
        x = x_ref[:]
        c = jnp.broadcast_to(c_ref[:, :1], x.shape)
        if mxu:
            prod = lazy_mul_tile_mxu(mod, npr_ref[:, :1], mxc, x, c)
        else:
            prod = lazy_mul_tile(mod, npr_ref[:, :1], x, c)
        out_ref[:] = lazy_canon_tile(mod, prod)[:L]

    bspec_ext = pl.BlockSpec((LL, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    bspec_out = pl.BlockSpec((L, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(LL)] * 2
        + (_mxu_specs(LL) if mxu else [])
        + [pl.BlockSpec((LL, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)]
        + [bspec_ext],
        out_specs=bspec_out,
        out_shape=jax.ShapeDtypeStruct((L, B), U32),
        interpret=interpret,
    )


def _lazy_consts(spec: FieldSpec):
    modx, nprx, km2 = _lazy_const_tiles_np(spec)
    return jnp.asarray(modx), jnp.asarray(nprx), jnp.asarray(km2)


def _pow2_block(B: int) -> int:
    """Largest power-of-two divisor of B, capped at DEFAULT_BLOCK."""
    return min(DEFAULT_BLOCK, B & -B)


def butterfly_lazy(spec: FieldSpec, a, b, tw, first: bool):
    """Lane-layout lazy butterfly: a, b (L|LL, B); tw (LL, B) in R_ext
    form (None when first — stage 1 is mul-free). Returns (hi, lo) as
    (LL, B) lazy values."""
    B = a.shape[1]
    block = _pow2_block(B)
    modx, nprx, km2 = _lazy_consts(spec)
    mxu = _mxu_enabled() and not first
    fn = _butterfly_lazy_fn(spec, first, B, block, _interpret(), mxu)
    mxc = _lazy_mxu_tiles(spec) if mxu else ()
    if first:
        return fn(modx, nprx, km2, a, b)
    return fn(modx, nprx, km2, *mxc, a, b, tw)


def canon_scale(spec: FieldSpec, x, c):
    """Exit the lazy pipeline: x (LL, B) -> canonical (L, B), scaled by
    the R_ext-form constant c (LL, LANES)-broadcastable."""
    B = x.shape[1]
    block = _pow2_block(B)
    modx, nprx, _ = _lazy_consts(spec)
    mxu = _mxu_enabled()
    mxc = _lazy_mxu_tiles(spec) if mxu else ()
    return _canon_scale_fn(spec, B, block, _interpret(), mxu)(
        modx, nprx, *mxc, c, x)
