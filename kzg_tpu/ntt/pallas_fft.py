"""Four-step fused Fr FFT: the whole transform in TWO Pallas kernels.

The per-stage pipeline (fft_fr._fft_core_pallas) still pays one kernel
dispatch plus a full HBM round-trip of the array per stage. This module
restructures the length-n transform as a four-step n1 x n2 decomposition
(reference algorithm: the same radix-2 DIT math as fft_fr.go:30-53, just
blocked), with every butterfly stage slicing the SUBLANE axis so no
intra-lane shuffles ever occur:

    x[(i1, i2)]                                  (n1, n2) view, i2 on lanes
    Y[k1, i2] = FFT_n1 over i1   (kernel A: log2(n1) stages, in-VMEM)
    Z = Y * T, T[k1, i2] = w^(i2*k1)             (fused into kernel A)
    Zt = transpose -> (n2, n1), brp along n2     (XLA glue)
    W[k2, k1] = FFT_n2 over i2   (kernel B: log2(n2) stages + exit canon)
    X[k1 + n1*k2] = W[k2, k1] -> natural output is W flattened (no
    final transpose: k = k1 + n1*k2 is exactly k2-major order)

Layout inside the kernels: rank-3 (LL, rows, lanes) with the LIMB axis
OUTERMOST (untiled — limb shifts in the carry arithmetic become free
buffer reindexing instead of sublane shifts) and the batched FFT axis on
sublanes. Both kernels stream lane slabs through a 1-D grid, all values
in the 17-limb lazy domain (see field/pallas_kernels.py): the only
canonical reductions in the whole transform are in the exit kernel,
which also restores the Montgomery domain and carries the inverse
transform's 1/n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fr
from ..field.pallas_kernels import (
    LANES,
    U32,
    _interpret,
    _pad0,
    encode_ext,
    lazy_add_tile,
    lazy_canon_tile,
    lazy_mul_tile,
    lazy_sub_tile,
    _lazy_const_tiles_np,
)
from .bitrev import brp_permute

L = fr.SPEC.n_limbs        # 16
LL = L + 1                 # 17
LANE_BLOCK = 128


def _split(n: int):
    """n = n1 * n2 with n2 <= n1, both powers of two, n2 <= 128."""
    logn = n.bit_length() - 1
    log2_n2 = min(logn // 2, 7)
    n2 = 1 << log2_n2
    return n // n2, n2


@functools.lru_cache(maxsize=None)
def _tables(max_scale: int, n: int, inverse: bool):
    """Host tables (all R_ext form):
    inner stage twiddles (per stage, (LL, half)), the T twist table
    (LL, n1, n2), outer stage twiddles, and the exit constant tile."""
    from .domain import FFTSettings

    r = fr.SPEC.modulus
    roots_int = FFTSettings(max_scale).roots_of_unity_int()
    max_width = 1 << max_scale
    roots = tuple(reversed(roots_int)) if inverse else roots_int
    w = roots[max_width // n]  # primitive n-th root (or its inverse)
    n1, n2 = _split(n)

    def stage_tws(sub_n, w_sub):
        logm = sub_n.bit_length() - 1
        out = []
        for s in range(2, logm + 1):  # stage 1 twiddle is 1: mul-free
            m = 1 << s
            half = m >> 1
            tws = [pow(w_sub, j * (sub_n // m), r) for j in range(half)]
            out.append(encode_ext(fr.SPEC, tws).T.copy())  # (LL, half)
        return tuple(out)

    w1 = pow(w, n2, r)   # n1-point domain root
    w2 = pow(w, n1, r)   # n2-point domain root
    inner = stage_tws(n1, w1)
    outer = stage_tws(n2, w2)

    # T[k1, i2] = w^(i2*k1), laid out (LL, n1, n2)
    t = np.zeros((n1, n2), dtype=object)
    for k1 in range(n1):
        wk = pow(w, k1, r)
        v = 1
        for i2 in range(n2):
            t[k1, i2] = v
            v = v * wk % r
    t_ext = encode_ext(fr.SPEC, list(t.reshape(-1)))   # (n1*n2, LL)
    t_ext = np.moveaxis(
        t_ext.reshape(n1, n2, LL), -1, 0)              # (LL, n1, n2)
    # kernel B applies the twist AFTER the transpose and the i2
    # bit-reversal, so store T as (LL, n2, n1) with i2 rows bit-reversed
    t_ext = np.swapaxes(t_ext, 1, 2)
    logn2 = n2.bit_length() - 1
    rev = [int(format(i, f"0{logn2}b")[::-1], 2) if logn2 else 0
           for i in range(n2)]
    t_ext = t_ext[:, rev, :].copy()                    # (LL, n2, n1)

    scale = pow(n, -1, r) if inverse else 1
    c_tile = np.broadcast_to(
        encode_ext(fr.SPEC, scale)[:, None], (LL, LANES)).copy()
    return inner, t_ext, outer, c_tile


def _cvec4(v):
    """(LL, lb) constant tile -> (LL, 1, 1, lb): Mosaic cannot broadcast
    a (1, 1) tile into both sublanes and lanes at once, so constants
    must already span the lane axis and broadcast only along
    sublanes/outer dims."""
    return v[:, None, None, :]


def _cvec3(v):
    return v[:, None, :]


def _axis_fft_stages(x, stage_tw_refs, km):
    """In-kernel radix-2 DIT stages along axis 1 of (LL, rows, LB),
    input bit-reversal done by the caller. stage_tw_refs: refs of
    (LL, half) per stage >= 2 (stage 1 is mul-free)."""
    rows = x.shape[1]
    logm = rows.bit_length() - 1
    modx4 = _cvec4(km[0])
    nprx4 = _cvec4(km[1])
    km2_4 = _cvec4(km[2])
    for s in range(1, logm + 1):
        m = 1 << s
        half = m >> 1
        xs = x.reshape(LL, rows // m, m, x.shape[-1])
        a = xs[:, :, :half, :]
        b = xs[:, :, half:, :]
        if s == 1:
            t = b
        else:
            tw = stage_tw_refs[s - 2][:]                # (LL, half)
            t = lazy_mul_tile(
                modx4, nprx4, b,
                jnp.broadcast_to(tw[:, None, :, None], b.shape))
        hi = lazy_add_tile(a, t)
        lo = lazy_sub_tile(km2_4, a, t)
        x = jnp.concatenate([hi, lo], axis=2).reshape(
            LL, rows, x.shape[-1])
    return x


def _km_tuple(mod_ref, npr_ref, km_ref, lb: int):
    """(LL, lb) constant tiles from the const refs (lane extent baked in
    so every later broadcast is sublane-only)."""
    return (mod_ref[:, :lb], npr_ref[:, :lb], km_ref[:, :lb])


def _lane_block(n_rows: int, lanes: int) -> int:
    """Lanes per grid step, bounded so a slab (rows x lanes) stays
    within the VMEM temporary budget (the REDC intermediates are ~6x
    the slab)."""
    lb = min(LANE_BLOCK, lanes)
    while n_rows * lb > 16384 and lb > 32:
        lb //= 2
    return lb


@functools.lru_cache(maxsize=None)
def _inner_fn(n1: int, n2: int, n_tw: int, interpret: bool):
    """Kernel A: canonical (L, n1, LB) lane slab -> log2(n1) lazy DIT
    stages along axis 1, then the T twist multiply. Output lazy
    (LL, n1, LB)."""

    def kernel(mod_ref, npr_ref, km_ref, x_ref, *rest):
        tw_refs = rest[:n_tw]
        out_ref = rest[n_tw]
        km = _km_tuple(mod_ref, npr_ref, km_ref, n2)
        x = _pad0(x_ref[:], 0, LL - L)
        out_ref[:] = _axis_fft_stages(x, tw_refs, km)

    # the lane dim is n2 <= 128, so the whole array is one block
    xspec = pl.BlockSpec((L, n1, n2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((LL, n1, n2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((LL, LANES), lambda: (0, 0),
                         memory_space=pltpu.VMEM)
    tw_specs = []
    for s in range(2, n1.bit_length()):
        half = 1 << (s - 1)
        tw_specs.append(
            pl.BlockSpec((LL, half), lambda: (0, 0),
                         memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        in_specs=[cspec] * 3 + [xspec] + tw_specs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((LL, n1, n2), U32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _outer_fn(n1: int, n2: int, n_tw: int, interpret: bool):
    """Kernel B: lazy (LL, n2, LB) slab (transposed, brp'd) -> log2(n2)
    stages along axis 1, exit canon+scale. Output canonical
    (L, n2, LB)."""

    def kernel(mod_ref, npr_ref, km_ref, c_ref, x_ref, tt_ref, *rest):
        tw_refs = rest[:n_tw]
        out_ref = rest[n_tw]
        km = _km_tuple(mod_ref, npr_ref, km_ref, lb)
        modc = _cvec3(km[0])
        nprc = _cvec3(km[1])
        # the T twist rides here: slab-sized VMEM instead of whole-array
        z = lazy_mul_tile(modc, nprc, x_ref[:], tt_ref[:])
        w = _axis_fft_stages(z, tw_refs, km)
        scaled = lazy_mul_tile(
            modc, nprc, w,
            jnp.broadcast_to(c_ref[:, :lb][:, None, :], w.shape))
        out_ref[:] = lazy_canon_tile(modc, scaled)[:L]

    lb = min(LANE_BLOCK, n1)
    grid = (n1 // lb,)
    xspec = pl.BlockSpec((LL, n2, lb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((L, n2, lb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((LL, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    tw_specs = []
    for s in range(2, n2.bit_length()):
        half = 1 << (s - 1)
        tw_specs.append(
            pl.BlockSpec((LL, half), lambda i: (0, 0),
                         memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec] * 4 + [xspec, xspec] + tw_specs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((L, n2, n1), U32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _consts():
    modx, nprx, km2 = _lazy_const_tiles_np(fr.SPEC)
    return jnp.asarray(modx), jnp.asarray(nprx), jnp.asarray(km2)


def fft_fused(vals, max_scale: int, inverse: bool):
    """Four-step (I)FFT of canonical uint32[n, 16] Montgomery values on
    the 2^max_scale domain. n must be >= 4 and a power of two."""
    n = vals.shape[0]
    n1, n2 = _split(n)
    inner_tw, t_ext, outer_tw, c_tile = _tables(max_scale, n, inverse)

    # (n, L) -> (L, n1, n2), bit-reverse along i1
    x3 = jnp.moveaxis(vals.reshape(n1, n2, L), -1, 0)
    x3 = brp_permute(x3, axis=1)
    z = _inner_fn(n1, n2, len(inner_tw), _interpret())(
        *_consts(), x3, *(jnp.asarray(t) for t in inner_tw))
    # (LL, n1, n2) -> (LL, n2, n1), bit-reverse along i2 (the T table
    # operand of the outer kernel is stored in matching order)
    zt = brp_permute(jnp.swapaxes(z, 1, 2), axis=1)
    w = _outer_fn(n1, n2, len(outer_tw), _interpret())(
        *_consts(), jnp.asarray(c_tile), zt, jnp.asarray(t_ext),
        *(jnp.asarray(t) for t in outer_tw))
    # (L, n2, n1): k2-major flattening IS the natural output order
    return jnp.moveaxis(w.reshape(L, n), 0, -1)
