"""Experiment: move REDC's by-constant limb products onto the MXU.

VERDICT r4 item 3 / SURVEY §7 hard part 3: the G1 ladder is mul-bound at
the VPU int-multiply rate, and the 24x24 limb products were never tried
on the MXU. The data x data product pass (a*b) has no shared operand and
cannot be a matmul — but the OTHER TWO passes of every Montgomery/lazy
REDC are products by GLOBAL constants:

    t  = a * b          (data x data   — VPU, unavoidable)
    q  = t_lo * n'      (by-constant   — candidate MXU matmul)
    qm = q * m          (by-constant   — candidate MXU matmul)

A by-constant limb product IS a matmul: decompose the variable operand
into 8-bit digits (integers < 2^8 are exact in bf16; digit products
< 2^16 and column sums < 2^22 are exact in f32 accumulation), multiply
by the constant's (D, 2D) Toeplitz digit matrix on the MXU, recombine
columns pairwise into 16-bit limbs on the VPU, carry-fold.

This script measures, on-chip, per 2048/16384/131072 lanes:
  1. the full 24-limb VPU mont_mul kernel (the live engine's rate)
  2. one VPU by-constant product pass in isolation (XLA level)
  3. the MXU by-constant pass: digit split + bf16 matmul + recombine
  4. a full HYBRID mont_mul (XLA level): VPU a*b, MXU q/qm passes
all validated bit-exact against host integers.

Decision rule (recorded in BENCH_TPU.md): adopt the hybrid kernel only
if (4) beats (1) by >1.3x at production widths.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_mxu_mul.py
"""

import json

import numpy as np

import jax
import jax.numpy as jnp

from kzg_tpu.field import fp
from kzg_tpu.field.limbs import LIMB_BITS, LIMB_MASK
from kzg_tpu.utils.benchloop import device_loop

SPEC = fp.SPEC
L = SPEC.n_limbs            # 24 x 16-bit limbs
D = 2 * L                   # 48 x 8-bit digits
MOD = SPEC.modulus
NPRIME = (-pow(MOD, -1, 1 << (16 * L))) % (1 << (16 * L))


def to_digits8(x16):
    """uint32[..., L] 16-bit limbs -> bf16[..., 2L] 8-bit digits."""
    lo = (x16 & 0xFF).astype(jnp.bfloat16)
    hi = ((x16 >> 8) & 0xFF).astype(jnp.bfloat16)
    return jnp.stack([lo, hi], axis=-1).reshape(x16.shape[:-1] + (2 * L,))


def toeplitz_digits(c: int, in_digits: int, out_digits: int) -> np.ndarray:
    """(in_digits, out_digits) bf16 matrix T with T[i, k] = digit_{k-i}(c):
    (x digits) @ T = digit-column sums of x*c."""
    cd = [(c >> (8 * j)) & 0xFF for j in range(out_digits)]
    t = np.zeros((in_digits, out_digits), dtype=np.float32)
    for i in range(in_digits):
        for k in range(out_digits):
            j = k - i
            if 0 <= j < out_digits:
                t[i, k] = cd[j]
    return t


def cols8_to_limbs16(cols_f32, n_limbs):
    """f32[..., 2K] exact 8-bit-digit column sums -> uint32[..., K] 16-bit
    redundant columns (pairwise combine, < 2^30 — carry-fold ready)."""
    c = cols_f32.astype(jnp.uint32)
    lo = c[..., 0::2]
    hi = c[..., 1::2]
    return (lo + (hi << 8))[..., :n_limbs]


def carry_fold_rows(cols):
    """uint32[..., K] redundant 16-bit columns -> canonical limbs
    (mod 2^(16K)); the vector-layout analogue of pallas _carry_fold."""
    K = cols.shape[-1]

    def shift_up(x, d):
        if d >= K:
            return jnp.zeros_like(x)
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(d, 0)])[..., :K]

    v = (cols & LIMB_MASK) + shift_up(cols >> LIMB_BITS, 1)
    v = (v & LIMB_MASK) + shift_up(v >> LIMB_BITS, 1)
    g = v >> LIMB_BITS
    p = (v == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < K:
        g = g | (p & shift_up(g, d))
        p = p & shift_up(p, d)
        d *= 2
    return (v + shift_up(g, 1)) & LIMB_MASK


def mxu_const_mul(x16, t_mat, out_limbs):
    """x * c via the MXU: digit split, bf16 matmul (exact), recombine.
    x16: uint32[W, L_in]; t_mat: (2*L_in, 2*out_limbs) bf16."""
    digits = to_digits8(x16)  # (W, 2*L_in) bf16
    cols = jax.lax.dot_general(
        digits, t_mat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return carry_fold_rows(cols8_to_limbs16(cols, out_limbs))


def vpu_const_mul(x16, c_limbs, out_limbs):
    """x * c on the VPU: the digit-serial product loop (limbs.py shape):
    (W, L, 1) * (1, 1?, L) broadcast outer product + shifted column sums."""
    W = x16.shape[0]
    Lx = x16.shape[1]
    acc = jnp.zeros((W, out_limbs), dtype=jnp.uint32)
    for i in range(Lx):
        p = x16[:, i:i + 1] * c_limbs[None, :]  # (W, Lc)
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        n_lo = min(c_limbs.shape[0], out_limbs - i)
        if n_lo > 0:
            acc = acc + jnp.pad(
                lo[:, :n_lo], ((0, 0), (i, out_limbs - i - n_lo)))
        n_hi = min(c_limbs.shape[0], out_limbs - i - 1)
        if n_hi > 0:
            acc = acc + jnp.pad(
                hi[:, :n_hi], ((0, 0), (i + 1, out_limbs - i - 1 - n_hi)))
    return carry_fold_rows(acc)


def limbs_of(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)],
                    dtype=np.uint32)


def ints_of(arr) -> list:
    a = np.asarray(arr)
    return [sum(int(x) << (16 * i) for i, x in enumerate(row)) for row in a]


def hybrid_mont_mul(a16, b16, np_t, m_t, m_limbs):
    """Full REDC with the two constant passes on the MXU.

    t = a*b (VPU digit-serial); q = t_lo * n' mod R (MXU); qm = q * m
    (MXU, 2L output); s = (t + qm) >> 16L; conditional subtract."""
    W = a16.shape[0]
    # data x data full product on the VPU (the unavoidable pass)
    acc = jnp.zeros((W, 2 * L), dtype=jnp.uint32)
    for i in range(L):
        p = a16[:, i:i + 1] * b16  # (W, L)
        lo, hi = p & LIMB_MASK, p >> LIMB_BITS
        n_lo = min(L, 2 * L - i)
        acc = acc + jnp.pad(lo[:, :n_lo], ((0, 0), (i, 2 * L - i - n_lo)))
        n_hi = min(L, 2 * L - i - 1)
        acc = acc + jnp.pad(
            hi[:, :n_hi], ((0, 0), (i + 1, 2 * L - i - 1 - n_hi)))
    t = carry_fold_rows(acc)
    q = mxu_const_mul(t[:, :L], np_t, L)          # t_lo * n' mod R
    qm = mxu_const_mul(q, m_t, 2 * L)             # q * m, full width
    s_cols = t + qm
    s = carry_fold_rows(s_cols)[:, L:]
    # s may be one carry short of t+qm's true high half (the fold is mod
    # 2^(32L) so it is exact); conditional subtract vs m
    m_arr = jnp.asarray(limbs_of(MOD, L))

    def geq(x, y):
        gt = jnp.zeros(x.shape[:1], dtype=bool)
        eq = jnp.ones(x.shape[:1], dtype=bool)
        for i in range(L - 1, -1, -1):
            gt = gt | (eq & (x[:, i] > y[i]))
            eq = eq & (x[:, i] == y[i])
        return gt | eq

    need = geq(s, m_arr)
    mnot = LIMB_MASK - m_arr
    cols = s + jnp.where(need[:, None], mnot[None, :],
                         jnp.zeros_like(mnot)[None, :])
    cols = cols.at[:, 0].add(need.astype(jnp.uint32))
    return carry_fold_rows(cols)


def toeplitz16_bytes(c: int, in_limbs: int, out_limbs: int):
    """Byte planes of the 16-bit-limb Toeplitz matrix of constant c:
    (T_lo, T_hi) float32 (out_limbs, in_limbs) with
    T_lo[k, i] = (c16[k-i]) & 0xFF, T_hi[k, i] = c16[k-i] >> 8.

    Then for x in 16-bit limbs with byte planes ev = x & 0xFF,
    od = x >> 8 (both (in_limbs, W)):
        x*c columns (redundant 16-bit rows, < 2^30) =
          T_lo@ev + ((T_hi@ev + T_lo@od) << 8) + shift_up(T_hi@od, 1)
    — every dot is exact in bf16 x bf16 -> f32 (entries < 2^8, sums
    < 2^21), no sublane interleaving anywhere."""
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


def mxu_const_mul_tile(tlo, thi, x16_tile):
    """In-kernel by-constant product on the MXU: 4 byte-plane dots.
    tlo/thi: (out, L_in) bf16; x16_tile: (L_in, W) canonical 16-bit
    limbs. Returns (out, W) uint32 redundant 16-bit columns (< 2^30)."""
    from kzg_tpu.field.pallas_kernels import _shift_up

    def bf(v):
        return v.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    ev = bf(x16_tile & 0xFF)
    od = bf(x16_tile >> 8)

    def dot(t, d):
        r = jax.lax.dot_general(
            t, d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return r.astype(jnp.int32).astype(jnp.uint32)

    a = dot(tlo, ev)
    b = dot(thi, ev) + dot(tlo, od)
    d = dot(thi, od)
    return a + (b << 8) + _shift_up(d, 1)


def pallas_hybrid_mul_fn(B: int, block: int, interpret: bool):
    """Full mont_mul kernel with the q and qm product passes on the MXU.

    Operands: byte-plane Toeplitz matrices of n' (L, L, truncated mod R)
    and m (2L, L)."""
    from kzg_tpu.field.pallas_kernels import (
        _carry_fold, _cond_sub_mod, _product_cols)

    def kernel(mod_ref, nplo_ref, nphi_ref, mlo_ref, mhi_ref,
               a_ref, b_ref, out_ref):
        mod = mod_ref[:, :1]
        a, b = a_ref[:], b_ref[:]
        t = _carry_fold(_product_cols(a, b, 2 * L))             # VPU pass
        q_cols = mxu_const_mul_tile(nplo_ref[:], nphi_ref[:], t[:L])
        q = _carry_fold(q_cols)                                 # MXU pass
        qm_cols = mxu_const_mul_tile(mlo_ref[:], mhi_ref[:], q)
        qm = _carry_fold(qm_cols)                               # MXU pass
        s = _carry_fold(t + qm)
        out_ref[:] = _cond_sub_mod(mod, s[L:])

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    cspec = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[cspec(L, 128), cspec(L, L), cspec(L, L),
                  cspec(2 * L, L), cspec(2 * L, L), bspec, bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
        interpret=interpret,
    )


def main():
    rng = np.random.default_rng(7)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    np_t = jnp.asarray(toeplitz_digits(NPRIME, 2 * L, 2 * L)).astype(
        jnp.bfloat16)
    m_t = jnp.asarray(toeplitz_digits(MOD, 2 * L, 4 * L)).astype(
        jnp.bfloat16)
    m_limbs = jnp.asarray(limbs_of(MOD, L))

    # correctness first (small batch, device)
    W0 = 256
    xs = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          * int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          * int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          % MOD for _ in range(W0)]
    ys = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          * int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          * int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          % MOD for _ in range(W0)]
    a16 = jnp.asarray(np.stack([limbs_of(v, L) for v in xs]))
    b16 = jnp.asarray(np.stack([limbs_of(v, L) for v in ys]))

    got_q = ints_of(jax.device_get(
        jax.jit(lambda x: mxu_const_mul(x, np_t, L))(a16)))
    exp_q = [(v * NPRIME) % (1 << (16 * L)) for v in xs]
    assert got_q == exp_q, "MXU n' pass mismatch"

    got = ints_of(jax.device_get(jax.jit(
        lambda a, b: hybrid_mont_mul(a, b, np_t, m_t, m_limbs))(a16, b16)))
    rinv = pow(1 << (16 * L), -1, MOD)
    exp = [x * y * rinv % MOD for x, y in zip(xs, ys)]
    assert got == exp, "hybrid mont_mul mismatch"
    print(json.dumps({"correct": True}), flush=True)

    from kzg_tpu.field.pallas_kernels import (
        _const_tiles, _interpret, _mul_fn)

    for W in (2048, 16384, 131072):
        big = np.stack([
            limbs_of(int(v) % MOD, L)
            for v in rng.integers(0, 1 << 62, size=W).astype(object)])
        aW = jnp.asarray(big)
        bW = jnp.asarray(np.roll(big, 1, axis=0))
        lane_a = jnp.asarray(big.T.copy())  # (L, W) lane layout

        # 1. live VPU pallas mont_mul kernel
        mod_t, npr_t = _const_tiles(SPEC)
        fn = _mul_fn(SPEC, W, min(512, W), _interpret())
        sec, _, fl = device_loop(
            lambda x: fn(mod_t, npr_t, x, lane_a), (lane_a,),
            k=64, chain=True)
        print(json.dumps({"metric": f"pallas_mont_mul_W{W}",
                          "ns_per_lane": sec * 1e9 / W,
                          "floored": fl}), flush=True)

        # 2. one VPU by-constant pass (XLA level)
        m_c = jnp.asarray(limbs_of(MOD, L))
        vfn = jax.jit(lambda x: vpu_const_mul(x, m_c, 2 * L)[:, :L])
        sec, _, fl = device_loop(vfn, (aW,), k=64, chain=True)
        print(json.dumps({"metric": f"vpu_const_pass_W{W}",
                          "ns_per_lane": sec * 1e9 / W,
                          "floored": fl}), flush=True)

        # 3. the MXU by-constant pass
        mfn = jax.jit(lambda x: mxu_const_mul(x, np_t, L))
        sec, _, fl = device_loop(mfn, (aW,), k=64, chain=True)
        print(json.dumps({"metric": f"mxu_const_pass_W{W}",
                          "ns_per_lane": sec * 1e9 / W,
                          "floored": fl}), flush=True)

        # 4. full hybrid REDC (XLA level)
        hfn = jax.jit(
            lambda a, b: hybrid_mont_mul(a, b, np_t, m_t, m_limbs))
        sec, _, fl = device_loop(hfn, (aW, bW), k=32, chain=True)
        print(json.dumps({"metric": f"hybrid_mont_mul_W{W}",
                          "ns_per_lane": sec * 1e9 / W,
                          "floored": fl}), flush=True)

        # 5. full hybrid REDC as ONE pallas kernel (q/qm passes on the
        # MXU via in-kernel bf16 byte-plane dots, rest VPU tile math)
        nplo, nphi = toeplitz16_bytes(NPRIME, L, L)
        mlo, mhi = toeplitz16_bytes(MOD, L, 2 * L)
        nplo, nphi, mlo, mhi = (
            jnp.asarray(x).astype(jnp.bfloat16)
            for x in (nplo, nphi, mlo, mhi))
        pk = pallas_hybrid_mul_fn(W, min(512, W), _interpret())
        # bit-exactness of the fused kernel vs the live kernel, on-chip
        ref_out = jax.device_get(fn(mod_t, npr_t, lane_a, lane_a))
        hyb_out = jax.device_get(
            pk(mod_t, nplo, nphi, mlo, mhi, lane_a, lane_a))
        assert (ref_out == hyb_out).all(), "pallas hybrid mismatch"
        sec, _, fl = device_loop(
            lambda x: pk(mod_t, nplo, nphi, mlo, mhi, x, lane_a),
            (lane_a,), k=64, chain=True)
        print(json.dumps({"metric": f"pallas_hybrid_mul_W{W}",
                          "ns_per_lane": sec * 1e9 / W,
                          "floored": fl}), flush=True)


if __name__ == "__main__":
    main()
