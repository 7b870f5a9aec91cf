"""Experiment: mont_mul tile-kernel variants on the real chip.

The VPU cost of one Montgomery multiply bounds every hot path (Fr FFT
butterflies, G1 point ops). Variants:
  A: current production kernel (pad-and-add column accumulation)
  B: scratch-ref accumulation (static-slice += into a VMEM accumulator)
  C: MXU REDC — the two constant products (t*n' mod R, q*m) as int8
     matmuls against host-built nibble Toeplitz matrices; only the
     data-dependent a*b product stays on the VPU

Each is timed as a chained 256-deep in-kernel ladder (out feeds in) so
per-mul cost is sequential-depth-honest, batch 2048 lanes.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kzg_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from kzg_tpu.field import fr, fp
from kzg_tpu.field.pallas_kernels import (
    LIMB_BITS, LIMB_MASK, _carry_fold, _product_cols, _cond_sub_mod,
    mont_mul_tile, _const_spec)
from kzg_tpu.utils.benchloop import device_loop

U32 = jnp.uint32
DEPTH = 256


# ---------------- variant B: scratch-ref accumulation ----------------

def _product_cols_ref(a, b, out_limbs, acc):
    L = a.shape[0]
    acc[:] = jnp.zeros_like(acc)
    for i in range(L):
        p = a[i][None, :] * b
        lo_n = min(L, out_limbs - i)
        if lo_n > 0:
            acc[i:i + lo_n] += p[:lo_n] & LIMB_MASK
        hi_n = min(L, out_limbs - i - 1)
        if hi_n > 0:
            acc[i + 1:i + 1 + hi_n] += p[:hi_n] >> LIMB_BITS
    return acc[:out_limbs]


def mont_mul_tile_refacc(mod, npr, a, b, acc2L, accL):
    L = a.shape[0]
    modb = jnp.broadcast_to(mod, a.shape)
    nprb = jnp.broadcast_to(npr, a.shape)
    t = _carry_fold(_product_cols_ref(a, b, 2 * L, acc2L))
    q = _carry_fold(_product_cols_ref(t[:L], nprb, L, accL))
    qm = _carry_fold(_product_cols_ref(q, modb, 2 * L, acc2L))
    s = _carry_fold(t + qm)
    # inline cond-sub (avoid importing private)
    from kzg_tpu.field.pallas_kernels import _cond_sub_mod as cs
    return cs(mod, s[L:])


# ---------------- variant C: MXU REDC ----------------

def build_redc_mats(spec):
    """(M1, M2) int8 host matrices in block-nibble ordering.

    Nibble row ordering (both in and out): row b*L' + j  <=> nibble
    weight 4j + b  (b in 0..3, j in 0..L'-1). M1: t_lo(4L) -> nibble
    column sums of t_lo * nprime mod R (out limbs L). M2: q(4L) ->
    full q*m (out limbs 2L).
    """
    L = spec.n_limbs

    def nibbles_of(value, n_nib):
        return [(value >> (4 * k)) & 0xF for k in range(n_nib)]

    def make(const_int, out_limbs):
        n_in = 4 * L
        n_out = 4 * out_limbs
        cn = nibbles_of(const_int, 4 * out_limbs)  # enough nibble digits
        M = np.zeros((n_out, n_in), dtype=np.int8)
        for out_r in range(n_out):
            b, j = divmod(out_r, out_limbs)
            w_out = 4 * j + b
            for in_r in range(n_in):
                bi, ji = divmod(in_r, L)
                w_in = 4 * ji + bi
                d = w_out - w_in
                if 0 <= d < len(cn):
                    M[out_r, in_r] = cn[d]
        return M

    return make(spec.nprime, L), make(spec.modulus, 2 * L)


def _to_nibbles(x):
    """(L, W) canonical 16-bit limbs -> (4L, W) int8 nibbles in block
    order (4 sublane-concatenated (L, W) groups)."""
    return jnp.concatenate(
        [((x >> (4 * b)) & 0xF).astype(jnp.int8) for b in range(4)], axis=0)


def _from_nibcols(y, out_limbs):
    """(4*out_limbs, W) int32 nibble column sums (block order) ->
    (out_limbs, W) uint32 16-bit-limb column sums."""
    acc = y[:out_limbs].astype(U32)
    for b in range(1, 4):
        acc = acc + (y[b * out_limbs:(b + 1) * out_limbs].astype(U32) << (4 * b))
    return acc


def mont_mul_tile_mxu(mod, npr_unused, m1, m2, a, b):
    L = a.shape[0]
    t = _carry_fold(_product_cols(a, b, 2 * L))
    t4 = _to_nibbles(t[:L])
    qn = lax.dot_general(m1, t4, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.int32)
    q = _carry_fold(_from_nibcols(qn, L))
    q4 = _to_nibbles(q)
    qmn = lax.dot_general(m2, q4, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    qm = _from_nibcols(qmn, 2 * L)
    s = _carry_fold(t + qm)
    from kzg_tpu.field.pallas_kernels import _cond_sub_mod as cs
    return cs(mod, s[L:])


# ---------------- kernels: chained DEPTH-deep ladders ----------------

def chain_kernel_factory(spec, variant, block):
    L = spec.n_limbs

    if variant == "A":
        def kernel(mod_ref, npr_ref, a_ref, b_ref, out_ref):
            mod = mod_ref[:, :1]
            npr = npr_ref[:, :1]
            b = b_ref[:]

            def body(_, x):
                return mont_mul_tile(mod, npr, x, b)

            out_ref[:] = lax.fori_loop(0, DEPTH, body, a_ref[:],
                                       unroll=False)

        extra_in = []
        scratch = []
    elif variant == "B":
        def kernel(mod_ref, npr_ref, a_ref, b_ref, out_ref, acc2L, accL):
            mod = mod_ref[:, :1]
            npr = npr_ref[:, :1]
            b = b_ref[:]

            def body(_, x):
                return mont_mul_tile_refacc(mod, npr, x, b, acc2L, accL)

            out_ref[:] = lax.fori_loop(0, DEPTH, body, a_ref[:],
                                       unroll=False)

        extra_in = []
        scratch = [pltpu.VMEM((2 * L, block), U32),
                   pltpu.VMEM((L, block), U32)]
    else:  # C
        def kernel(mod_ref, npr_ref, m1_ref, m2_ref, a_ref, b_ref, out_ref):
            mod = mod_ref[:, :1]
            b = b_ref[:]
            m1 = m1_ref[:]
            m2 = m2_ref[:]

            def body(_, x):
                return mont_mul_tile_mxu(mod, None, m1, m2, x, b)

            out_ref[:] = lax.fori_loop(0, DEPTH, body, a_ref[:],
                                       unroll=False)

        m1np, m2np = build_redc_mats(spec)
        extra_in = [
            (jnp.asarray(m1np),
             pl.BlockSpec(m1np.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)),
            (jnp.asarray(m2np),
             pl.BlockSpec(m2np.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)),
        ]
        scratch = []

    return kernel, extra_in, scratch


def run_variant(spec, variant, B=2048, block=256):
    L = spec.n_limbs
    kernel, extra_in, scratch = chain_kernel_factory(spec, variant, block)
    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    extra_vals = [v for v, _ in extra_in]
    extra_specs = [s for _, s in extra_in]
    fn = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(L)] * 2 + extra_specs + [bspec, bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((L, B), U32),
        scratch_shapes=scratch,
    )

    mod = np.broadcast_to(spec.mod_limbs.astype(np.uint32)[:, None],
                          (L, 128)).copy()
    npr = np.broadcast_to(spec.nprime_limbs.astype(np.uint32)[:, None],
                          (L, 128)).copy()
    rng = np.random.default_rng(42)
    av = np.stack([
        np.asarray(spec.encode(int.from_bytes(rng.bytes(31), "little")))
        for _ in range(64)
    ]).T  # (L, 64)
    a = jnp.asarray(np.tile(av, (1, B // 64)))
    b = jnp.asarray(np.tile(av[:, ::-1], (1, B // 64)))

    def step(x):
        return fn(jnp.asarray(mod), jnp.asarray(npr), *map(jnp.asarray, extra_vals), x, b)

    sec, out, fl = device_loop(step, (a,), k=4, chain=True)
    per_mul = sec / DEPTH
    # correctness: one application vs host ints
    one = np.asarray(jax.device_get(fn(
        jnp.asarray(mod), jnp.asarray(npr), *map(jnp.asarray, extra_vals),
        a, b)))
    from kzg_tpu.field import limbs as limbs_mod
    ai = limbs_mod.limbs_to_int(np.asarray(jax.device_get(a))[:, 0])
    bi = limbs_mod.limbs_to_int(np.asarray(jax.device_get(b))[:, 0])
    rinv = pow(1 << (16 * L), -1, spec.modulus)
    want = ai
    for _ in range(DEPTH):
        want = want * bi * rinv % spec.modulus
    got = limbs_mod.limbs_to_int(one[:, 0])
    ok = got == want
    lap(f"{spec.name} variant {variant}: {per_mul*1e9:8.1f} ns/mul "
        f"(chain of {DEPTH}, B=2048) correct={ok} floored={fl}")
    return per_mul


for spec in (fr.SPEC, fp.SPEC):
    for variant in ("A", "B", "C"):
        try:
            run_variant(spec, variant)
        except Exception as e:
            lap(f"{spec.name} variant {variant} FAILED: {type(e).__name__}: {e}")
lap("done")
