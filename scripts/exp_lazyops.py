"""Locate the ladder slack: per-op cost of the lazy projective point ops
vs their raw mont-mul content, all chained DEPTH-deep inside one kernel.

Known on-chip numbers (exp_carry/exp_addsub, B=2048 lanes):
  7 independent mont_muls in a fori_loop: 43 us  (6.2 us/mul)
  7 serial mont_muls:                     51 us
  mod_add/mod_sub in isolation:           1.0-1.4 us
Ladder context implies ~19 us/mul-equivalent (38.8 ms / ~2000 muls) —
~3x the isolated rate. Chains below bisect where that factor enters.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


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
    _const_spec, lazy_mul_tile, lazy_add_tile, lazy_sub_tile)
from kzg_tpu.curve import g1
from kzg_tpu.curve import pallas_g1 as pg
from kzg_tpu.curve.weierstrass import JacobianPoint, CurveOps
from kzg_tpu.utils.benchloop import device_loop, sync

U32 = jnp.uint32
L = 24
LL = pg.LL
B = 2048
block = 256
DEPTH = 64

ops = CurveOps(fp, 1)
rng = np.random.default_rng(9)
pts = ops.scalar_mul(
    g1.generator((B,)),
    jnp.asarray(fr.SPEC.encode([int(x) for x in rng.integers(1, 2**60, B)])))
pts = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in pts))
sync(pts)
lap("points ready")


def chain_kernel(body_fn, n_scratch=0, mulcount=None, name=""):
    """DEPTH sequential body_fn applications on ext-domain point tuples."""
    def kernel(mr, nr, cir, cor, oner, px, py, pz, ox, oy, oz, *scratch):
        lz, cin, cout, one_ext = pg._kernel_ctx((mr, nr, cir, cor, oner))
        p = tuple(pg.to_ext(lz, cin, c)
                  for c in (px[:], py[:], pz[:]))

        def body(_, p):
            return body_fn(lz, p, scratch, one_ext)

        out = lax.fori_loop(0, DEPTH, body, p, unroll=False)
        ox[:] = pg.from_ext(lz, cout, out[0])
        oy[:] = pg.from_ext(lz, cout, out[1])
        oz[:] = pg.from_ext(lz, cout, out[2])

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(pg.LL)] * 5 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((8, LL, block), U32)
                        for _ in range(n_scratch)],
    )

    def step(px, py, pz):
        return fn(*pg._cst()[:5], px, py, pz)

    sec, _, fl = device_loop(step, (pts.x.T, pts.y.T, pts.z.T), k=4,
                             chain=False)
    extra = f"  ({sec/DEPTH/mulcount*1e6:6.2f} us/mul-eq)" if mulcount else ""
    lap(f"{name}: {sec/DEPTH*1e6:9.2f} us/op (chain {DEPTH}, B={B}) "
        f"floored={fl}{extra}")


# 1. lazy proj_double chain: 8 muls + ~12 lazy A/S
chain_kernel(lambda lz, p, s, one: pg.proj_double(lz, p),
             mulcount=8, name="proj_double")

# 2. lazy proj_add chain (p + swizzled p): 12 muls + ~27 lazy A/S
chain_kernel(lambda lz, p, s, one: pg.proj_add(lz, p, (p[1], p[0], p[2])),
             mulcount=12, name="proj_add  ")


# 3. window step with prebuilt table: 4 dbl + select + apply-add
def wstep(lz, p, scratch, one_ext):
    tx, ty, tz = scratch
    q = p
    for _ in range(4):
        q = pg.proj_double(lz, q)
    dig = jnp.full((block,), 5, dtype=jnp.int32)
    return pg._apply_digit(lz, q, tx, ty, tz, dig)


def wstep_with_table():
    def kernel(mr, nr, cir, cor, oner, px, py, pz, ox, oy, oz, tx, ty, tz):
        lz, cin, cout, one_ext = pg._kernel_ctx((mr, nr, cir, cor, oner))
        p = tuple(pg.to_ext(lz, cin, c) for c in (px[:], py[:], pz[:]))
        tx[0], ty[0], tz[0] = pg.jac_to_proj(lz, one_ext, p)
        pg._table_build_body(lz, tx, ty, tz)

        def body(_, p):
            return wstep(lz, p, (tx, ty, tz), one_ext)

        out = lax.fori_loop(0, DEPTH, body, p, unroll=False)
        ox[:] = pg.from_ext(lz, cout, out[0])
        oy[:] = pg.from_ext(lz, cout, out[1])
        oz[:] = pg.from_ext(lz, cout, out[2])

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(pg.LL)] * 5 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((8, LL, block), U32) for _ in range(3)],
    )

    def step(px, py, pz):
        return fn(*pg._cst()[:5], px, py, pz)

    sec, _, fl = device_loop(step, (pts.x.T, pts.y.T, pts.z.T), k=4,
                             chain=False)
    # 4*8 + 12 = 44 muls
    lap(f"wstep(4dbl+apply): {sec/DEPTH*1e6:9.2f} us/op floored={fl}  "
        f"({sec/DEPTH/44*1e6:6.2f} us/mul-eq)")


wstep_with_table()


# 4. raw lazy_mul chains for reference: 8 muls with proj_double's exact
# dependency pattern vs 8 independent
def mulref(kind):
    def kernel(mr, nr, cir, cor, oner, px, py, pz, ox, oy, oz):
        lz, cin, cout, one_ext = pg._kernel_ctx((mr, nr, cir, cor, oner))
        modx, nprx, km = lz
        p = tuple(pg.to_ext(lz, cin, c) for c in (px[:], py[:], pz[:]))

        def body(_, p):
            x, y, z = p
            M = lambda a, b: lazy_mul_tile(modx, nprx, a, b)
            if kind == "indep":
                outs = [M(x, y), M(y, z), M(z, x), M(x, x),
                        M(y, y), M(z, z), M(x, z), M(y, x)]
                return (outs[0], outs[1], outs[2])
            # proj_double's dependency shape: 3 indep then chains
            t0 = M(y, y)
            t1 = M(y, z)
            t2 = M(z, z)
            a = M(t2, t0)
            b = M(t1, t2)
            c = M(a, b)
            d = M(c, t0)
            e = M(d, x)
            return (c, d, e)

        out = lax.fori_loop(0, DEPTH, body, p, unroll=False)
        ox[:] = pg.from_ext(lz, cout, out[0])
        oy[:] = pg.from_ext(lz, cout, out[1])
        oz[:] = pg.from_ext(lz, cout, out[2])

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(pg.LL)] * 5 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)),
    )

    def step(px, py, pz):
        return fn(*pg._cst()[:5], px, py, pz)

    sec, _, fl = device_loop(step, (pts.x.T, pts.y.T, pts.z.T), k=4,
                             chain=False)
    lap(f"8x lazy_mul {kind}: {sec/DEPTH*1e6:9.2f} us/op floored={fl}  "
        f"({sec/DEPTH/8*1e6:6.2f} us/mul)")


mulref("indep")
mulref("chain")
lap("done")
