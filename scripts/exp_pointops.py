"""Time individual fused point ops on chip to locate ladder slack.

Expected from the mont_mul bound (8.14 us per Fp mul at 2048 lanes):
  double ~ (2M+5S) ~ 7 mul-equiv ~ 57 us
  add    ~ (13M+10S + dbl-branch) ~ 21.5 ~ 175 us
GLV butterfly measured 43 ms = 2x the sum of its parts -> find out why.
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
    _const_spec, mont_mul_tile, mont_sqr_tile)
from kzg_tpu.curve import g1
from kzg_tpu.curve import pallas_g1 as pg
from kzg_tpu.curve.weierstrass import JacobianPoint, CurveOps
from kzg_tpu.utils.benchloop import device_loop, sync

U32 = jnp.uint32
L = 24
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


# chained kernels: DEPTH sequential point ops inside one kernel
def chain_kernel(body_fn, n_scratch=0):
    def kernel(mod_ref, npr_ref, px, py, pz, ox, oy, oz, *scratch):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]

        def body(_, p):
            return body_fn(mod, npr, p, scratch)

        out = lax.fori_loop(0, DEPTH, body, (px[:], py[:], pz[:]),
                            unroll=False)
        ox[:], oy[:], oz[:] = out

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(L)] * 2 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((8, L, block), U32)
                        for _ in range(n_scratch)],
    )


def time_chain(name, fn):
    def step(px, py, pz):
        mod, npr = pg._consts()
        return fn(mod, npr, px, py, pz)

    sec, _, fl = device_loop(step, (pts.x.T, pts.y.T, pts.z.T), k=4,
                             chain=False)
    lap(f"{name}: {sec/DEPTH*1e6:9.2f} us/op (chain {DEPTH}, B={B}) "
        f"floored={fl}")


# 1. pure double chain
dbl_fn = chain_kernel(lambda mod, npr, p, s: pg.point_double_tile(mod, npr, p))
time_chain("double", dbl_fn)

# 2. pure add chain (p + const q); q = roll of p via second input? use p+p
add_fn = chain_kernel(
    lambda mod, npr, p, s: pg.point_add_tile(mod, npr, p, (p[1], p[0], p[2])))
time_chain("add", add_fn)

# 3. window-step: 4 dbl + table select + add (table prebuilt once)
def wstep_body(mod, npr, p, scratch):
    tx, ty, tz = scratch
    sel = (tx[3], ty[3], tz[3])
    q = p
    for _ in range(4):
        q = pg.point_double_tile(mod, npr, q)
    return pg.point_add_tile(mod, npr, q, sel)


def wstep_kernel_build():
    def kernel(mod_ref, npr_ref, px, py, pz, ox, oy, oz, tx, ty, tz):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]
        tx[0], ty[0], tz[0] = px[:], py[:], pz[:]
        pg._table_build_body(mod, npr, tx, ty, tz)

        def body(_, p):
            return wstep_body(mod, npr, p, (tx, ty, tz))

        out = lax.fori_loop(0, DEPTH, body, (px[:], py[:], pz[:]),
                            unroll=False)
        ox[:], oy[:], oz[:] = out

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[_const_spec(L)] * 2 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((8, L, block), U32) for _ in range(3)],
    )


time_chain("wstep(4dbl+add)", wstep_kernel_build())

# 4. mont sqr vs mul tile cost
def mul_chain():
    def kernel(mod_ref, npr_ref, a_ref, out_ref):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]

        def body(_, x):
            return mont_mul_tile(mod, npr, x, x)

        out_ref[:] = lax.fori_loop(0, DEPTH, body, a_ref[:], unroll=False)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(L)] * 2 + [bspec],
        out_specs=bspec, out_shape=jax.ShapeDtypeStruct((L, B), U32))


def sqr_chain():
    def kernel(mod_ref, npr_ref, a_ref, out_ref):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]

        def body(_, x):
            return mont_sqr_tile(mod, npr, x)

        out_ref[:] = lax.fori_loop(0, DEPTH, body, a_ref[:], unroll=False)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(L)] * 2 + [bspec],
        out_specs=bspec, out_shape=jax.ShapeDtypeStruct((L, B), U32))


for nm, k in (("mont_mul(x,x)", mul_chain()), ("mont_sqr", sqr_chain())):
    def step(x, k=k):
        mod, npr = pg._consts()
        return k(mod, npr, x)

    sec, _, fl = device_loop(step, (pts.x.T,), k=4, chain=True)
    lap(f"{nm}: {sec/DEPTH*1e6:9.2f} us/op (B={B}) floored={fl}")

lap("done")
