"""Isolate the point-op slack: is the fori_loop TUPLE carry the problem?

mont_mul chain (single-array carry): 1.23 us/block/mul — at theory.
double chain (3-array tuple carry): 35 us/block vs 8.6 us theory (4x).

Variants, all 7 muls per iteration at B=2048, DEPTH=64:
  tuple3 : carry (x, y, z), muls mixing the three
  single : carry one (72, W) array, same muls on slices, reconcat
  serial : carry one (24, W) array, 7 serial muls
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

from kzg_tpu.field import fp
from kzg_tpu.field.pallas_kernels import _const_spec, mont_mul_tile
from kzg_tpu.utils.benchloop import device_loop

U32 = jnp.uint32
L = 24
B = 2048
block = 256
DEPTH = 64

mod_np = np.broadcast_to(
    fp.SPEC.mod_limbs.astype(np.uint32)[:, None], (L, 128)).copy()
npr_np = np.broadcast_to(
    fp.SPEC.nprime_limbs.astype(np.uint32)[:, None], (L, 128)).copy()
rng = np.random.default_rng(3)
av = np.stack([
    np.asarray(fp.SPEC.encode(int.from_bytes(rng.bytes(40), "little")))
    for _ in range(64)
]).T
a_np = np.tile(av, (1, B // 64))


def seven_muls(mod, npr, x, y, z):
    a = mont_mul_tile(mod, npr, x, y)
    b = mont_mul_tile(mod, npr, y, z)
    c = mont_mul_tile(mod, npr, z, x)
    d = mont_mul_tile(mod, npr, a, b)
    e = mont_mul_tile(mod, npr, b, c)
    f = mont_mul_tile(mod, npr, d, e)
    g = mont_mul_tile(mod, npr, e, a)
    return f, g, c


def make(kind):
    if kind == "tuple3":
        def kernel(mod_ref, npr_ref, px, py, pz, ox, oy, oz):
            mod = mod_ref[:, :1]
            npr = npr_ref[:, :1]

            def body(_, p):
                return seven_muls(mod, npr, *p)

            out = lax.fori_loop(0, DEPTH, body, (px[:], py[:], pz[:]),
                                unroll=False)
            ox[:], oy[:], oz[:] = out

        bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            kernel, grid=(B // block,),
            in_specs=[_const_spec(L)] * 2 + [bspec] * 3,
            out_specs=(bspec,) * 3,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)))

        def step(x):
            return fn(jnp.asarray(mod_np), jnp.asarray(npr_np), x, x, x)[0]
    elif kind == "single":
        def kernel(mod_ref, npr_ref, pw, ow):
            mod = mod_ref[:, :1]
            npr = npr_ref[:, :1]

            def body(_, w):
                f, g, c = seven_muls(mod, npr, w[:L], w[L:2 * L], w[2 * L:])
                return jnp.concatenate([f, g, c], axis=0)

            ow[:] = lax.fori_loop(0, DEPTH, body, pw[:], unroll=False)

        wspec = pl.BlockSpec((3 * L, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            kernel, grid=(B // block,),
            in_specs=[_const_spec(L)] * 2 + [wspec],
            out_specs=wspec,
            out_shape=jax.ShapeDtypeStruct((3 * L, B), U32))

        def step(x):
            w = jnp.concatenate([x, x, x], axis=0)
            return fn(jnp.asarray(mod_np), jnp.asarray(npr_np), w)[:L]
    else:  # serial
        def kernel(mod_ref, npr_ref, px, ox):
            mod = mod_ref[:, :1]
            npr = npr_ref[:, :1]

            def body(_, x):
                for _ in range(7):
                    x = mont_mul_tile(mod, npr, x, x)
                return x

            ox[:] = lax.fori_loop(0, DEPTH, body, px[:], unroll=False)

        bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            kernel, grid=(B // block,),
            in_specs=[_const_spec(L)] * 2 + [bspec],
            out_specs=bspec,
            out_shape=jax.ShapeDtypeStruct((L, B), U32))

        def step(x):
            return fn(jnp.asarray(mod_np), jnp.asarray(npr_np), x)
    return step


for kind in ("serial", "tuple3", "single"):
    step = make(kind)
    sec, _, fl = device_loop(step, (jnp.asarray(a_np),), k=4, chain=True)
    lap(f"{kind}: {sec/DEPTH*1e6:8.2f} us per 7-mul iter (B={B}) "
        f"floored={fl}")
lap("done")
