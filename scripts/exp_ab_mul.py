"""Decisive A/B: mont_mul_tile(24) vs lazy_mul_tile at 24/25/32 rows,
identical kernel structure (exp_carry's tuple3 shape), dedicated const
operands, no domain conversions. Isolates WHY ladder muls run ~5x the
exp_carry rate (timing only — lazy@24 is numerically wrong, never mind).
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
from kzg_tpu.field.pallas_kernels import (
    _const_spec, mont_mul_tile, lazy_mul_tile)
from kzg_tpu.utils.benchloop import device_loop

U32 = jnp.uint32
B = 2048
block = 256
DEPTH = 64

rng = np.random.default_rng(3)
av24 = np.stack([
    np.asarray(fp.SPEC.encode(int.from_bytes(rng.bytes(40), "little")))
    for _ in range(64)
]).T
a24 = np.tile(av24, (1, B // 64)).astype(np.uint32)  # (24, B)


def run(name, LR, mulfn):
    mod_np = np.zeros((LR, 128), np.uint32)
    mod_np[:24] = fp.SPEC.mod_limbs.astype(np.uint32)[:, None]
    npr_np = np.zeros((LR, 128), np.uint32)
    npr_np[:24] = fp.SPEC.nprime_limbs.astype(np.uint32)[:, None]
    a_np = np.zeros((LR, B), np.uint32)
    a_np[:24] = a24

    def kernel(mod_ref, npr_ref, px, py, pz, ox, oy, oz):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]

        def body(_, p):
            x, y, z = p
            a = mulfn(mod, npr, x, y)
            b = mulfn(mod, npr, y, z)
            c = mulfn(mod, npr, z, x)
            d = mulfn(mod, npr, a, b)
            e = mulfn(mod, npr, b, c)
            f = mulfn(mod, npr, d, e)
            g = mulfn(mod, npr, e, a)
            return f, g, c

        out = lax.fori_loop(0, DEPTH, body, (px[:], py[:], pz[:]),
                            unroll=False)
        ox[:], oy[:], oz[:] = out

    bspec = pl.BlockSpec((LR, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(LR)] * 2 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((LR, B), U32) for _ in range(3)))

    modj = jnp.asarray(mod_np)
    nprj = jnp.asarray(npr_np)

    def step(x):
        return fn(modj, nprj, x, x, x)[0]

    sec, _, fl = device_loop(step, (jnp.asarray(a_np),), k=4, chain=True)
    lap(f"{name}: {sec/DEPTH/7*1e6:8.2f} us/mul (7 muls x {DEPTH}, B={B}) "
        f"floored={fl}")


run("mont_mul  L=24", 24, mont_mul_tile)
run("lazy_mul  L=24", 24, lambda m, n, a, b: lazy_mul_tile(m, n, a, b))
run("lazy_mul  L=25", 25, lambda m, n, a, b: lazy_mul_tile(m, n, a, b))
run("lazy_mul  L=32", 32, lambda m, n, a, b: lazy_mul_tile(m, n, a, b))
lap("done")
