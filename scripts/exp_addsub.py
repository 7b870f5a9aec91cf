"""Time the small tile ops (mod_add, carry_fold, geq, cond_sub) that the
point formulas use ~12x per point op — suspected slack source."""
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
    _const_spec, _carry_fold, _cond_sub_mod, _geq, mod_add_tile,
    mod_sub_tile, mont_mul_tile)
from kzg_tpu.utils.benchloop import device_loop

U32 = jnp.uint32
L = 24
B = 2048
block = 256
DEPTH = 256


def timed(name, body_fn):
    def kernel(mod_ref, npr_ref, a_ref, out_ref):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]

        def body(_, x):
            return body_fn(mod, npr, x)

        out_ref[:] = lax.fori_loop(0, DEPTH, body, a_ref[:], unroll=False)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(L)] * 2 + [bspec],
        out_specs=bspec, out_shape=jax.ShapeDtypeStruct((L, B), U32))

    rng = np.random.default_rng(1)
    av = np.stack([
        np.asarray(fp.SPEC.encode(int.from_bytes(rng.bytes(40), "little")))
        for _ in range(64)
    ]).T
    a = jnp.asarray(np.tile(av, (1, B // 64)))
    mod = jnp.asarray(np.broadcast_to(
        fp.SPEC.mod_limbs.astype(np.uint32)[:, None], (L, 128)).copy())
    npr = jnp.asarray(np.broadcast_to(
        fp.SPEC.nprime_limbs.astype(np.uint32)[:, None], (L, 128)).copy())

    def step(x):
        return fn(mod, npr, x)

    sec, _, fl = device_loop(step, (a,), k=8, chain=True)
    lap(f"{name}: {sec/DEPTH*1e9:9.1f} ns/op (B={B}) floored={fl}")


timed("mont_mul(x,c)", lambda mod, npr, x: mont_mul_tile(
    mod, npr, x, jnp.broadcast_to(npr, x.shape)))  # const-ish operand
timed("mod_add(x,x)", lambda mod, npr, x: mod_add_tile(mod, x, x))
timed("mod_sub(m-x,x)", lambda mod, npr, x: mod_sub_tile(
    mod, jnp.broadcast_to(mod, x.shape), x))
timed("carry_fold", lambda mod, npr, x: _carry_fold(x)[:L])
timed("geq+where", lambda mod, npr, x: jnp.where(
    _geq(x, jnp.broadcast_to(mod, x.shape))[None, :], x,
    jnp.broadcast_to(mod, x.shape)))
timed("cond_sub", lambda mod, npr, x: _cond_sub_mod(mod, x))
lap("done")
