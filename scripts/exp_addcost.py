"""Name the expensive primitive: 8-mul chain + K interleaved lazy ops.

All operands loop-varying (no hoisting). Variants per iteration:
  adds0    8 muls
  adds4    8 muls + 4 lazy_add
  adds12   8 muls + 12 lazy_add
  subs12   8 muls + 12 lazy_sub
  fold12   8 muls + 12 bare _carry_fold(x + y)  [lazy_add inlined]
  raw12    8 muls + 12 bare (x + y) & MASK      [no fold at all]
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
    _const_spec, _carry_fold, lazy_mul_tile, lazy_add_tile, lazy_sub_tile,
    LIMB_MASK)
from kzg_tpu.curve import g1
from kzg_tpu.curve import pallas_g1 as pg
from kzg_tpu.curve.weierstrass import JacobianPoint, CurveOps
from kzg_tpu.utils.benchloop import device_loop, sync

U32 = jnp.uint32
LL = pg.LL
B = 2048
block = 256
DEPTH = 64

rng = np.random.default_rng(3)
ops = CurveOps(fp, 1)
pts = ops.scalar_mul(
    g1.generator((B,)),
    jnp.asarray(fr.SPEC.encode([int(x) for x in rng.integers(1, 2**60, B)])))
pts = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in pts))
sync(pts)
lap("ready")


def variant(kind, nextra):
    def kernel(mr, nr, cir, cor, oner, px, py, pz, ox, oy, oz):
        lz, cin, cout, one_ext = pg._kernel_ctx((mr, nr, cir, cor, oner))
        modx, nprx, km = lz
        M = lambda a, b: lazy_mul_tile(modx, nprx, a, b)

        if kind == "adds":
            E = lazy_add_tile
        elif kind == "subs":
            E = lambda a, b: lazy_sub_tile(km, a, b)
        elif kind == "fold":
            E = lambda a, b: _carry_fold(a + b)
        else:  # raw
            E = lambda a, b: (a + b) & LIMB_MASK

        def body(_, p):
            x, y, z = p
            a = M(x, y)
            b = M(y, z)
            c = M(z, x)
            # interleave extras on loop-varying values
            for j in range(nextra):
                src = (a, b, c)[j % 3]
                c = E(src, c)
            d = M(a, b)
            e = M(b, c)
            f = M(d, e)
            g = M(e, a)
            h = M(f, g)
            return f, g, h

        p = tuple(pg.to_ext(lz, cin, c) for c in (px[:], py[:], pz[:]))
        out = lax.fori_loop(0, DEPTH, body, p, unroll=False)
        ox[:], oy[:], oz[:] = (pg.from_ext(lz, cout, c) for c in out)

    bspec = pl.BlockSpec((24, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(LL)] * 5 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((24, B), U32) for _ in range(3)))

    def step(x, y, z):
        return fn(*pg._cst()[:5], x, y, z)

    sec, _, fl = device_loop(step, (pts.x.T, pts.y.T, pts.z.T), k=4,
                             chain=False)
    per_iter = sec / DEPTH
    lap(f"{kind}{nextra:<3d}: {per_iter*1e6:8.2f} us/iter "
        f"({(per_iter)/8*1e6:6.2f} us/mul-eq over 8 muls) floored={fl}")


variant("adds", 0)
variant("adds", 4)
variant("adds", 12)
variant("subs", 12)
variant("fold", 12)
variant("raw", 12)
lap("done")
