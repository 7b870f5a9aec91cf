"""Test the latency-bound hypothesis: point-formula chains run 2-3.4x
the raw mul rate (exp_calib). If that's op latency on serial dependency
chains, WIDER tiles amortize it: same chain length, more lanes per op.

  serial8     8 fully-dependent muls (x = x*x), block 256 — latency floor
  projdbl@W   proj_double chain at block W in {256, 512, 1024}
  glv@W       full GLV butterfly wrapper at DEFAULT_BLOCK = W
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
    _const_spec, mont_mul_tile, lazy_mul_tile)
from kzg_tpu.curve import g1, glv
from kzg_tpu.curve import pallas_g1 as pg
from kzg_tpu.curve.weierstrass import JacobianPoint, CurveOps
from kzg_tpu.utils.benchloop import device_loop, sync

U32 = jnp.uint32
L = 24
LL = pg.LL
B = 2048
DEPTH = 64

rng = np.random.default_rng(3)
ops = CurveOps(fp, 1)
pts = ops.scalar_mul(
    g1.generator((B,)),
    jnp.asarray(fr.SPEC.encode([int(x) for x in rng.integers(1, 2**60, B)])))
pts = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in pts))
sync(pts)
lap("ready")

mod_np = np.zeros((24, 128), np.uint32)
mod_np[:24] = fp.SPEC.mod_limbs.astype(np.uint32)[:, None]
npr_np = np.zeros((24, 128), np.uint32)
npr_np[:24] = fp.SPEC.nprime_limbs.astype(np.uint32)[:, None]


def serial8(block):
    def kernel(mod_ref, npr_ref, px, ox):
        mod = mod_ref[:, :1]
        npr = npr_ref[:, :1]

        def body(_, x):
            for _ in range(8):
                x = mont_mul_tile(mod, npr, x, x)
            return x

        ox[:] = lax.fori_loop(0, DEPTH, body, px[:], unroll=False)

    bspec = pl.BlockSpec((24, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(24)] * 2 + [bspec],
        out_specs=bspec, out_shape=jax.ShapeDtypeStruct((24, B), U32))
    modj = jnp.asarray(mod_np)
    nprj = jnp.asarray(npr_np)

    def step(x):
        return fn(modj, nprj, x)

    sec, _, fl = device_loop(step, (pts.x.T,), k=4, chain=True)
    lap(f"serial8 @block={block:4d}: {sec/DEPTH/8*1e6:8.2f} us/mul "
        f"floored={fl}")


def projdbl(block):
    def kernel(mr, nr, cir, cor, oner, px, py, pz, ox, oy, oz):
        lz, cin, cout, one_ext = pg._kernel_ctx((mr, nr, cir, cor, oner))

        def body(_, p):
            return pg.proj_double(lz, p)

        p = tuple(pg.to_ext(lz, cin, c) for c in (px[:], py[:], pz[:]))
        out = lax.fori_loop(0, DEPTH, body, p, unroll=False)
        ox[:], oy[:], oz[:] = (pg.from_ext(lz, cout, c) for c in out)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(LL)] * 5 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), U32) for _ in range(3)))

    def step(x, y, z):
        return fn(*pg._cst()[:5], x, y, z)

    sec, _, fl = device_loop(step, (pts.x.T, pts.y.T, pts.z.T), k=4,
                             chain=False)
    lap(f"projdbl @block={block:4d}: {sec/DEPTH/8*1e6:8.2f} us/mul-eq "
        f"floored={fl}")


serial8(256)
for blk in (256, 512, 1024):
    projdbl(blk)

sc = [int.from_bytes(rng.bytes(32), "little") % fr.SPEC.modulus
      for _ in range(B)]
d1j, d2j = (jnp.asarray(d) for d in glv.twiddle_digits(sc))

for blk in (512, 1024):
    pg.DEFAULT_BLOCK = blk
    pg._scalar_mul_glv_fn.cache_clear()

    def glv_step(px, py, pz):
        p = JacobianPoint(px, py, pz)
        lo, hi = pg.butterfly_glv_pallas(p, p, d1j, d2j)
        return lo.x, lo.y, lo.z

    sec, _, fl = device_loop(glv_step, (pts.x, pts.y, pts.z), k=4,
                             chain=False)
    lap(f"glv @block={blk:4d}: {sec*1e3:8.2f} ms/op "
        f"({sec/1976*1e6:6.2f} us/mul-eq) floored={fl}")
pg.DEFAULT_BLOCK = 256
lap("done")
