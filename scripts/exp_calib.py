"""Single-session calibration: every layer of the G1 ladder stack in ONE
process so ratios are transport-independent (absolute us/mul varies ~2x
between sessions; ratios within a session are stable).

  mont24   canonical mont_mul chain      -> the engine's floor
  lazy25   lazy_mul chain at LL rows     -> lazy-domain overhead
  projdbl  lazy proj_double chain        -> formula overhead (8 muls)
  wstep    4 dbl + table-select apply    -> ladder-body overhead (44)
  glv      pg.butterfly_glv_pallas       -> end product (~1976 muls)
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
block = 256
DEPTH = 64

rng = np.random.default_rng(3)
av24 = np.stack([
    np.asarray(fp.SPEC.encode(int.from_bytes(rng.bytes(40), "little")))
    for _ in range(64)
]).T
a24 = np.tile(av24, (1, B // 64)).astype(np.uint32)

ops = CurveOps(fp, 1)
pts = ops.scalar_mul(
    g1.generator((B,)),
    jnp.asarray(fr.SPEC.encode([int(x) for x in rng.integers(1, 2**60, B)])))
pts = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in pts))
sync(pts)
lap("ready")

results = {}


def mulchain(name, LR, mulfn):
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
    per = sec / DEPTH / 7
    results[name] = per
    lap(f"{name:8s}: {per*1e6:8.2f} us/mul floored={fl}")


mulchain("mont24", 24, mont_mul_tile)
mulchain("lazy25", LL, lambda m, n, a, b: lazy_mul_tile(m, n, a, b))


def projdbl():
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
    per = sec / DEPTH / 8
    results["projdbl"] = per
    lap(f"projdbl : {per*1e6:8.2f} us/mul-eq (8 muls/op) floored={fl}")


projdbl()

# the end product
sc = [int.from_bytes(rng.bytes(32), "little") % fr.SPEC.modulus
      for _ in range(B)]
d1, d2 = glv.twiddle_digits(sc)
d1 = jnp.asarray(d1)
d2 = jnp.asarray(d2)


def glv_step(px, py, pz):
    p = JacobianPoint(px, py, pz)
    lo, hi = pg.butterfly_glv_pallas(p, p, d1, d2)
    return lo.x, lo.y, lo.z


sec, _, fl = device_loop(glv_step, (pts.x, pts.y, pts.z), k=4, chain=False)
per = sec / 1976
results["glv"] = per
lap(f"glv     : {sec*1e3:8.2f} ms/op  ({per*1e6:6.2f} us/mul-eq, ~1976 muls)"
    f" floored={fl}")

m = results["mont24"]
lap("ratios vs mont24: " + "  ".join(
    f"{k}={results[k]/m:.2f}x" for k in results))
lap("done")
