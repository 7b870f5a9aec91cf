"""Settle the chain=True (9 us/mul) vs chain=False (31 us/mul)
discrepancy: one kernel, DEPTH=512 in-kernel chain, timed as SINGLE
dispatches (call >> RTT so transport noise is irrelevant), plus both
device_loop modes on the same kernel for comparison.
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
from kzg_tpu.field.pallas_kernels import _const_spec, lazy_mul_tile
from kzg_tpu.curve import g1
from kzg_tpu.curve import pallas_g1 as pg
from kzg_tpu.curve.weierstrass import JacobianPoint, CurveOps
from kzg_tpu.utils.benchloop import device_loop, sync

U32 = jnp.uint32
LL = pg.LL
B = 2048
block = 256

rng = np.random.default_rng(3)
ops = CurveOps(fp, 1)
pts = ops.scalar_mul(
    g1.generator((B,)),
    jnp.asarray(fr.SPEC.encode([int(x) for x in rng.integers(1, 2**60, B)])))
pts = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in pts))
sync(pts)
lap("ready")


def build(depth):
    def kernel(mr, nr, cir, cor, oner, px, py, pz, ox, oy, oz):
        lz, cin, cout, one_ext = pg._kernel_ctx((mr, nr, cir, cor, oner))
        modx, nprx, _ = lz
        M = lambda a, b: lazy_mul_tile(modx, nprx, a, b)

        def body(_, p):
            x, y, z = p
            a = M(x, y)
            b = M(y, z)
            c = M(z, x)
            d = M(a, b)
            e = M(b, c)
            f = M(d, e)
            g = M(e, a)
            h = M(f, g)
            return f, g, h

        p = tuple(pg.to_ext(lz, cin, c) for c in (px[:], py[:], pz[:]))
        out = lax.fori_loop(0, depth, body, p, unroll=False)
        ox[:], oy[:], oz[:] = (pg.from_ext(lz, cout, c) for c in out)

    bspec = pl.BlockSpec((24, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(LL)] * 5 + [bspec] * 3,
        out_specs=(bspec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((24, B), U32) for _ in range(3)))


csts = pg._cst()[:5]

# --- direct single-dispatch timing at two depths; the difference
# cancels fixed per-dispatch cost entirely ---
times = {}
for depth in (64, 512):
    fn = jax.jit(lambda x, y, z, fn0=build(depth): fn0(*csts, x, y, z))
    out = fn(pts.x.T, pts.y.T, pts.z.T)
    sync(out)  # compile+warm
    best = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        out = fn(pts.x.T, pts.y.T, pts.z.T)
        sync(out)
        best = min(best, time.perf_counter() - t1)
    times[depth] = best
    lap(f"single dispatch depth={depth}: {best*1e3:8.2f} ms")

per_mul = (times[512] - times[64]) / (512 - 64) / 8
lap(f"TRUE rate from depth difference: {per_mul*1e6:6.2f} us/mul")

# --- device_loop on the depth-64 kernel, both modes ---
fn64 = build(64)


def step3(x, y, z):
    return fn64(*csts, x, y, z)


sec, _, fl = device_loop(step3, (pts.x.T, pts.y.T, pts.z.T), k=4,
                         chain=False)
lap(f"device_loop chain=False: {sec/64/8*1e6:6.2f} us/mul floored={fl}")


def step1(x):
    return fn64(*csts, x, x, x)[0]


sec, _, fl = device_loop(step1, (pts.x.T,), k=4, chain=True)
lap(f"device_loop chain=True : {sec/64/8*1e6:6.2f} us/mul floored={fl}")
lap("done")
