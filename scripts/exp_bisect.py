"""Bisect the 8us-vs-32us lazy_mul discrepancy (exp_ab_mul fast,
exp_lazyops slow): morph the fast kernel toward the slow context one
ingredient at a time.

Variants (all LL=25, 7-mul loop body, DEPTH=64, B=2048, block=256):
  base     exp_ab_mul clone: 2 const refs, contiguous np operands
  transp   operands come from pts.x.T (transposed jnp arrays)
  ctx      5 const refs through pg._kernel_ctx (incl. _lazy_ctx km chain)
  conv     + to_ext at entry / from_ext at exit
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
a24 = np.tile(av24, (1, B // 64)).astype(np.uint32)  # (24, B) contiguous
a25 = np.zeros((LL, B), np.uint32)
a25[:24] = a24

ops = CurveOps(fp, 1)
pts = ops.scalar_mul(
    g1.generator((B,)),
    jnp.asarray(fr.SPEC.encode([int(x) for x in rng.integers(1, 2**60, B)])))
pts = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in pts))
sync(pts)
lap("ready")


def seven(M, x, y, z):
    a = M(x, y)
    b = M(y, z)
    c = M(z, x)
    d = M(a, b)
    e = M(b, c)
    f = M(d, e)
    g = M(e, a)
    return f, g, c


def variant(kind):
    nconst = 2 if kind in ("base", "transp") else 5
    lr_in = LL if kind in ("base", "transp") else L

    def kernel(*refs):
        crefs = refs[:nconst]
        px, py, pz, ox, oy, oz = refs[nconst:nconst + 6]
        if kind in ("base", "transp"):
            mod = crefs[0][:, :1]
            npr = crefs[1][:, :1]
            M = lambda a, b: lazy_mul_tile(mod, npr, a, b)
            p = (px[:], py[:], pz[:])
        else:
            lz, cin, cout, one_ext = pg._kernel_ctx(crefs)
            modx, nprx, _ = lz
            M = lambda a, b: lazy_mul_tile(modx, nprx, a, b)
            if kind == "conv":
                p = tuple(pg.to_ext(lz, cin, c)
                          for c in (px[:], py[:], pz[:]))
            else:  # ctx: pad only
                p = tuple(jnp.pad(c, ((0, LL - L), (0, 0)))
                          for c in (px[:], py[:], pz[:]))

        def body(_, p):
            return seven(M, *p)

        out = lax.fori_loop(0, DEPTH, body, p, unroll=False)
        if kind == "conv":
            lz2, cin, cout, one_ext = pg._kernel_ctx(crefs)
            ox[:], oy[:], oz[:] = (pg.from_ext(lz2, cout, c) for c in out)
        elif kind in ("ctx",):
            ox[:], oy[:], oz[:] = (c[:L] for c in out)
        else:
            ox[:], oy[:], oz[:] = out

    bspec_in = pl.BlockSpec((lr_in, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_rows = LL if kind in ("base", "transp") else L
    bspec_out = pl.BlockSpec((out_rows, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(B // block,),
        in_specs=[_const_spec(LL)] * nconst + [bspec_in] * 3,
        out_specs=(bspec_out,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((out_rows, B), U32) for _ in range(3)))

    if kind in ("base", "transp"):
        mod_np = np.zeros((LL, 128), np.uint32)
        mod_np[:24] = fp.SPEC.mod_limbs.astype(np.uint32)[:, None]
        npr_np = np.zeros((LL, 128), np.uint32)
        npr_np[:24] = fp.SPEC.nprime_limbs.astype(np.uint32)[:, None]
        consts = (jnp.asarray(mod_np), jnp.asarray(npr_np))
        if kind == "base":
            args = (jnp.asarray(a25),) * 3
        else:
            pad = jnp.zeros((1, B), U32)
            args = tuple(jnp.concatenate([c.T, pad], axis=0)
                         for c in (pts.x, pts.y, pts.z))
    else:
        consts = pg._cst()[:5]
        args = (pts.x.T, pts.y.T, pts.z.T)

    def step(x, y, z):
        return fn(*consts, x, y, z)

    sec, _, fl = device_loop(step, args, k=4, chain=False)
    lap(f"{kind:7s}: {sec/DEPTH/7*1e6:8.2f} us/mul floored={fl}")


for kind in ("base", "transp", "ctx", "conv"):
    variant(kind)
lap("done")
