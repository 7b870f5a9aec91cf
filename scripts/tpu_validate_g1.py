"""On-chip validation + timing of the fused Pallas G1 engine.

Run on the TPU: python scripts/tpu_validate_g1.py
Checks every kernel bit-exact against the composed vector path, then
times scalar-mul / GLV butterfly / fft_g1 at production batch sizes.
"""
import time

t0 = time.time()


def lap(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from kzg_tpu.field import fr, fp
from kzg_tpu.field.backend import field_backend
from kzg_tpu.curve import g1
from kzg_tpu.curve.weierstrass import JacobianPoint, CurveOps
from kzg_tpu.curve import pallas_g1 as pg
from kzg_tpu.curve import glv
from kzg_tpu.utils.benchloop import device_loop, sync

print("backend:", jax.default_backend(), field_backend(), flush=True)
ops = CurveOps(fp, 1)
rng = np.random.default_rng(7)


def rand_fullwidth(n):
    return [
        int.from_bytes(rng.bytes(32), "little") % fr.SPEC.modulus
        for _ in range(n)
    ]


N = 8
ks = [int(x) for x in rng.integers(1, 2**60, N)]
pts = ops.scalar_mul(g1.generator((N,)), jnp.asarray(fr.SPEC.encode(ks)))
pts = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in pts))
lap("base points ready")
q = JacobianPoint(pts.x[::-1], pts.y[::-1], pts.z[::-1])

ok_d = bool(np.asarray(jax.device_get(
    g1.eq(ops.double(pts), pg.double_pallas(pts)))).all())
ok_a = bool(np.asarray(jax.device_get(
    g1.eq(ops.add(pts, q), pg.add_pallas(pts, q)))).all())
lap(f"double eq: {ok_d}  add eq: {ok_a}")
assert ok_d and ok_a

sc_ints = rand_fullwidth(N)
sc = jnp.asarray(fr.SPEC.encode(sc_ints))
m_ref = ops.scalar_mul(pts, sc)
m_pal = pg.scalar_mul_pallas(pts, fr.scalar_windows_signed(sc))
ok_m = bool(np.asarray(jax.device_get(g1.eq(m_ref, m_pal))).all())
lap(f"scalar_mul (64w) eq: {ok_m}")
assert ok_m

tws = rand_fullwidth(N)
d1, d2 = glv.twiddle_digits(tws)
t_ref = ops.scalar_mul(q, jnp.asarray(fr.SPEC.encode(tws)))
lo_ref, hi_ref = ops.add(pts, t_ref), ops.sub(pts, t_ref)
lo, hi = pg.butterfly_glv_pallas(pts, q, jnp.asarray(d1), jnp.asarray(d2))
ok_lo = bool(np.asarray(jax.device_get(g1.eq(lo_ref, lo))).all())
ok_hi = bool(np.asarray(jax.device_get(g1.eq(hi_ref, hi))).all())
lap(f"glv butterfly lo eq: {ok_lo}  hi eq: {ok_hi}")
assert ok_lo and ok_hi

# ---- fft_g1 differential: pallas path vs vector core, scale 4 ----
from kzg_tpu.ntt import FFTSettings
from kzg_tpu.curve.fft_g1 import fft_g1, _fft_g1_core

fs = FFTSettings(4)
n = 16
ptsn = ops.scalar_mul(
    g1.generator((n,)), jnp.asarray(fr.SPEC.encode(rand_fullwidth(n))))
ptsn = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in ptsn))
out_pal = fft_g1(fs, ptsn)  # backend=pallas on TPU
out_vec = _fft_g1_core(
    ptsn.x, ptsn.y, ptsn.z, fs.expanded_roots_of_unity, None,
    max_width=fs.max_width)
ok_f = bool(np.asarray(jax.device_get(g1.eq(out_pal, out_vec))).all())
lap(f"fft_g1 scale4 pallas==vector: {ok_f}")
assert ok_f
inv_pal = fft_g1(fs, ptsn, inverse=True)
inv_vec = _fft_g1_core(
    ptsn.x, ptsn.y, ptsn.z, fs.reverse_roots_of_unity, fs.inv_length(n),
    max_width=fs.max_width)
ok_i = bool(np.asarray(jax.device_get(g1.eq(inv_pal, inv_vec))).all())
lap(f"ifft_g1 scale4 pallas==vector: {ok_i}")
assert ok_i

# ---- perf ----
B = 2048
ptsb = ops.scalar_mul(
    g1.generator((B,)),
    jnp.asarray(fr.SPEC.encode([int(x) for x in rng.integers(1, 2**60, B)])))
ptsb = JacobianPoint(*(jnp.asarray(jax.device_get(c)) for c in ptsb))
sync(ptsb)
lap("batch points ready")

scb = jnp.asarray(fr.SPEC.encode(rand_fullwidth(B)))
digb = fr.scalar_windows_signed(scb)


def pal_mul(px, py, pz):
    o = pg.scalar_mul_pallas(JacobianPoint(px, py, pz), digb)
    return o.x, o.y, o.z


sec, _, fl = device_loop(pal_mul, (ptsb.x, ptsb.y, ptsb.z), k=4)
lap(f"pallas scalar_mul batch {B}: {sec*1e3:.2f} ms/op floored={fl}")


def vec_mul(px, py, pz):
    o = ops.scalar_mul(JacobianPoint(px, py, pz), scb)
    return o.x, o.y, o.z


sec, _, fl = device_loop(vec_mul, (ptsb.x, ptsb.y, ptsb.z), k=2)
lap(f"vector scalar_mul batch {B}: {sec*1e3:.2f} ms/op floored={fl}")

da, db = glv.twiddle_digits(rand_fullwidth(B))
da = jnp.asarray(da)
db = jnp.asarray(db)


def pal_bfly(px, py, pz):
    p = JacobianPoint(px, py, pz)
    lo, hi = pg.butterfly_glv_pallas(p, p, da, db)
    return lo.x, lo.y, lo.z


sec, _, fl = device_loop(pal_bfly, (ptsb.x, ptsb.y, ptsb.z), k=4)
lap(f"pallas glv butterfly batch {B}: {sec*1e3:.2f} ms/op floored={fl}")

# ---- fft_g1 timing (vs the reference's fastest backend per scale) ----
import os

scales = ((4, 1.9), (8, 57.0), (12, 1379.3))
if os.environ.get("G1_SCALE15"):
    scales = scales + ((15, 13513.9),)
for scale, best_ref in scales:
    fsb = FFTSettings(scale)
    nb = 1 << scale
    if nb <= B:
        ptf = JacobianPoint(ptsb.x[:nb], ptsb.y[:nb], ptsb.z[:nb])
    else:
        reps = nb // B
        ptf = JacobianPoint(
            *(jnp.tile(c, (reps, 1)) for c in ptsb))

    def fft_fwd(p, fsb=fsb):
        return fft_g1(fsb, p)

    sec, _, fl = device_loop(fft_fwd, (ptf,), k=2, chain=True)
    lap(f"fft_g1 scale {scale} (pallas): {sec*1e3:.2f} ms/op "
        f"({best_ref/(sec*1e3):.1f}x vs reference best) floored={fl}")
lap("done")
