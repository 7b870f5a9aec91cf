"""Same-session A/B of Fr FFT stage engines at scale-15 shapes
(16384 butterfly lanes):

  old    butterfly_pallas: canonical-domain kernel + per-call transposes
  new    butterfly_lazy: lane-layout 17-row lazy kernel, no transposes
  canon  the exit canon_scale kernel (runs once per FFT)
  e2e    _fft_core pallas path (the new pipeline), scales 12/15
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

from kzg_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from kzg_tpu.field import fr
from kzg_tpu.field.pallas_kernels import (
    butterfly_pallas, butterfly_lazy, canon_scale, encode_ext, LANES)
from kzg_tpu.utils.benchloop import device_loop, sync

rng = np.random.default_rng(0)
N = 16384
ints = [int(x) % fr.SPEC.modulus for x in rng.integers(0, 2**63, N)]
a_can = jnp.asarray(fr.SPEC.encode(ints))              # (N, 16)
tw_can = jnp.asarray(fr.SPEC.encode(ints[:1] * N))     # (N, 16)
a_lane = jnp.asarray(np.pad(fr.SPEC.encode(ints).T, ((0, 1), (0, 0))))
tw_lane = jnp.asarray(encode_ext(fr.SPEC, ints).T.copy())  # (17, N)
sync((a_can, a_lane))
lap("ready")


def old_stage(a, b, tw):
    hi, lo = butterfly_pallas(fr.SPEC, a, b, tw)
    return hi


sec, _, fl = device_loop(old_stage, (a_can, a_can, tw_can), k=16,
                         chain=True)
lap(f"old butterfly (canonical, transposes): {sec*1e6:8.2f} us "
    f"floored={fl}")


def new_stage(a, b, tw):
    hi, lo = butterfly_lazy(fr.SPEC, a, b, tw, first=False)
    return hi


sec, _, fl = device_loop(new_stage, (a_lane, a_lane, tw_lane), k=16,
                         chain=True)
lap(f"new butterfly (lazy lane-layout):      {sec*1e6:8.2f} us "
    f"floored={fl}")

c_tile = jnp.asarray(np.broadcast_to(
    encode_ext(fr.SPEC, 1)[:, None], (17, LANES)).copy())


def canon(x):
    return canon_scale(fr.SPEC, x, c_tile)


sec, _, fl = device_loop(canon, (a_lane,), k=16, chain=False)
lap(f"canon_scale (exit kernel, {2*N} els):   {sec*1e6:8.2f} us "
    f"floored={fl}")

from kzg_tpu.ntt import FFTSettings
from kzg_tpu.ntt.fft_fr import _fft_core

for scale in (12, 15):
    fs = FFTSettings(scale)
    n = 1 << scale
    vals = jnp.asarray(fr.SPEC.encode(
        [int(x) % fr.SPEC.modulus for x in rng.integers(0, 2**63, n)]))

    def fwd(v, fs=fs):
        return _fft_core(v, fs.expanded_roots_of_unity, None,
                         max_width=fs.max_width)

    sec, _, fl = device_loop(fwd, (vals,), k=16, chain=True)
    lap(f"e2e fft scale {scale}:                    {sec*1e6:8.2f} us "
        f"floored={fl}")
lap("done")
