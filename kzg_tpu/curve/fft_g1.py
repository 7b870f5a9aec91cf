"""Radix-2 (I)FFT over G1 points (reference: fft_g1.go:11-94).

Identical butterfly structure to the Fr FFT, with point add/sub and
scalar-mul-by-twiddle instead of field ops. The scalar multiplications
dominate; two engines implement the stage:

  vector — the generic composed path (weierstrass ops over the XLA
           field engine): works everywhere, used off-TPU
  pallas — one fused kernel per stage (curve/pallas_g1.py): the whole
           GLV two-ladder twiddle multiply plus the butterfly add/sub
           runs VMEM-resident. Twiddles are STATIC domain constants, so
           their GLV decomposition into signed 4-bit digit tables is
           done once on the host (curve/glv.py) — the ladder is 33
           windows instead of 64 (~45% fewer point doublings than the
           dynamic-scalar path the reference is stuck with,
           fft_g1.go:45-55).

Selected by the runtime field-backend registry (field/backend.py), like
every other hot op. The GLV path requires inputs in the r-torsion
subgroup — true for every point the library produces or (post subgroup
check) deserializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..ntt.domain import FFTSettings
from ..ntt.bitrev import brp_permute
from . import g1
from .weierstrass import JacobianPoint


def _take_points(p: JacobianPoint, idx, axis=0) -> JacobianPoint:
    return JacobianPoint(*(jnp.take(c, idx, axis=axis) for c in p))


@functools.lru_cache(maxsize=None)
def _stage_plan(n: int, max_width: int):
    """Host-precomputed uniform per-stage schedules so the whole stage
    loop is ONE lax.scan whose body traces a single G1 butterfly pass —
    the previous unrolled form compiled log2(n) full scalar-mul bodies,
    which blew XLA:CPU compiles into tens of minutes for the sharded
    programs (round-5).

    Returns (idx_a, idx_b, tw_idx, inv_perm) int32 arrays of shapes
    (logn, n/2) x3 and (logn, n): stage s pairs lanes idx_a/idx_b with
    the root-table row tw_idx, and inv_perm scatters [lo; hi] back."""
    logn = n.bit_length() - 1
    idx_a = np.empty((logn, n // 2), dtype=np.int32)
    idx_b = np.empty((logn, n // 2), dtype=np.int32)
    tw_idx = np.empty((logn, n // 2), dtype=np.int32)
    inv_perm = np.empty((logn, n), dtype=np.int32)
    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        stride = max_width // m
        k = 0
        for g in range(n // m):
            for j in range(half):
                idx_a[s - 1, k] = g * m + j
                idx_b[s - 1, k] = g * m + j + half
                tw_idx[s - 1, k] = j * stride
                inv_perm[s - 1, g * m + j] = k
                inv_perm[s - 1, g * m + j + half] = k + n // 2
                k += 1
    return (idx_a, idx_b, tw_idx, inv_perm)


@functools.partial(jax.jit, static_argnames=("max_width",))
def _fft_g1_core(px, py, pz, roots, inv_n, max_width: int):
    from jax import lax

    n = px.shape[0]
    pts = JacobianPoint(px, py, pz)
    if n > 1:
        pts = JacobianPoint(*(brp_permute(c, axis=0) for c in pts))
        idx_a, idx_b, tw_idx, inv_perm = (
            jnp.asarray(t) for t in _stage_plan(n, max_width))

        def stage(carry, sched):
            ia, ib, ti, ip = sched
            a = _take_points(carry, ia)
            b = _take_points(carry, ib)
            tw = jnp.take(roots, ti, axis=0)
            t = g1.mul(b, tw)
            lo = g1.add(a, t)
            hi = g1.sub(a, t)
            merged = JacobianPoint(*(
                jnp.take(jnp.concatenate([l, h], axis=0), ip, axis=0)
                for l, h in zip(lo, hi)))
            return merged, None

        pts, _ = lax.scan(stage, pts, (idx_a, idx_b, tw_idx, inv_perm))
    if inv_n is not None:
        pts = g1.mul(pts, inv_n)
    return pts


@functools.lru_cache(maxsize=None)
def _stage_digits(max_scale: int, n: int, inverse: bool, inv_scale):
    """Host-precomputed GLV digit tables for every stage of a width-n
    (I)FFT on the 2^max_scale domain, plus the post-scale digits.

    inv_scale: the CALLER's inverse-transform scale as a host int (None
    for the forward direction) — a sharded local IFFT of length n/D
    passes the global 1/n, so it is never derived from n here.

    Returns (per_stage, inv_digits): per_stage[s-1] = (d1, d2) int32
    arrays of shape (n/2, 33) covering the flattened (n/m groups x half)
    butterfly lanes of stage s; inv_digits = (d1, d2) of shape (1, 33)
    for the scale, or None.
    """
    from . import glv

    fs_roots = FFTSettings(max_scale).roots_of_unity_int()
    max_width = 1 << max_scale
    roots = (tuple(reversed(fs_roots)) if inverse else fs_roots)
    logn = n.bit_length() - 1
    per_stage = []
    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        stride = max_width // m
        tws = [roots[j * stride] for j in range(half)]
        d1, d2 = glv.twiddle_digits(tws)
        groups = n // m
        per_stage.append((np.tile(d1, (groups, 1)), np.tile(d2, (groups, 1))))
    inv_digits = None
    if inv_scale is not None:
        inv_digits = glv.twiddle_digits([inv_scale % fr.SPEC.modulus])
    return tuple(per_stage), inv_digits


@functools.partial(
    jax.jit, static_argnames=("max_scale", "n", "inverse", "inv_scale"))
def _fft_g1_pallas(px, py, pz, max_scale: int, n: int, inverse: bool,
                   inv_scale=None):
    from .pallas_g1 import butterfly_glv_pallas

    per_stage, inv_digits = _stage_digits(max_scale, n, inverse, inv_scale)
    pts = JacobianPoint(px, py, pz)
    pts = JacobianPoint(*(brp_permute(c, axis=0) for c in pts))
    logn = n.bit_length() - 1
    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        resh = JacobianPoint(
            *(c.reshape((n // m, m) + c.shape[1:]) for c in pts)
        )
        a = JacobianPoint(
            *(c[:, :half].reshape((n // 2,) + c.shape[2:]) for c in resh))
        b = JacobianPoint(
            *(c[:, half:].reshape((n // 2,) + c.shape[2:]) for c in resh))
        d1, d2 = per_stage[s - 1]
        lo, hi = butterfly_glv_pallas(a, b, jnp.asarray(d1), jnp.asarray(d2))
        pts = JacobianPoint(
            *(
                jnp.concatenate(
                    [l.reshape((n // m, half) + l.shape[1:]),
                     h.reshape((n // m, half) + h.shape[1:])],
                    axis=1,
                ).reshape((n,) + l.shape[1:])
                for l, h in zip(lo, hi)
            )
        )
    if inv_digits is not None:
        # 1/n scale: run the same fused ladder with A = infinity so
        # lo = O + (1/n)*P (the one-extra-butterfly trick; d2 half is
        # the GLV complement of 1/n)
        d1, d2 = inv_digits
        inf = g1.infinity((n,))
        lo, _ = butterfly_glv_pallas(
            inf, pts,
            jnp.asarray(np.tile(d1, (n, 1))), jnp.asarray(np.tile(d2, (n, 1))))
        pts = lo
    return pts


def fft_g1(fs: FFTSettings, points: JacobianPoint, inverse: bool = False,
           in_subgroup: bool = True):
    """(I)FFT of a (n,) G1 point batch. n must be a power of two
    <= fs.max_width (the reference errors likewise, fft_g1.go:62-68).

    PRECONDITION: with in_subgroup=True (the default) the points must
    lie in the r-torsion subgroup — the fused GLV engine relies on
    phi(P) == lambda*P, which only holds there. Every point this
    library produces (CRS, commitments, proofs) and every point
    deserialized with the default subgroup check qualifies. For raw
    curve points of unknown order (e.g. decompressed with
    subgroup_check=False), pass in_subgroup=False to force the generic
    vector engine, which is correct for any point (like the reference's
    fft_g1.go, which never assumes the subgroup)."""
    from ..field.backend import field_backend

    n = points.x.shape[0]
    if n > fs.max_width:
        raise ValueError("got more values than roots of unity")
    if n & (n - 1) != 0:
        raise ValueError("got a non-power-of-two number of values")
    inv_scale = pow(n, -1, fr.SPEC.modulus) if inverse else None
    if field_backend() == "pallas" and n > 1 and in_subgroup:
        return _fft_g1_pallas(
            points.x, points.y, points.z,
            max_scale=fs.max_scale, n=n, inverse=inverse,
            inv_scale=inv_scale)
    roots = fs.reverse_roots_of_unity if inverse else fs.expanded_roots_of_unity
    inv_n = jnp.asarray(fr.from_int(inv_scale)) if inverse else None
    return _fft_g1_core(
        points.x, points.y, points.z, roots, inv_n, max_width=fs.max_width
    )


def reverse_bit_order_g1(points: JacobianPoint) -> JacobianPoint:
    """reference: reverseBitOrderG1 (fft_g1.go:97-107)."""
    return JacobianPoint(*(brp_permute(c, axis=0) for c in points))
