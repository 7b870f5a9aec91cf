"""Distributed G1 FFT over a device mesh axis, plus the sharded
reverse-bit-order shuffle.

Same three-phase plan as the Fr version (parallel/fft_sharded.py):
cross-shard DIF butterfly stages via `ppermute` block exchanges, a local
per-shard (I)FFT, and one `all_to_all` distributed transpose back to
natural contiguous-block sharding — with G1 point butterflies
(add / sub-then-scalar-mul) instead of field ops. This is the multichip
path for proof generation's dominant cost (the reference's FFTG1,
fft_g1.go:33-94, is single-core; G1 work is ~1000x the Fr FFT per
BASELINE.md, so this axis is where pod scaling pays).

`brp_sharded` realizes reverseBitOrder (reverse_bit_order.go:86-101)
across shards as one all_to_all plus two static local permutes — needed
by DAUsingFK20Multi's final output ordering (fk20_multi.go:131).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curve import g1
from ..curve.fft_g1 import _fft_g1_core
from ..curve.weierstrass import JacobianPoint
from ..field import fr
from ..ntt.bitrev import bit_reversal_indices
from ..ntt.domain import FFTSettings
from .fft_sharded import (
    check_sharded_shape,
    cross_stage_spans,
    stage_twiddle_tables,
)


def g1_fft_graph(pts: JacobianPoint, stage_tables, roots, *, axis: str,
                 D: int, n: int, max_width: int, inverse: bool, rev_d):
    """Traceable per-shard G1 FFT body (call inside shard_map).

    pts: JacobianPoint with coords uint32[local, 24] — this shard's
    contiguous block. Returns natural order, same sharding. The inverse
    post-scale is the GLOBAL 1/n (applied inside the local IFFT)."""
    local = n // D
    s = lax.axis_index(axis)
    x = pts
    for h, table in zip(cross_stage_spans(n, local), stage_tables):
        g = h // local
        m = 2 * h // local
        s_mod = s % m
        role_b = s_mod >= g
        perm = [(i, i ^ g) for i in range(D)]
        px = JacobianPoint(*(lax.ppermute(c, axis, perm) for c in x))
        a_out = g1.add(x, px)
        base = jnp.maximum(s_mod - g, 0) * local
        tw = lax.dynamic_slice_in_dim(table, base, local, axis=0)
        b_out = g1.mul(g1.sub(px, x), tw)
        x = JacobianPoint(
            *(jnp.where(role_b, cb, ca) for cb, ca in zip(b_out, a_out))
        )
    # local per-shard (I)FFT; the global 1/n scale is applied here
    from ..field.backend import field_backend

    if field_backend() == "pallas" and local > 1:
        from ..curve.fft_g1 import _fft_g1_pallas

        x = JacobianPoint(*_fft_g1_pallas(
            x.x, x.y, x.z, max_scale=max_width.bit_length() - 1,
            n=local, inverse=inverse,
            inv_scale=pow(n, -1, fr.SPEC.modulus) if inverse else None))
    else:
        inv_n = (jnp.asarray(fr.from_int(pow(n, -1, fr.SPEC.modulus)))
                 if inverse else None)
        x = _fft_g1_core(x.x, x.y, x.z, roots, inv_n, max_width=max_width)
    # distributed transpose: x[t] = X[t*D + rev_d(s)] -> natural blocks
    c = local // D

    def transpose(coord):
        xr = coord.reshape(D, c, coord.shape[-1])
        recv = lax.all_to_all(xr, axis, split_axis=0, concat_axis=0)
        recv = jnp.take(recv, rev_d, axis=0)
        return recv.transpose(1, 0, 2).reshape(local, coord.shape[-1])

    return JacobianPoint(*(transpose(cc) for cc in x))


@functools.lru_cache(maxsize=None)
def _brp_local_indices(n: int, D: int) -> np.ndarray:
    """Static local gather for brp_sharded: after the group-permuted
    all_to_all, dest shard b's received buffer flat[s*c + j] holds
    in[s*local + j*D + rev_D(b)]; the bit-reversed output needs
    out[t] = in[rev_n(t_global)] = flat[rev_D(t % D)*c + (rev_l(t) % c)]
    (derivation: rev_n(b*local + t) = D*rev_l(t) + rev_D(b), whose
    shard is rev_D(t % D) and whose local offset is D*(rev_l(t) % c)
    + rev_D(b))."""
    local = n // D
    c = local // D
    rev_d = bit_reversal_indices(D)
    rev_l = bit_reversal_indices(local)
    t = np.arange(local)
    return (rev_d[t % D] * c + (rev_l[t] % c)).astype(np.int32)


def brp_shuffle_graph(x, *, axis: str, D: int, n: int):
    """Traceable per-shard reverse-bit-order permutation of a globally
    (n, ...)-shaped array sharded in contiguous blocks over `axis`.
    x: (local, ...) block; requires local >= D. One all_to_all."""
    if D == 1:
        from ..ntt.bitrev import brp_permute

        return brp_permute(x, axis=0)
    local = n // D
    c = local // D
    rev_d = jnp.asarray(bit_reversal_indices(D))
    # group u = j*D + g by g = u mod D, then position group rev_D(b) at
    # slice b so the all_to_all delivers it to dest shard b
    xr = x.reshape((c, D) + x.shape[1:])
    xr = jnp.moveaxis(xr, 1, 0)                    # (D, c, ...)
    xr = jnp.take(xr, rev_d, axis=0)               # slice b = group rev(b)
    recv = lax.all_to_all(xr, axis, split_axis=0, concat_axis=0)
    flat = recv.reshape((D * c,) + x.shape[1:])
    idx = jnp.asarray(_brp_local_indices(n, D))
    return jnp.take(flat, idx, axis=0)


@functools.lru_cache(maxsize=None)
def _fft_g1_sharded_fn(mesh: Mesh, axis: str, n: int, max_width: int,
                       inverse: bool):
    D = mesh.shape[axis]
    rev_d = jnp.asarray(bit_reversal_indices(D))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(None, None), P(None, None)),
        out_specs=(P(axis, None),) * 3,
        check_rep=False,
    )
    def run(px, py, pz, stage_tables, roots):
        out = g1_fft_graph(
            JacobianPoint(px, py, pz), stage_tables, roots, axis=axis,
            D=D, n=n, max_width=max_width, inverse=inverse, rev_d=rev_d)
        return out.x, out.y, out.z

    return jax.jit(run)


def fft_g1_sharded(fs: FFTSettings, points: JacobianPoint, mesh: Mesh,
                   axis: str = "elem", inverse: bool = False):
    """(I)FFT of a (n,) G1 point batch sharded over `axis` in contiguous
    blocks. Requires n = D * local with local >= D (both powers of two).
    Bit-identical to the single-device fft_g1."""
    n = points.x.shape[0]
    D = mesh.shape[axis]
    check_sharded_shape(n, D, fs.max_width)
    roots = (fs.reverse_roots_of_unity if inverse
             else fs.expanded_roots_of_unity)
    if D == 1:
        from ..curve.fft_g1 import fft_g1

        return fft_g1(fs, points, inverse=inverse)
    tables = stage_twiddle_tables(fs, roots, n, n // D)
    run = _fft_g1_sharded_fn(mesh, axis, n, fs.max_width, inverse)
    return JacobianPoint(*run(points.x, points.y, points.z, tables, roots))


@functools.lru_cache(maxsize=None)
def _brp_g1_fn(mesh: Mesh, axis: str, n: int):
    D = mesh.shape[axis]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None),) * 3,
        out_specs=(P(axis, None),) * 3,
        check_rep=False,
    )
    def run(px, py, pz):
        return tuple(
            brp_shuffle_graph(c, axis=axis, D=D, n=n) for c in (px, py, pz))

    return jax.jit(run)


def reverse_bit_order_g1_sharded(points: JacobianPoint, mesh: Mesh,
                                 axis: str = "elem") -> JacobianPoint:
    """Sharded reverseBitOrderG1 (fft_g1.go:97-107): one all_to_all."""
    n = points.x.shape[0]
    return JacobianPoint(
        *_brp_g1_fn(mesh, axis, n)(points.x, points.y, points.z))
