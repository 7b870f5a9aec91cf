"""Sharded FK20 multi (coset) proof generation: the whole
DAUsingFK20Multi pipeline (fk20_multi.go:113-133) as ONE shard_map
program over the mesh's element axis.

Sharding layout: the 2k proof/point axis is partitioned in contiguous
blocks across D devices; the l (coset-offset) axis stays local to every
shard (it is a pure reduction axis). Per shard:

    1. all l strided Toeplitz coefficient vectors are built from the
       replicated n-length polynomial and the shard slices its block
       (the poly is tiny next to the G1 work; replication is free)
    2. batched sharded Fr FFT over the 2k axis (l transforms at once —
       fr_fft_graph with a leading batch axis)
    3. pointwise batched scalar-mul against the sharded xExtFFT tables
       and the l-axis point reduction — both collective-free
    4. sharded inverse G1 FFT, zero the top half (global-index mask),
       sharded forward G1 FFT  (the dominant cost, now multichip)
    5. sharded reverse-bit-order shuffle (one all_to_all)

Bit-identical to FK20MultiSettings.da_using_fk20_multi on one device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curve import g1
from ..curve.msm import tree_reduce
from ..curve.weierstrass import JacobianPoint
from ..field import fr
from ..fk20.multi import FK20MultiSettings, toeplitz_coeffs_step_strided
from ..ntt.bitrev import bit_reversal_indices
from .fft_sharded import (
    check_sharded_shape,
    fr_fft_graph,
    stage_twiddle_tables,
)
from .fft_g1_sharded import brp_shuffle_graph, g1_fft_graph


@functools.lru_cache(maxsize=None)
def _fk20_sharded_fn(mesh: Mesh, axis: str, n: int, l: int, max_width: int):
    D = mesh.shape[axis]
    k = n // l
    two_k = 2 * k
    local = two_k // D
    rev_d = jnp.asarray(bit_reversal_indices(D))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(
            P(None, None),                       # poly (n, 16) replicated
            P(None, axis, None), P(None, axis, None), P(None, axis, None),
            P(None, None), P(None, None),        # fwd roots, rev roots
            P(None, None), P(None, None), P(None, None),  # stage tables
        ),
        out_specs=(P(axis, None),) * 3,
        check_rep=False,
    )
    def run(poly, xfx, xfy, xfz, roots, rev_roots,
            fr_tables, g1_inv_tables, g1_fwd_tables):
        s = lax.axis_index(axis)
        # 1. Toeplitz coefficient vectors (l, 2k, 16) from the replicated
        # poly, then this shard's block of the 2k axis
        tcs = jnp.stack(
            [toeplitz_coeffs_step_strided(poly, i, l) for i in range(l)],
            axis=0,
        )
        tcs_local = lax.dynamic_slice_in_dim(
            tcs, s * local, local, axis=1)   # (l, local, 16)
        # 2. batched sharded Fr FFT over the element axis
        c_fft = fr_fft_graph(
            tcs_local, fr_tables, roots, axis=axis, D=D, n=two_k,
            max_width=max_width, inverse=False, rev_d=rev_d)
        # 3. pointwise scalar-mul + l-axis reduction (collective-free)
        h_per = g1.mul(JacobianPoint(xfx, xfy, xfz), c_fft)  # (l, local)
        from ..curve.msm import _g1_ops

        ops = _g1_ops()
        h_sum = tree_reduce(ops, h_per)                      # (local,)
        # 4. sharded inverse G1 FFT; zero top half; forward G1 FFT
        h = g1_fft_graph(
            h_sum, g1_inv_tables, rev_roots, axis=axis, D=D, n=two_k,
            max_width=max_width, inverse=True, rev_d=rev_d)
        gidx = s * local + jnp.arange(local)
        top = gidx >= k
        h = ops.select(top, ops.infinity_like(h), h)
        proofs = g1_fft_graph(
            h, g1_fwd_tables, roots, axis=axis, D=D, n=two_k,
            max_width=max_width, inverse=False, rev_d=rev_d)
        # 5. sharded reverse-bit-order
        out = JacobianPoint(
            *(brp_shuffle_graph(c, axis=axis, D=D, n=two_k)
              for c in proofs))
        return out.x, out.y, out.z

    return jax.jit(run)


def da_using_fk20_multi_sharded(fks: FK20MultiSettings, poly, mesh: Mesh,
                                axis: str = "elem") -> JacobianPoint:
    """Sharded DAUsingFK20Multi: 2k coset proofs for the extended
    polynomial, reverse-bit-ordered, sharded over `axis` in contiguous
    blocks. poly: uint32[n, 16] (replicated). Requires 2k = D * local
    with local >= D."""
    n, l = fks.n, fks.chunk_len
    if poly.shape[0] != n:
        raise ValueError(f"expected polynomial of length {n}")
    two_k = 2 * fks.k
    D = mesh.shape[axis]
    fs = fks.ks.fs
    check_sharded_shape(two_k, D, fs.max_width)
    if D == 1:
        return fks.da_using_fk20_multi(poly)
    local = two_k // D
    roots = fs.expanded_roots_of_unity
    rev_roots = fs.reverse_roots_of_unity
    fr_tables = stage_twiddle_tables(fs, roots, two_k, local)
    g1_inv_tables = stage_twiddle_tables(fs, rev_roots, two_k, local)
    g1_fwd_tables = stage_twiddle_tables(fs, roots, two_k, local)
    sharding = NamedSharding(mesh, P(None, axis, None))
    xf = JacobianPoint(
        *(jax.device_put(c, sharding) for c in fks.x_ext_fft_files))
    run = _fk20_sharded_fn(mesh, axis, n, l, fs.max_width)
    # the DA path: the top half of the extended poly is structurally
    # zero (fk20_multi.go:122-128), and the strided Toeplitz vectors of
    # the reduced poly already encode that — pass the reduced poly
    out = run(poly, xf.x, xf.y, xf.z, roots, rev_roots,
              fr_tables, g1_inv_tables, g1_fwd_tables)
    return JacobianPoint(*out)
